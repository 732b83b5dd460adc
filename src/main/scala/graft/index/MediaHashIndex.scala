package graft.index

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Persisted perceptual-hash index — the media-modality analogue of
  * [[SignatureIndex]] (text) and [[EmbSignatureIndex]] (vectors): the
  * corpus-side state an incremental media near-dup pipeline keeps
  * between ingest batches, so the corpus is DECODED AND HASHED EXACTLY
  * ONCE. At 100 TB of images/audio the decode pass dominates every
  * downstream cost by orders of magnitude (the pair machinery only
  * ever sees 8-byte signatures); before this index, every
  * m03/m04/m05 invocation re-decoded the full corpus per run — the
  * last operator family without a decode-once path (VERDICT r11 #1).
  *
  * One index per modality path (the caller keys the path by modality;
  * dHash64 for images, eHash64 for audio — the index itself is
  * codec-agnostic and stores only (id, 64-bit sig)):
  *
  *  - `sigs/`    (media_id, sig)     — the decoded perceptual hashes,
  *    id-partitioned: the batch-shape readers ([[pairsFromIndex]],
  *    the m05 closure spec) and any future retraction anti-join scan
  *    this instead of media bytes.
  *  - `buckets/` (media_id, sig, bk) — the 56 combination-LSH bucket
  *    keys per signature ([[graft.operators.Dedup.hammingBlockKeys]],
  *    the SAME geometry as the batch path — index buckets and probe
  *    buckets can never disagree), written bk-range-partitioned and
  *    bk-sorted so a delta's bucket probes prune by parquet footer
  *    min/max instead of scanning the corpus.
  *  - `counts/`  (bk, n, min_id, min_sig) — per-bucket width plus the
  *    min member WITH its signature, the skew ledger: hot-bucket
  *    fallback links a delta row to the bucket min and hamming-verifies
  *    against min_sig directly — no id→sig resolve join, unlike the
  *    text path whose set-valued verify state cannot ride a ledger.
  *
  * Media corpora in this pipeline are append-only (a training-data
  * lake ingests media, it does not mutate it in place), so the index
  * is append-only: [[append]] takes delta-sized writes plus a counts
  * re-merge; deletion routes through [[build]] (rebuild over the
  * surviving corpus — the compaction cadence an operator chooses, as
  * with [[FuzzyPoolIndex.compact]]).
  *
  * Crash consistency (the [[SignatureIndex.append]] contract): the
  * READY marker drops before the first write of build/append and
  * re-creates only after the counts ledger lands — a torn write
  * leaves `ready() == false` and the next builder rebuilds; a
  * concurrent reader mid-append sees not-ready, never wrong.
  * Single-writer per index path, as across the index family. */
object MediaHashIndex {

  private def fs(s: SparkSession, path: String) =
    new Path(path).getFileSystem(s.sparkContext.hadoopConfiguration)

  private def marker(path: String) = new Path(path, "_MEDIAIDX_READY")

  def ready(s: SparkSession, path: String): Boolean =
    fs(s, path).exists(marker(path))

  def sigs(s: SparkSession, path: String): DataFrame =
    s.read.parquet(s"$path/sigs")

  def buckets(s: SparkSession, path: String): DataFrame =
    s.read.parquet(s"$path/buckets")

  def counts(s: SparkSession, path: String): DataFrame =
    s.read.parquet(s"$path/counts")

  /** The per-signature bucket frame — shared by [[build]]/[[append]]
    * and the streaming scorer's pending-log derivation
    * ([[graft.streaming.StreamingMediaDedup]]): pure map, zero
    * shuffle. `sigFrame` carries (media_id, sig). */
  private[graft] def bucketRows(sigFrame: DataFrame): DataFrame =
    sigFrame.select(col("media_id"), col("sig"),
      explode(Dedup.hammingBlockKeys(col("sig"))).as("bk"))

  private[graft] def countRows(b: DataFrame): DataFrame =
    b.groupBy(col("bk"))
      .agg(count(lit(1)).as("n"),
        min(struct(col("media_id"), col("sig"))).as("mn"))
      .select(col("bk"), col("n"),
        col("mn.media_id").as("min_id"), col("mn.sig").as("min_sig"))

  /** Re-aggregate a UNION of counts frames to one ledger row per
    * bucket (sum widths, struct-min the (id, sig) pair — the same
    * merge semantics as [[append]]'s full-outer fold). A consumer that
    * unions index counts with freshly derived delta counts MUST pass
    * through this: the probe's hot-bucket threshold and bucket-min
    * link are per-ROW, so two rows for one bk understate the combined
    * width and can pick the wrong min in skewed buckets. */
  private[graft] def remergeCounts(c: DataFrame): DataFrame =
    c.groupBy(col("bk"))
      .agg(sum(col("n")).as("n"),
        min(struct(col("min_id").as("media_id"), col("min_sig").as("sig")))
          .as("mn"))
      .select(col("bk"), col("n"),
        col("mn.media_id").as("min_id"), col("mn.sig").as("min_sig"))

  /** Full build from a decoded signature frame (canonical
    * `media_id`/`sig` columns — the caller owns decode, so one decode
    * pass can feed several derivations). Honors the torn-rebuild
    * contract: READY drops before the first overwrite. */
  def build(sigFrame: DataFrame, path: String): Unit = {
    val s = sigFrame.sparkSession
    fs(s, path).delete(marker(path), false)
    val sg = sigFrame.select(col("media_id"), col("sig"))
      .localCheckpoint(true) // one decode pass feeds all three writes
    val b = bucketRows(sg)
    b.repartitionByRange(col("bk")).sortWithinPartitions(col("bk"))
      .write.mode("overwrite").parquet(s"$path/buckets")
    sg.repartition(col("media_id"))
      .write.mode("overwrite").parquet(s"$path/sigs")
    countRows(b)
      .repartitionByRange(col("bk")).sortWithinPartitions(col("bk"))
      .write.mode("overwrite").parquet(s"$path/counts")
    fs(s, path).create(marker(path), true).close()
  }

  /** Ingest a batch of newly decoded signatures: delta-sized appends
    * to sigs/buckets, then the counts re-merge (narrow table,
    * materialized eagerly BEFORE the overwrite — Spark cannot
    * overwrite a path its plan still reads). Decode cost is the
    * caller's and strictly delta-proportional. */
  def append(deltaSigs: DataFrame, path: String): Unit = {
    val s = deltaSigs.sparkSession
    fs(s, path).delete(marker(path), false)
    val sg = deltaSigs.select(col("media_id"), col("sig"))
      .localCheckpoint(true)
    val b = bucketRows(sg)
    b.sortWithinPartitions(col("bk"))
      .write.mode("append").parquet(s"$path/buckets")
    sg.write.mode("append").parquet(s"$path/sigs")
    val dc = countRows(bucketRows(sg))
      .withColumnsRenamed(Map("n" -> "dn", "min_id" -> "dmin_id",
        "min_sig" -> "dmin_sig"))
    // a struct of null fields is NOT a null struct, so build each
    // side's (id, sig) as genuinely-null when that side is absent —
    // only then does the coalesce fall through to the present side;
    // struct comparison is lexicographic and media_id leads, so least
    // picks the smaller-id side's (id, sig) atomically
    val mnOld = when(col("min_id").isNotNull,
      struct(col("min_id").as("media_id"), col("min_sig").as("sig")))
    val mnNew = when(col("dmin_id").isNotNull,
      struct(col("dmin_id").as("media_id"), col("dmin_sig").as("sig")))
    val merged = counts(s, path)
      .join(dc, Seq("bk"), "full_outer")
      .select(col("bk"),
        (coalesce(col("n"), lit(0L)) + coalesce(col("dn"), lit(0L))).as("n"),
        least(coalesce(mnOld, mnNew), coalesce(mnNew, mnOld)).as("mn"))
      .select(col("bk"), col("n"),
        col("mn.media_id").as("min_id"), col("mn.sig").as("min_sig"))
      .localCheckpoint(true)
    merged.repartitionByRange(col("bk")).sortWithinPartitions(col("bk"))
      .write.mode("overwrite").parquet(s"$path/counts")
    fs(s, path).create(marker(path), true).close()
  }

  /** BATCH pair formation from the persisted frames — the m03/m04
    * result over the indexed corpus without re-deriving the 56-way
    * bucket explode (and, upstream, without any decode): feeds the
    * maintained m05 cluster build and any full-corpus re-derivation.
    * Same cap/verify semantics as [[Dedup.hamming64Pairs]] — it IS
    * that path, entered at the bucket frame. */
  def pairsFromIndex(s: SparkSession, path: String,
      maxHamming: Int): DataFrame =
    Dedup.hamming64PairsFromBuckets(
      buckets(s, path).withColumnRenamed("media_id", "doc_id"), "sig",
      maxHamming)
      .withColumnsRenamed(Map("doc_a" -> "media_a", "doc_b" -> "media_b"))
}
