package graft.index

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Persisted MinHash signature index — the corpus-side state an
  * INCREMENTAL near-dup pipeline keeps between ingest batches.
  *
  * The reference recomputes nothing incrementally (its dedup surface is
  * id-keyed, `internal/service/miniodb_service.go` Update/Delete); this
  * is the pipeline-scale addition: at 100 TB, recomputing corpus-wide
  * MinHash signatures per daily batch is the difference between a
  * delta-sized job and a full-corpus one. The index persists exactly
  * what [[graft.operators.Dedup.minhashLsh]] would recompute:
  *
  *  - `bands/`    (doc_id, band, bh)  — LSH bucket keys, written
  *    bh-range-partitioned and bh-sorted so a batch's bucket probes
  *    prune by parquet footer min/max instead of scanning the corpus.
  *  - `shingles/` (doc_id, hs)        — the hashed shingle sets the
  *    exact jaccard verify needs (only candidate rows are ever joined).
  *  - `counts/`   (band, bh, n, min_doc) — per-bucket width + min doc,
  *    the skew ledger: queries read ONLY the buckets the delta touches
  *    (right-outer join keyed by the delta) to decide hot-bucket
  *    fallback without a corpus-wide window.
  *
  * [[append]] is the ingest step: delta bands/shingles land as parquet
  * appends (delta-sized write), and `counts/` is re-merged (narrow
  * table; the same cost class as InvertedIndex's per-date refresh).
  * Writers are single-writer per index path, like the reference's
  * buffer flush and our CdcLog producer assumption — concurrent
  * appends would need a table-format transaction log, which SURVEY §4
  * scopes out. */
object SignatureIndex {

  private def fs(s: SparkSession, path: String) =
    new Path(path).getFileSystem(s.sparkContext.hadoopConfiguration)

  private def marker(path: String) = new Path(path, "_SIGIDX_READY")

  def ready(s: SparkSession, path: String): Boolean =
    fs(s, path).exists(marker(path))

  def bands(s: SparkSession, path: String): DataFrame =
    s.read.parquet(s"$path/bands")

  def shingles(s: SparkSession, path: String): DataFrame =
    s.read.parquet(s"$path/shingles")

  def counts(s: SparkSession, path: String): DataFrame =
    s.read.parquet(s"$path/counts")

  /** Full build from a corpus frame (canonical `doc_id`/`text`
    * columns). One signature pass (zero shuffle) + three writes. */
  def build(docs: DataFrame, path: String): Unit =
    buildFrames(Dedup.hashedShingleSets(docs), path)

  /** [[build]] from an already-materialized hashed-shingle frame — a
    * caller that needs the shingles for other derivations too (the
    * fuzzy pool index's pair graph) shares one corpus pass instead of
    * stacking a second corpus-sized checkpoint next to this one. */
  private[graft] def buildFrames(sh: DataFrame, path: String): Unit = {
    val s = sh.sparkSession
    // a rebuild over an already-ready index must read not-ready while
    // its frames are mid-overwrite (the torn-write contract every
    // append in this family already honors)
    fs(s, path).delete(marker(path), false)
    val b = Dedup.bandedSignatures(sh)
    b.repartitionByRange(col("bh")).sortWithinPartitions(col("bh"))
      .write.mode("overwrite").parquet(s"$path/bands")
    sh.repartition(col("doc_id"))
      .write.mode("overwrite").parquet(s"$path/shingles")
    b.groupBy(col("band"), col("bh"))
      .agg(count(lit(1)).as("n"), min(col("doc_id")).as("min_doc"))
      .repartitionByRange(col("bh")).sortWithinPartitions(col("bh"))
      .write.mode("overwrite").parquet(s"$path/counts")
    val out = fs(s, path).create(marker(path), true)
    out.close()
  }

  /** Ingest a new batch: delta-sized appends to bands/shingles, then a
    * counts re-merge. The merge materializes eagerly BEFORE the
    * overwrite (Spark cannot overwrite a path its plan still reads).
    *
    * Crash consistency: the three writes are not atomic together — a
    * failure after the bands append but before the counts overwrite
    * would leave counts understating bucket widths (breaking hot-bucket
    * detection) in an index that still looks usable. So the READY
    * marker is dropped first and re-created only after the counts
    * overwrite lands: a torn append leaves `ready() == false` and the
    * next builder rebuilds, same contract as the WAL's torn-segment
    * drop. (Single-writer per index path, as documented above; a
    * concurrent reader mid-append sees not-ready, not wrong.) */
  def append(deltaDocs: DataFrame, path: String): Unit = {
    val sh = Dedup.hashedShingleSets(deltaDocs)
    val b = Dedup.bandedSignatures(sh).localCheckpoint(true)
    appendFrames(deltaDocs.sparkSession, b, sh, path)
  }

  /** [[append]] with the delta's bands/shingles already computed —
    * the streaming compactor folds its pending log in without
    * re-shingling ([[graft.streaming.StreamingNearDup.compact]]).
    * `b` must be materialized or cheap to rescan: it is consumed
    * twice (bands append + counts recount). Same crash contract as
    * [[append]]. */
  private[graft] def appendFrames(s: SparkSession, b: DataFrame,
      sh: DataFrame, path: String): Unit = {
    fs(s, path).delete(marker(path), false)
    b.sortWithinPartitions(col("bh"))
      .write.mode("append").parquet(s"$path/bands")
    sh.write.mode("append").parquet(s"$path/shingles")
    val dc = b.groupBy(col("band"), col("bh"))
      .agg(count(lit(1)).as("dn"), min(col("doc_id")).as("dmin"))
    val merged = counts(s, path)
      .join(dc, Seq("band", "bh"), "full_outer")
      .select(col("band"), col("bh"),
        (coalesce(col("n"), lit(0L)) + coalesce(col("dn"), lit(0L))).as("n"),
        least(coalesce(col("min_doc"), col("dmin")),
          coalesce(col("dmin"), col("min_doc"))).as("min_doc"))
      .localCheckpoint(true)
    merged.repartitionByRange(col("bh")).sortWithinPartitions(col("bh"))
      .write.mode("overwrite").parquet(s"$path/counts")
    val out = fs(s, path).create(marker(path), true)
    out.close()
  }
}
