package graft.index

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Persisted embedding-LSH signature index — the vector-modality
  * analogue of [[SignatureIndex]]: the corpus-side state an
  * incremental embedding near-dup pipeline keeps between ingest
  * batches. At 100 TB a daily embedding delta cannot re-sign the
  * corpus; the index persists exactly the per-vector state
  * [[graft.operators.Dedup.embeddingNearDup]]'s production family
  * recomputes per query:
  *
  *  - `sigs/`     (vec_id, ss, tbl, sig) — one row per signature
  *    table per vector at the indexed depth, carrying the 63-bit sign
  *    rider so the candidate join screens pairs in-stage without a
  *    corpus-sized attach (the same rider geometry as the batch path).
  *    Range-partitioned and sorted on sig.
  *  - `vecs/`     (vec_id, v, norm)      — normalized vectors for the
  *    exact cosine verify (only candidate rows are ever joined).
  *  - `sketches/` (vec_id, pv, pt)       — the Cauchy–Schwarz screen
  *    sketches (136 B vs the 512 B full vector).
  *  - `counts/`   (tbl, sig, n, min_vec) — per-bucket width + min
  *    vec, the skew ledger for hot-bucket fallback.
  *  - `meta/`     (bits, n) one row      — the indexed signature
  *    depth and corpus size, the state the depth-drift policy reads.
  *
  * Depth-drift policy: signature depth must track corpus size
  * ([[graft.operators.Dedup.adaptiveEmbBits]] — fixed bits go
  * quadratic), but an index built at depth b cannot answer probes at
  * depth b' ≠ b. [[ensure]] records bits at build time and REBUILDS
  * the index when the projected corpus+delta total pushes
  * `adaptiveEmbBits` past the recorded depth — i.e. at most once per
  * corpus doubling past the 16-bit floor, amortized O(log growth)
  * rebuilds. In between, appends and queries run delta-sized at the
  * recorded depth (one bit of extra depth headroom would halve
  * rebuild frequency at the cost of boundary recall — the policy
  * chooses exactness of the family contract over headroom). */
object EmbSignatureIndex {

  private def fs(s: SparkSession, path: String) =
    new Path(path).getFileSystem(s.sparkContext.hadoopConfiguration)

  private def marker(path: String) = new Path(path, "_EMBIDX_READY")

  def ready(s: SparkSession, path: String): Boolean =
    fs(s, path).exists(marker(path))

  def sigs(s: SparkSession, path: String): DataFrame =
    s.read.parquet(s"$path/sigs")

  def vecs(s: SparkSession, path: String): DataFrame =
    s.read.parquet(s"$path/vecs")

  def sketches(s: SparkSession, path: String): DataFrame =
    s.read.parquet(s"$path/sketches")

  def counts(s: SparkSession, path: String): DataFrame =
    s.read.parquet(s"$path/counts")

  /** (bits, n) recorded at build/append time. */
  def meta(s: SparkSession, path: String): (Int, Long) = {
    val r = s.read.parquet(s"$path/meta").collect()(0)
    (r.getInt(0), r.getLong(1))
  }

  /** The per-vector signature frame at a given depth — shared by
    * [[build]]/[[append]] and the delta side of the incremental
    * query: (vec_id, ss, tbl, sig) over a NORMALIZED (vec_id, v,
    * norm) frame. Pure map, zero shuffle. */
  private[graft] def signatureRows(e: DataFrame, bits: Int): DataFrame = {
    val s = e.sparkSession
    e.select(col("vec_id"),
      element_at(graft.functions.LshFunctions.lshSigs(
        s, col("v"), Dedup.ScreenSeed, Dedup.ScreenBits, 1), 1).as("ss"),
      posexplode(graft.functions.LshFunctions.lshSigs(
        s, col("v"), 1L /* EmbSeed */, bits, Dedup.adaptiveEmbTables(bits)))
        .as(Seq("tbl", "sig")))
  }

  /** Full build from an embedding frame (canonical
    * `vec_id`/`embedding` columns) at the depth for `totalN` vectors
    * (defaults to the corpus's own count). */
  def build(embeddings: DataFrame, path: String, totalN: Long = -1L): Unit = {
    val s = embeddings.sparkSession
    // torn-write contract: a drift re-train rebuilds over a READY
    // index — it must read not-ready while frames are mid-overwrite
    fs(s, path).delete(marker(path), false)
    val e = Dedup.embNormed(embeddings)
    val n = e.count()
    val bits = Dedup.adaptiveEmbBits(if (totalN > 0) totalN else n)
    val sg = signatureRows(e, bits)
    sg.repartitionByRange(col("sig")).sortWithinPartitions(col("sig"))
      .write.mode("overwrite").parquet(s"$path/sigs")
    e.select(col("vec_id"), col("v"), col("norm"))
      .repartition(col("vec_id"))
      .write.mode("overwrite").parquet(s"$path/vecs")
    Dedup.embSketch(e).repartition(col("vec_id"))
      .write.mode("overwrite").parquet(s"$path/sketches")
    sg.groupBy(col("tbl"), col("sig"))
      .agg(count(lit(1)).as("n"), min(col("vec_id")).as("min_vec"))
      .repartitionByRange(col("sig")).sortWithinPartitions(col("sig"))
      .write.mode("overwrite").parquet(s"$path/counts")
    import s.implicits._
    Seq((bits, n)).toDF("bits", "n")
      .write.mode("overwrite").parquet(s"$path/meta")
    val out = fs(s, path).create(marker(path), true)
    out.close()
  }

  /** Build if absent OR if the recorded depth has drifted below what
    * `projectedN` total vectors need. Returns the bits in effect. */
  def ensure(embeddings: DataFrame, path: String, projectedN: Long): Int = {
    val s = embeddings.sparkSession
    val needed = Dedup.adaptiveEmbBits(projectedN)
    val stale = !ready(s, path) || meta(s, path)._1 < needed
    if (stale) build(embeddings, path, projectedN)
    meta(s, path)._1
  }

  /** Ingest a batch: delta-sized appends + counts/meta re-merge.
    * Same crash contract as [[SignatureIndex.append]]: the READY
    * marker drops first and returns only after the ledger lands —
    * a torn append reads as not-ready, never as wrong. Depth drift
    * on growth is [[ensure]]'s job (call it before appending); this
    * method appends at the index's recorded depth. */
  def append(deltaEmb: DataFrame, path: String): Unit = {
    val s = deltaEmb.sparkSession
    val (bits, _) = meta(s, path)
    val e = Dedup.embNormed(deltaEmb)
    val sg = signatureRows(e, bits).localCheckpoint(true)
    appendFrames(s, sg, e.select(col("vec_id"), col("v"), col("norm")),
      Dedup.embSketch(e), path)
  }

  /** [[append]] with the delta's signature/vector/sketch frames
    * already computed — the streaming compactor folds its pending log
    * in without re-signing ([[graft.streaming.StreamingEmbNearDup]]).
    * The frames must be at the index's recorded depth (the pending
    * log is — its batches were scored at that depth); depth drift on
    * growth remains [[ensure]]'s job between streams. Same crash
    * contract as [[append]]. */
  private[graft] def appendFrames(s: SparkSession, sg: DataFrame,
      vv: DataFrame, sk: DataFrame, path: String): Unit = {
    val (bits, n0) = meta(s, path)
    fs(s, path).delete(marker(path), false)
    val nD = vv.count()
    sg.sortWithinPartitions(col("sig"))
      .write.mode("append").parquet(s"$path/sigs")
    vv.write.mode("append").parquet(s"$path/vecs")
    sk.write.mode("append").parquet(s"$path/sketches")
    val dc = sg.groupBy(col("tbl"), col("sig"))
      .agg(count(lit(1)).as("dn"), min(col("vec_id")).as("dmin"))
    val merged = counts(s, path)
      .join(dc, Seq("tbl", "sig"), "full_outer")
      .select(col("tbl"), col("sig"),
        (coalesce(col("n"), lit(0L)) + coalesce(col("dn"), lit(0L))).as("n"),
        least(coalesce(col("min_vec"), col("dmin")),
          coalesce(col("dmin"), col("min_vec"))).as("min_vec"))
      .localCheckpoint(true)
    merged.repartitionByRange(col("sig")).sortWithinPartitions(col("sig"))
      .write.mode("overwrite").parquet(s"$path/counts")
    import s.implicits._
    Seq((bits, n0 + nD)).toDF("bits", "n")
      .write.mode("overwrite").parquet(s"$path/meta")
    val out = fs(s, path).create(marker(path), true)
    out.close()
  }
}
