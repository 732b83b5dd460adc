package graft.index

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.TrainingCorpus

/** Persisted corpus-assembly state — what an INCREMENTAL training-data
  * pipeline keeps between ingest batches so a daily delta never
  * re-scans corpus text (the [[SignatureIndex]]/[[EmbSignatureIndex]]
  * precedent, applied to the composed p01 pipeline):
  *
  *  - `pool/`    (doc_id, source, n_tokens, fp) — the clean survivor
  *    pool: exact-dedup keepers that passed the quality/length gates
  *    and 5-gram decontamination. The fingerprint rides along so a
  *    delta arrival that out-mins a pool doc can RETRACT it with one
  *    slim join (the full recompute's `min over (partition by fp)`
  *    would re-pick the keeper; the incremental path must be able to
  *    un-pick it without touching text).
  *  - `fps/`     (fp, keep_id) — min doc_id per fingerprint over ALL
  *    corpus docs, gated or not: a low-quality corpus doc still
  *    out-mins a later delta duplicate, exactly as the recompute's
  *    window (which runs BEFORE the gates) would.
  *  - `benchsh/` (h) — the benchmark split's distinct hashed 5-gram
  *    shingles (the t09 join's right side), persisted so delta
  *    decontamination re-explodes only the delta.
  *
  * All three frames are slim (≤4 columns, no text); at 100 TB they are
  * a fraction of a percent of the corpus, and every incremental join
  * against them streams the persisted side exactly once (see
  * [[graft.operators.TrainingCorpus.incrementalPool]]).
  *
  * Single-writer per index path, like the reference's buffer flush
  * (`internal/storage/buffer.go`) and the sibling indexes here. */
object CorpusPoolIndex {

  private def fs(s: SparkSession, path: String) =
    new Path(path).getFileSystem(s.sparkContext.hadoopConfiguration)

  private def marker(path: String) = new Path(path, "_POOLIDX_READY")

  def ready(s: SparkSession, path: String): Boolean =
    fs(s, path).exists(marker(path))

  /** Token of the last streaming-compaction fold this index absorbed
    * (null when none) — the rewrite-style coverage check
    * ([[graft.streaming.BatchLog.finishCompaction]]): pool counts can
    * legally SHRINK across a fold (retraction), so recovery verifies
    * fold identity, not row counts. */
  def lastFold(s: SparkSession, path: String): String =
    FoldToken.read(s, path)

  def pool(s: SparkSession, path: String): DataFrame =
    s.read.parquet(s"$path/pool")

  def fps(s: SparkSession, path: String): DataFrame =
    s.read.parquet(s"$path/fps")

  def benchShingles(s: SparkSession, path: String): DataFrame =
    s.read.parquet(s"$path/benchsh")

  /** Full build from the corpus and benchmark frames (canonical
    * `doc_id`/`source`/`text` columns): one scored scan feeds both the
    * fingerprint table and the pool; the benchmark explodes once. */
  def build(corpusDocs: DataFrame, benchmarkDocs: DataFrame,
      path: String): Unit = {
    val s = corpusDocs.sparkSession
    // rebuild over an already-ready index honors the torn-write
    // contract: READY drops before the first overwrite (a crash
    // mid-rebuild must read not-ready, not half-rewritten frames), and
    // a stale fold token is cleared — a rebuilt index contains no fold
    fs(s, path).delete(marker(path), false)
    FoldToken.clear(s, path)
    TrainingCorpus.scoredScan(corpusDocs)
      .groupBy(col("fp")).agg(min(col("doc_id")).as("keep_id"))
      .write.mode("overwrite").parquet(s"$path/fps")
    TrainingCorpus.cleanPool(corpusDocs, benchmarkDocs, keepFp = true)
      .write.mode("overwrite").parquet(s"$path/pool")
    TrainingCorpus.benchShingleSet(benchmarkDocs)
      .write.mode("overwrite").parquet(s"$path/benchsh")
    val out = fs(s, path).create(marker(path), true)
    out.close()
  }

  /** Ingest a delta batch: advance the persisted state so the NEXT
    * batch sees corpus ∪ delta — the [[SignatureIndex.append]]
    * analogue for the assembly pipeline. The pool becomes
    * [[graft.operators.TrainingCorpus.incrementalPoolFp]]'s output
    * (delta-proportional text work; additions and retractions
    * applied); `fps/` merges the delta's per-fingerprint mins.
    *
    * Both rewrites are SLIM-frame-proportional, not text-proportional
    * — at 100 TB the fps table is ~40 bytes per corpus doc, the same
    * cost class as SignatureIndex's counts re-merge. Both frames
    * materialize eagerly BEFORE the overwrite (Spark cannot overwrite
    * a path its plan still reads).
    *
    * Crash consistency: the two writes are not atomic together, so
    * the READY marker drops first and re-creates only after both
    * land — a torn ingest leaves `ready() == false` and the next
    * builder rebuilds (the SignatureIndex.append contract).
    * Single-writer per index path. */
  def ingest(deltaDocs: DataFrame, path: String): Unit = {
    val s = deltaDocs.sparkSession
    val newPool = TrainingCorpus.incrementalPoolFp(deltaDocs, path)
    val mergedFps = fps(s, path)
      .join(TrainingCorpus.deltaFpMins(deltaDocs), Seq("fp"), "full_outer")
      .select(col("fp"),
        // least skips nulls: absent-on-either-side fps keep the
        // present side's min
        least(col("keep_id"), col("dmin")).as("keep_id"))
    writeVersion(s, newPool, mergedFps, path)
  }

  /** Advance the pool + fps frames in place (benchsh untouched). Both
    * inputs may READ the current index, so they materialize eagerly
    * before the overwrite; the READY marker drops first and re-creates
    * only after both rewrites land (torn advance ⇒ not-ready ⇒
    * rebuild — the [[SignatureIndex.append]] contract). Shared by
    * [[ingest]] and the streaming compactor
    * ([[graft.streaming.StreamingCorpusPool.compact]]). */
  private[graft] def writeVersion(s: SparkSession, newPool: DataFrame,
      newFps: DataFrame, path: String, foldToken: String = null): Unit = {
    val p = newPool.localCheckpoint(true)
    val f0 = newFps.localCheckpoint(true)
    fs(s, path).delete(marker(path), false)
    p.write.mode("overwrite").parquet(s"$path/pool")
    f0.write.mode("overwrite").parquet(s"$path/fps")
    FoldToken.write(s, path, foldToken)
    val out = fs(s, path).create(marker(path), true)
    out.close()
  }
}
