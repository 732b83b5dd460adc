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
}
