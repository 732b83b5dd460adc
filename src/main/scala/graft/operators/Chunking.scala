package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.TextFunctions._

/** Context-window chunking (t19): split every document into fixed
  * token windows with overlap — the standard preprocessing step
  * between a cleaned corpus and sequence packing when documents exceed
  * the model context (overlapping stride keeps boundary-spanning text
  * learnable; cf. the sliding-window evaluation convention of
  * GPT-2-era LMs).
  *
  * Shape at 100 TB: one corpus scan, one `explode(sequence(...))` —
  * output rows ∝ corpus tokens / stride, produced WHERE the document
  * row lives; the only exchange in the plan is the presentation sort.
  * Chunk counts and offsets are pure integer arithmetic (`DIV`), and
  * the chunk fingerprint is md5 over the space-joined token slice, so
  * a SQL oracle reproduces every cell bit-for-bit at any scale.
  */
object Chunking {

  /** Window width in tokens — a GPT-2-era 1024 scaled to this
    * corpus's 10–99-token documents (like [[Packing.DefaultBudget]]),
    * so the multi-window path is actually exercised: most docs split
    * into 2–4 overlapping windows. */
  val Win = 32L

  /** Stride between window starts (overlap = Win − Stride = 8). */
  val Stride = 24L

  /** One row per (doc, window): 0-based `chunk_idx`/`start_tok`, the
    * clamped window token count, and the window's md5 fingerprint. */
  def tokenChunks(docs: DataFrame, win: Long = Win, stride: Long = Stride): DataFrame = {
    require(win > 0 && stride > 0 && stride <= win,
      s"need 0 < stride <= win, got win=$win stride=$stride")
    val nchunks = when(col("n") <= win, lit(1L))
      .otherwise(call_function("div", col("n") - win + stride - 1, lit(stride)) + 1L)
    docs
      .select(col("doc_id"), tokens(col("text")).as("w"))
      .withColumn("n", size(col("w")).cast("long"))
      .withColumn("chunk_idx", explode(sequence(lit(0L), nchunks - 1)))
      .withColumn("start_tok", col("chunk_idx") * stride)
      .select(
        col("doc_id"), col("chunk_idx"), col("start_tok"),
        least(lit(win), col("n") - col("start_tok")).as("n_chunk_tokens"),
        md5(array_join(
          slice(col("w"), (col("start_tok") + 1).cast("int"), lit(win.toInt)),
          " ")).as("chunk_md5"))
      .orderBy(col("doc_id"), col("chunk_idx"))
  }

  def tokenChunks(s: SparkSession, dir: String): DataFrame =
    tokenChunks(Tables.load(s, dir, "documents"))
}
