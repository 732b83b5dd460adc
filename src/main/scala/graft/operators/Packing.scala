package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.TextFunctions._

/** Sequence packing — the training-data pipeline step that turns a
  * deduplicated document corpus into fixed-token-budget training
  * sequences, GPT-style (documents concatenated in a deterministic
  * corpus order and cut every `budget` tokens, so a document spans
  * `[first_seq, last_seq]`; Brown et al., "Language Models are
  * Few-Shot Learners", NeurIPS'20, §2.2 pack documents exactly this
  * way, and T5's pack-to-512 is the same construction).
  *
  * The operator's core is a GLOBAL prefix sum of per-doc token counts
  * in doc_id order. The naive Spark spelling — `sum(n) over (ORDER BY
  * doc_id)` with no PARTITION BY — collapses the corpus into ONE
  * window partition (a single task at any scale: the classic
  * global-window scale bug). This implementation is the distributed
  * two-phase prefix sum instead:
  *
  *  1. bucket the slim (doc_id, n_tokens) frame into 4096 contiguous
  *     id ranges by PURE ARITHMETIC over the broadcast (min, max) id
  *     bounds — `(doc_id - lo) DIV width` — and take per-bucket
  *     running sums after one hash exchange;
  *  2. aggregate ONE total row per bucket (≤4096 rows — the only
  *     single-partition window runs over THIS tiny frame), prefix-sum
  *     those, and broadcast the per-bucket offsets back onto the
  *     local sums.
  *
  * The bucket id is deliberately NOT `spark_partition_id()` over a
  * range exchange: a range exchange samples its boundaries per
  * physical subtree, and when the optimizer prunes the local-sums and
  * bucket-totals consumers differently the exchange is duplicated
  * instead of reused — each copy then samples its own boundaries, and
  * past the sample-covers-everything corpus size the two branches
  * assign different partition ids to the same row (the sibling
  * [[Mixture]] operator measured ~24% wrong rows at the 500k-doc sf10 before
  * this construction replaced it; the original t16 shape was safe only
  * because AQE happened to reuse its exchange). An arithmetic bucket
  * cannot disagree with itself, whatever the plan duplicates. Bucket
  * balance tracks doc_id density — exact for the dense row-id
  * convention this corpus uses; a pathologically clustered id space
  * would skew buckets (they spill, correctness unaffected).
  *
  * Work at 100 TB: one slim scan for the id bounds, one corpus scan
  * for token counts, one slim hash exchange (16 B/row), one tiny
  * aggregate, one broadcast join — every corpus-sized frame streams;
  * nothing corpus-sized ever meets a single-partition operator.
  * Sequence ids are exact integer arithmetic (`DIV`), not float
  * division — token offsets at the 100 TB scale (~10^13) exceed a
  * double's 2^53 integer range only far past any real corpus, but DIV
  * keeps the plan exact at any offset a long can hold. */
object Packing {

  /** Tokens per packed training sequence (a GPT-2-era 1024 /
    * GPT-3-era 2048 context; the driver binding pins 2048). */
  val DefaultBudget = 2048L

  /** Per-document packing spans: (doc_id, n_tokens, start_off,
    * first_seq, last_seq) under concat-and-split packing in doc_id
    * order. `start_off` is the document's global token offset;
    * `first_seq`/`last_seq` the ids of the budget-sized sequences its
    * tokens land in (last_seq > first_seq ⇔ the document straddles a
    * cut). Token counts are the t01 whitespace semantics, so the
    * oracle shares t01's `string_split` form. */
  def sequencePacking(docs: DataFrame,
      budget: Long = DefaultBudget): DataFrame =
    packCounts(
      docs.select(col("doc_id"), tokenCount(col("text")).as("n_tokens")),
      budget)

  /** [[sequencePacking]] over a pre-tokenized (doc_id, n_tokens) frame
    * — the composition entry point ([[TrainingCorpus]] packs its
    * mixture-selected survivors without re-scanning text). */
  def packCounts(counts: DataFrame, budget: Long = DefaultBudget): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val carried = counts.columns.toSeq // extra columns ride through
    val bounds = counts.agg(min(col("doc_id")).as("lo"),
      max(col("doc_id")).as("hi"))
    // pid: deterministic contiguous-range bucket (see scaladoc — a pure
    // function of doc_id, so every plan subtree agrees on it)
    val slim = counts.crossJoin(broadcast(bounds))
      .withColumn("pid",
        expr("(doc_id - lo) DIV ((hi - lo) DIV 4096L + 1L)").cast("int"))
      .select(col("pid") +: carried.map(col): _*)
    val local = slim.withColumn("lend",
      sum(col("n_tokens")).over(Window.partitionBy(col("pid"))
        .orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val ptots = slim.groupBy(col("pid")).agg(sum(col("n_tokens")).as("ptot"))
    // ≤4096 rows: the single-partition window is bounded by the bucket
    // constant, not by data
    val poffs = ptots.withColumn("poff",
      coalesce(sum(col("ptot")).over(Window.orderBy(col("pid"))
        .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    local.join(broadcast(poffs.select(col("pid"), col("poff"))), Seq("pid"))
      .withColumn("start_off", col("poff") + col("lend") - col("n_tokens"))
      .withColumn("first_seq", expr(s"start_off DIV ${budget}L"))
      .withColumn("last_seq",
        expr(s"(start_off + n_tokens - 1) DIV ${budget}L"))
      .select((carried ++ Seq("start_off", "first_seq", "last_seq")).map(col): _*)
      .orderBy(col("doc_id"))
  }

  def sequencePacking(s: SparkSession, dir: String): DataFrame =
    sequencePacking(Tables.load(s, dir, "documents"))
}
