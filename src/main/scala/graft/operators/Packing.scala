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
  *  1. range-partition the slim (doc_id, n_tokens) frame by doc_id
  *     (contiguous id ranges per partition, partition order = id
  *     order) and take per-partition running sums;
  *  2. aggregate ONE total row per partition (≤ shuffle-partitions
  *     rows — the only single-partition window runs over THIS tiny
  *     frame), prefix-sum those, and broadcast the per-partition
  *     offsets back onto the local sums.
  *
  * Work at 100 TB: one corpus scan for token counts, one slim range
  * exchange (16 B/row), one tiny aggregate, one broadcast join —
  * every corpus-sized frame streams; nothing corpus-sized ever meets
  * a single-partition operator. Sequence ids are exact integer
  * arithmetic (`DIV`), not float division — token offsets at the
  * 100 TB scale (~10^13) exceed a double's 2^53 integer range only
  * far past any real corpus, but DIV keeps the plan exact at any
  * offset a long can hold. */
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
      budget: Long = DefaultBudget): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val slim = docs
      .select(col("doc_id"), tokenCount(col("text")).as("n_tokens"))
      .repartitionByRange(col("doc_id"))
    // pid is captured on the range-partitioned frame: partition p holds
    // ids strictly below partition p+1's, so pid order IS doc_id order
    val withPid = slim.withColumn("pid", spark_partition_id())
    val local = withPid.withColumn("lend",
      sum(col("n_tokens")).over(Window.partitionBy(col("pid"))
        .orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val ptots = local.groupBy(col("pid")).agg(max(col("lend")).as("ptot"))
    // ≤ shuffle-partitions rows: the single-partition window is bounded
    // by configuration, not by data
    val poffs = ptots.withColumn("poff",
      coalesce(sum(col("ptot")).over(Window.orderBy(col("pid"))
        .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    local.join(broadcast(poffs.select(col("pid"), col("poff"))), Seq("pid"))
      .select(col("doc_id"), col("n_tokens"),
        (col("poff") + col("lend") - col("n_tokens")).as("start_off"))
      .withColumn("first_seq", expr(s"start_off DIV ${budget}L"))
      .withColumn("last_seq",
        expr(s"(start_off + n_tokens - 1) DIV ${budget}L"))
      .orderBy(col("doc_id"))
  }

  def sequencePacking(s: SparkSession, dir: String): DataFrame =
    sequencePacking(Tables.load(s, dir, "documents"))
}
