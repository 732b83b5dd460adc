package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.TextFunctions._

/** Domain-weighted corpus mixture — the training-data pipeline step
  * that re-samples a multi-source corpus to a TARGET per-domain token
  * mixture (The Pile assigns each of its 22 sources a sampling weight,
  * Gao et al. arXiv:2101.00027 Table 1; LLaMA's pre-training table
  * does the same per source, Touvron et al. arXiv:2302.13971 Table 1;
  * DoReMi learns the weights but applies them the same way, Xie et al.
  * NeurIPS'23).
  *
  * Semantics: the corpus is mixed down to `targetPct`% of its total
  * token count, split across sources proportionally to integer weights
  * `w(source)`. Within each source documents are taken in a
  * deterministic shuffle order (md5 of doc_id — an unbiased sample
  * reproducible across engines and runs) until the source's token
  * allocation is filled; the document that crosses the boundary is
  * kept (standard take-until-budget, so overshoot < one document).
  * Sources whose allocation exceeds their natural token mass keep all
  * their documents — the oversampling factor a trainer would apply as
  * repeat epochs is exactly what [[mixtureEpochs]] reports (The Pile's
  * "epochs" column).
  *
  * Scale shape: the core is a PER-SOURCE prefix sum of token counts in
  * shuffle order. The naive window spelling (`PARTITION BY source`)
  * puts an entire domain — possibly most of a 100 TB corpus — into one
  * window partition. This is the grouped generalization of
  * [[Packing.sequencePacking]]'s two-phase distributed prefix sum,
  * with one crucial difference: the bucket id is a DETERMINISTIC
  * function of the row (the first 3 hex chars of the md5 shuffle key,
  * 4096 buckets — monotone in key order within a source), NOT
  * `spark_partition_id()` over a range exchange. A range exchange
  * samples its boundaries per physical subtree; when Catalyst prunes
  * the two consumers differently the exchange is NOT reused, each copy
  * samples independently, and past the sample-covers-everything corpus
  * size the two branches assign DIFFERENT partition ids to the same
  * row — measured at the 500k-doc sf10: ~24% of selected rows wrong. A pure
  * column expression cannot disagree with itself, whatever the
  * optimizer duplicates. Per-(source, bucket) running sums run locally
  * after one hash exchange; the ≤ sources×4096 bucket totals prefix-sum
  * in a single tiny window and broadcast back. Every corpus-sized frame
  * streams. Allocations are exact integer arithmetic (`DIV`), so the
  * Spark plan and the SQL oracle agree bit-for-bit at any corpus size.
  */
object Mixture {

  /** Mix down to this percentage of total corpus tokens by default. */
  val DefaultTargetPct = 50L

  /** Target for the epochs binding: 150% of corpus tokens — a token
    * budget ABOVE the corpus's mass, the regime repeat-epochs exist for
    * (The Pile trains >1 epoch over its smaller sources for exactly
    * this reason). At 50% a near-uniform corpus never oversamples and
    * every epoch count is trivially 1. */
  val EpochsTargetPct = 150L

  /** Deterministic integer weight per source for the driver binding:
    * 1 + (numeric suffix of "srcN" mod 5) ∈ [1,5]. Real pipelines pass
    * hand-chosen weights via the `weights` column parameter; the
    * binding needs weights both engines derive identically from data. */
  def suffixWeight(source: Column): Column =
    lit(1L) + substring(source, 4, 18).cast("long") % 5L

  /** Per-document mixture selection: (source, doc_id, n_tokens,
    * tokens_before) for every document the target mixture keeps.
    * `tokens_before` is the token mass of earlier-keyed documents of
    * the same source; a document is kept iff tokens_before < alloc. */
  def domainMixture(docs: DataFrame, weight: Column => Column = suffixWeight,
      targetPct: Long = DefaultTargetPct): DataFrame =
    domainMixtureCounts(
      docs.select(col("doc_id"), col("source"),
        tokenCount(col("text")).as("n_tokens")),
      weight, targetPct)
      .orderBy(col("source"), col("doc_id"))

  /** [[domainMixture]] over a pre-tokenized slim frame
    * (doc_id, source, n_tokens) — the composition entry point
    * ([[TrainingCorpus]] feeds gated survivors through here without
    * re-scanning text). */
  def domainMixtureCounts(counts: DataFrame,
      weight: Column => Column = suffixWeight,
      targetPct: Long = DefaultTargetPct): DataFrame = {
    require(targetPct > 0, s"targetPct must be positive, got $targetPct")
    val (slim, ptots) = bucketed(counts)
    // one tiny row per source; the global totals fold in by cross-joining
    // the one-row frame (broadcast: never a corpus shuffle)
    val perSrc = ptots.groupBy(col("source"))
      .agg(sum(col("ptot")).as("src_tokens"))
      .withColumn("wt", weight(col("source")))
    val totals = perSrc.agg(sum(col("src_tokens")).as("tot"),
      sum(col("wt")).as("wsum"))
    val alloc = perSrc.crossJoin(broadcast(totals))
      .select(col("source"), col("src_tokens"), col("wt"),
        expr(s"tot * ${targetPct}L DIV 100L * wt DIV wsum").as("alloc"))
    selectByAlloc(slim, ptots, alloc)
  }

  /** Temperature-scaled mixture (t27): per-source weights
    * ∝ √(natural token share) — the T=2 "temperature" rebalancing the
    * multilingual and LLaMA-style recipes use to UPWEIGHT small
    * sources relative to proportional sampling (Conneau & Lample,
    * NeurIPS'19 §3.1 sample languages with pᵢ^α, α=0.5; the Pile's
    * hand weights play the same role). The weight is fixed-point:
    * `wt_e4 = round(√(src_tokens/tot)·10⁴)` — sqrt and the one round
    * are correctly-rounded IEEE ops on identical int64-derived
    * doubles, so both engines produce the SAME integer weight and
    * every downstream allocation stays exact integer arithmetic
    * (t17's DIV discipline). Same two-phase grouped prefix-sum
    * selection as [[domainMixtureCounts]]. */
  def temperatureMixtureCounts(counts: DataFrame,
      targetPct: Long = DefaultTargetPct): DataFrame = {
    require(targetPct > 0, s"targetPct must be positive, got $targetPct")
    val (slim, ptots) = bucketed(counts)
    val perSrc = ptots.groupBy(col("source"))
      .agg(sum(col("ptot")).as("src_tokens"))
    val tot = perSrc.agg(sum(col("src_tokens")).as("tot"))
    val withWt = perSrc.crossJoin(broadcast(tot))
      .withColumn("wt_e4",
        round(sqrt(col("src_tokens").cast("double") / col("tot").cast("double"))
          * 10000, 0).cast("long"))
    val wsum = withWt.agg(sum(col("wt_e4")).as("wsum"))
    val alloc = withWt.crossJoin(broadcast(wsum))
      .select(col("source"), col("src_tokens"), col("wt_e4"),
        expr(s"tot * ${targetPct}L DIV 100L * wt_e4 DIV wsum").as("alloc"))
    selectByAlloc(slim, ptots, alloc)
  }

  def temperatureMixture(docs: DataFrame,
      targetPct: Long = DefaultTargetPct): DataFrame =
    temperatureMixtureCounts(
      docs.select(col("doc_id"), col("source"),
        tokenCount(col("text")).as("n_tokens")), targetPct)
      .orderBy(col("source"), col("doc_id"))

  /** The deterministic-bucket slim frame + per-(source, bucket) totals
    * shared by every mixture variant. pid: bucket from the shuffle
    * key's hex prefix — monotone in k within a source, identical in
    * every plan subtree (see scaladoc for why spark_partition_id over
    * a range exchange is NOT safe here). The ptots aggregate is one
    * partial-agg exchange, ≤ sources×4096 rows out. */
  private def bucketed(counts: DataFrame): (DataFrame, DataFrame) = {
    val slim = counts.select(col("doc_id"), col("source"), col("n_tokens"),
      md5(col("doc_id").cast("string")).as("k"))
      .withColumn("pid", conv(substring(col("k"), 1, 3), 16, 10).cast("int"))
    val ptots = slim.groupBy(col("source"), col("pid"))
      .agg(sum(col("n_tokens")).as("ptot"))
    (slim, ptots)
  }

  /** Take-until-budget selection against a per-source allocation: the
    * grouped two-phase prefix sum (bucket offsets broadcast back over
    * the streaming corpus) shared by the proportional and temperature
    * mixtures. */
  private def selectByAlloc(slim: DataFrame, ptots: DataFrame,
      alloc: DataFrame): DataFrame = {
    val poffs = ptots.withColumn("poff",
      coalesce(sum(col("ptot")).over(Window.partitionBy(col("source"))
        .orderBy(col("pid"))
        .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val local = slim.withColumn("lend",
      sum(col("n_tokens")).over(Window.partitionBy(col("source"), col("pid"))
        .orderBy(col("k"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    local
      .join(broadcast(poffs.select(col("pid"), col("source"), col("poff"))),
        Seq("pid", "source"))
      .withColumn("tokens_before", col("poff") + col("lend") - col("n_tokens"))
      .join(broadcast(alloc.select(col("source"), col("alloc"))), Seq("source"))
      .where(col("tokens_before") < col("alloc"))
      // unordered: the public [[domainMixture]] sorts; composition
      // callers ([[TrainingCorpus]]) feed the next stage's exchange
      // directly and must not pay a dead range-exchange+sort here
      .select(col("source"), col("doc_id"), col("n_tokens"),
        col("tokens_before"))
  }

  /** Per-source mixture summary: natural token mass, weight, token
    * allocation, and the repeat-epoch factor (ceil(alloc/natural)) a
    * trainer applies when the target mixture oversamples a source —
    * The Pile's per-source "epochs" column (arXiv:2101.00027 Table 1). */
  def mixtureEpochs(docs: DataFrame, weight: Column => Column = suffixWeight,
      targetPct: Long = DefaultTargetPct): DataFrame = {
    require(targetPct > 0, s"targetPct must be positive, got $targetPct")
    val perSrc = docs
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(tokenCount(col("text"))).as("src_tokens"))
      .withColumn("wt", weight(col("source")))
    val totals = perSrc.agg(sum(col("src_tokens")).as("tot"),
      sum(col("wt")).as("wsum"))
    perSrc.crossJoin(broadcast(totals))
      .select(col("source"), col("n_docs"), col("src_tokens"), col("wt"),
        expr(s"tot * ${targetPct}L DIV 100L * wt DIV wsum").as("alloc"))
      .withColumn("epochs",
        expr("(alloc + src_tokens - 1L) DIV src_tokens"))
      .orderBy(col("source"))
  }

  def domainMixture(s: SparkSession, dir: String): DataFrame =
    domainMixture(Tables.load(s, dir, "documents"))

  def temperatureMixture(s: SparkSession, dir: String): DataFrame =
    temperatureMixture(Tables.load(s, dir, "documents"))

  def mixtureEpochs(s: SparkSession, dir: String): DataFrame =
    mixtureEpochs(Tables.load(s, dir, "documents"), targetPct = EpochsTargetPct)
}
