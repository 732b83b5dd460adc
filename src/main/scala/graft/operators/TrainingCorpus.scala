package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.TextFunctions._

/** End-to-end training-corpus assembly — the composed pipeline the
  * individual t/d operators are stages of, as ONE oracle-exact query:
  *
  *   raw docs → exact dedup (t05's keep-lowest-id-per-fingerprint)
  *            → quality + length gate (t02's integer-exact score)
  *            → 5-gram decontamination vs the benchmark split (t09)
  *            → domain-weighted token mixture (t17)
  *            → fixed-budget sequence packing (t16)
  *
  * This is the GPT-3 data pipeline end to end (Brown et al. NeurIPS'20
  * §2.2: fuzzy-dedup'd, filtered, decontaminated, mixture-weighted,
  * packed) with the exact-arithmetic stage semantics the catalog
  * queries pin individually — so the WHOLE pipeline has a DuckDB
  * oracle, not just its pieces. Output: the packed-corpus manifest
  * (doc_id, source, n_tokens, start_off, first_seq, last_seq) for
  * every document the assembled corpus keeps.
  *
  * Composition cost (the round-8 d12 lesson — recompute nothing): the
  * gates run off ONE slim scored scan; the decontamination shingle
  * pass explodes only gate-surviving documents (semi-join prune before
  * the 5-gram explode — at 100 TB the explode is the expensive scan,
  * so it runs over survivors, not the raw corpus); mixture and packing
  * run on slim (id, source, tokens) frames via the operators' count
  * entry points, never re-scanning text. Every stage keeps its
  * documented scale shape (windowed dedup on the fingerprint hash,
  * broadcast benchmark shingle set is NOT assumed — the decontam join
  * is the t09 hash join — and the two prefix sums are the
  * deterministic-bucket two-phase construction).
  */
object TrainingCorpus {

  /** The t05 gates: composite quality ≥ 0.5, 20 ≤ tokens ≤ 400. */
  val MinQuality = 0.5
  val MinTokens = 20L
  val MaxTokens = 400L

  /** The gated, deduplicated, decontaminated survivor pool as a slim
    * (doc_id, source, n_tokens) frame. The gate survivors are
    * materialized at their fan-out; the decontamination stage stays
    * un-materialized here (the plan spec pins the survivor-pruned
    * explode on THIS frame; [[assemble]] cuts it with an eager
    * checkpoint before the multi-pass mixture/packing stages). */
  private[graft] def cleanPool(trainDocs: DataFrame,
      benchmarkDocs: DataFrame): DataFrame = {
    // one scored scan: fingerprint + token count + integer-exact quality
    val scored = trainDocs.select(
      col("doc_id"), col("source"),
      md5Fingerprint(col("text")).as("fp"),
      tokenCount(col("text")).as("n_tokens"),
      qualityScore(col("text")).as("quality"))
    // materialized at the fan-out: kept feeds BOTH the survivor
    // semi-join (decontamination prune) and the final anti-join —
    // without the cut the scored scan and fingerprint window run twice
    val kept = scored
      .withColumn("keep_id",
        min(col("doc_id")).over(Window.partitionBy(col("fp"))))
      .filter(col("doc_id") === col("keep_id") &&
        col("quality") >= MinQuality &&
        col("n_tokens").between(MinTokens, MaxTokens))
      .select(col("doc_id"), col("source"), col("n_tokens"))
      .localCheckpoint(true)
    // decontamination: shingle-explode ONLY the gate survivors (the
    // semi-join prune runs before the expensive 5-gram explode), then
    // the t09 hash join against the benchmark shingle set
    val survivorText = trainDocs.join(
      kept.select(col("doc_id")), Seq("doc_id"), "left_semi")
    val contaminated = TextAnalysis.decontaminate(survivorText, benchmarkDocs)
      .select(col("doc_id"))
    kept.join(contaminated, Seq("doc_id"), "left_anti")
  }

  /** Assemble the packed training corpus from a documents frame and a
    * held-out benchmark frame (contamination reference). */
  def assemble(trainDocs: DataFrame, benchmarkDocs: DataFrame,
      targetPct: Long = Mixture.DefaultTargetPct,
      budget: Long = Packing.DefaultBudget): DataFrame = {
    // materialize the slim survivor frame ONCE (eager localCheckpoint,
    // the DedupPipeline precedent): mixture and packing each make
    // several passes over their input (bucket totals + local windows +
    // bucket offsets), and without the cut every pass would re-run the
    // scored scan, the fingerprint window, AND the decontamination
    // explode — measured 71 s at sf10 unmaterialized vs ~12 s with
    // the two cuts (SCALING.md). The frames are 3–4 slim columns; at cluster scale
    // the equivalent is a durable-checkpoint/table write between stages
    val clean = cleanPool(trainDocs, benchmarkDocs).localCheckpoint(true)
    // mixture + packing over slim count frames — no text re-scan
    val selected = Mixture.domainMixtureCounts(clean, targetPct = targetPct)
      .select(col("doc_id"), col("source"), col("n_tokens"))
      .localCheckpoint(true)
    Packing.packCounts(selected, budget)
  }

  /** Driver binding: benchmark split = every 23rd doc (the t09/t20/t23
    * convention), the rest the training candidate pool. */
  def assemble(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(s, dir, "documents")
    assemble(docs.filter(col("doc_id") % 23 =!= 0),
      docs.filter(col("doc_id") % 23 === 0))
  }
}
