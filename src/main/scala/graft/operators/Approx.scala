package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.approx.Sketches
import graft.core.Tables

/** Approximate-operator query surface (reference HLL/CMS,
  * `approximation.go`). Estimates are engine-specific, so an
  * exact-match oracle cannot compare the VALUES across engines — but
  * it can compare the VERDICT: each query emits the exact answer plus
  * a 0/1 gate asserting the estimate landed inside the sketch's
  * published error contract (|approx−exact| ≤ 3·rsd·exact, the
  * reference's ~1.6 % at p=12 — `approximation.go:197-199` — taken at
  * 3σ). The DuckDB oracle recomputes the exact side and pins the gate
  * to literal 1, so a silent sketch regression flips a CORRECTNESS
  * row instead of hiding behind a rows-only check (the r16 verdict's
  * bound-assertion encoding). */
object Approx {

  private val P = 12 // reference default precision
  /** 3σ of the HLL standard error 1.04/√2^p. */
  private def bound3Sigma: Double = 3.0 * Sketches.rsdForPrecision(P)

  /** Approx vs exact distinct users per event type (HLL++, p=12 like
    * the reference default). One scan computes both sides partial→final;
    * the gate compares them. */
  def approxDistinct(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")
      .groupBy(col("event_type"))
      .agg(
        Sketches.approxDistinct(col("user_id"), P).as("approx_users"),
        countDistinct(col("user_id")).as("exact_users"))
      .select(col("event_type"), col("exact_users"),
        when(abs(col("approx_users") - col("exact_users")) <=
            lit(bound3Sigma) * col("exact_users"), 1L).otherwise(0L)
          .as("within_bound"))
      .orderBy(col("event_type"))

  /** Mergeable sketch round-trip: per-type HLL sketches unioned to a
    * global estimate — the distributed sketch-merge capability
    * (reference `HLLRegistry.Merge`) — gated against the exact global
    * distinct under the same 3σ contract. The two single-row frames
    * (merged estimate, exact count) join by broadcast cross — one row
    * each by construction. */
  def hllMerge(s: SparkSession, dir: String): DataFrame = {
    val events = Tables.load(s, dir, "events")
    val merged = events
      .groupBy(col("event_type"))
      .agg(Sketches.hllSketch(col("user_id"), P).as("sk"))
      .agg(
        Sketches.hllEstimate(hll_union_agg(col("sk"), lit(false))).as("merged_users"),
        count(lit(1)).as("n_sketches"))
    val exact = events.agg(countDistinct(col("user_id")).as("exact_users"))
    merged.crossJoin(broadcast(exact))
      .select(col("exact_users"), col("n_sketches"),
        when(abs(col("merged_users") - col("exact_users")) <=
            lit(bound3Sigma) * col("exact_users"), 1L).otherwise(0L)
          .as("within_bound"))
  }
}
