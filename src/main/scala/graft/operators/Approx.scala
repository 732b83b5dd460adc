package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.approx.Sketches
import graft.core.Tables

/** Approximate-operator query surface (reference HLL/CMS,
  * `approximation.go`). Estimates are deterministic for fixed input, but
  * engine-specific — no DuckDB oracle (rows-only driver check). */
object Approx {

  /** approx vs exact distinct users per event type (HLL++, p=12 like the
    * reference default; error ≈1.6%). */
  def approxDistinct(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")
      .groupBy(col("event_type"))
      .agg(
        Sketches.approxDistinct(col("user_id")).as("approx_users"),
        countDistinct(col("user_id")).as("exact_users"))
      .orderBy(col("event_type"))

  /** Mergeable sketch round-trip: per-type HLL sketches unioned to a
    * global estimate — the distributed sketch-merge capability
    * (reference `HLLRegistry.Merge`). */
  def hllMerge(s: SparkSession, dir: String): DataFrame = {
    val perType = Tables.load(s, dir, "events")
      .groupBy(col("event_type"))
      .agg(Sketches.hllSketch(col("user_id")).as("sk"))
    perType
      .agg(
        Sketches.hllEstimate(hll_union_agg(col("sk"), lit(false))).as("merged_users"),
        count(lit(1)).as("n_sketches"))
  }
}
