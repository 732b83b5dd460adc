package graft.approx

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate/sketch operators (reference
  * `internal/query/approximation.go`: HLL p∈[4,16] default 12,
  * Count-Min 1000×5, both mergeable, registered per (table, column)).
  *
  * Spark-first mapping: HLL++ via `approx_count_distinct(col, rsd)`
  * (rsd ≈ 1.04/√(2^p) — p=12 → ~1.63%), DataSketches HLL via
  * `hll_sketch_agg`/`hll_union_agg`/`hll_sketch_estimate` for *mergeable
  * persisted* sketch state, and `count_min_sketch(col, eps, conf, seed)`
  * for CMS. All three are built-in, codegen'd, partial/final
  * distributed aggregations — the merge logic the reference hand-wrote
  * is the aggregation framework itself. */
object Sketches {

  /** rsd equivalent of the reference's HLL precision p (stderr 1.04/√m). */
  def rsdForPrecision(p: Int): Double = {
    require(p >= 4 && p <= 16, s"precision $p out of [4,16]")
    1.04 / math.sqrt((1 << p).toDouble)
  }

  /** Approximate distinct count at reference-default precision p=12. */
  def approxDistinct(c: Column, p: Int = 12): Column =
    approx_count_distinct(c, rsdForPrecision(p))

  /** Mergeable HLL sketch (DataSketches binary) — the persisted form the
    * reference keeps in its registry. lgK ≈ p. */
  def hllSketch(c: Column, p: Int = 12): Column = hll_sketch_agg(c, lit(p))

  def hllMerge(sketch: Column, p: Int = 12): Column = hll_union_agg(sketch, lit(false))

  def hllEstimate(sketch: Column): Column = hll_sketch_estimate(sketch)

  /** Count-Min sketch binary with the reference's default shape
    * (width 1000 × depth 5 ⇒ eps≈e/1000≈0.0027, conf≈1-e^-5≈0.993). */
  def countMin(c: Column, eps: Double = 0.0027, confidence: Double = 0.993,
      seed: Int = 42): Column =
    count_min_sketch(c, lit(eps), lit(confidence), lit(seed))
}

/** Per-(table, column) registry of persisted HLL sketch state, mirroring
  * the reference's `HLLRegistry` (`approximation.go:309-455`): build
  * per-group sketches once, merge and estimate without rescanning. */
class SketchRegistry {
  private val sketches = TrieMap[(String, String), Array[Byte]]()

  /** Build and store a sketch of `column` over `df` (one scan). */
  def buildHll(df: DataFrame, table: String, column: String, p: Int = 12): Unit = {
    val bin = df.agg(Sketches.hllSketch(col(column), p).as("s"))
      .head().getAs[Array[Byte]]("s")
    sketches.put((table, column), bin)
  }

  /** Estimate cardinality from stored sketch state (no scan). */
  def estimate(spark: org.apache.spark.sql.SparkSession, table: String,
      column: String): Option[Long] =
    sketches.get((table, column)).map { bin =>
      import spark.implicits._
      Seq(bin).toDF("s").select(Sketches.hllEstimate(col("s")).as("e"))
        .head().getLong(0)
    }

  /** Merge two tables'/columns' sketches into a combined estimate —
    * the distributed-merge capability the reference exposes. */
  def mergedEstimate(spark: org.apache.spark.sql.SparkSession,
      keys: Seq[(String, String)]): Option[Long] = {
    val bins = keys.flatMap(sketches.get)
    if (bins.isEmpty) None
    else {
      import spark.implicits._
      Some(bins.toDF("s")
        .agg(Sketches.hllEstimate(hll_union_agg(col("s"), lit(false))).as("e"))
        .head().getLong(0))
    }
  }

  def keys: Seq[(String, String)] = sketches.keys.toSeq
}
