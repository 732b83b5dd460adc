package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Pins the shuffled-hash build-side sizing ([[Dedup.bcastOrHashIf]]):
  * a shuffled-hash build cannot spill, so an over-budget side must
  * repartition BY THE JOIN KEYS to enough partitions that every
  * per-task build fits [[Dedup]]'s 64 MB budget — the first
  * deep-regime RecallProbe run (2M vectors, 22-bit/57-table regime,
  * ~4 GB signature side over 32 partitions) died with "not enough
  * memory to build hash map" without this. */
class BuildSizingSpec extends SparkSpec {

  test("over-budget side sizes its exchange to the build budget") {
    val left = spark.range(1000).select(col("id").as("k"), col("id").as("a"))
    val right = spark.range(1000).select(col("id").as("k"), col("id").as("b"))
    // declared 8 GiB build (1 MiB/row × 8192 rows) → ⌈8 GiB / 64 MiB⌉
    // = 128 partitions, above the test session's shuffle partitions
    val sized = Dedup.bcastOrHashIf(1L << 20, 8192L, Seq("k"))(right)
    val plan = left.join(sized, Seq("k")).queryExecution.executedPlan.toString
    assert(plan.contains("ShuffledHashJoin"), plan.take(500))
    assert(plan.contains("hashpartitioning(k#") && plan.contains(", 128)"),
      plan.take(2000))
  }

  test("under-budget side still broadcasts") {
    val left = spark.range(1000).select(col("id").as("k"), col("id").as("a"))
    val right = spark.range(1000).select(col("id").as("k"), col("id").as("b"))
    val sized = Dedup.bcastOrHashIf(28, 1000L, Seq("k"))(right)
    val plan = left.join(sized, Seq("k")).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(500))
  }
}
