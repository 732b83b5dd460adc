package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Pins the shuffled-hash build-side sizing ([[Dedup.bcastOrHashIf]]):
  * a shuffled-hash build cannot spill, so an over-budget side must
  * repartition BY THE JOIN KEYS to enough partitions that every
  * per-task build fits [[Dedup]]'s per-partition budget — 16 MB
  * default, capped by the actual execution pool at pool/(16·slots)
  * (the starved-pool response SpillProbe exercises; in this test
  * session the pool cap sits above 16 MB so the tests pin the 16 MB
  * branch), `spark.graft.join.buildPartitionBytes` overrides both.
  * The first deep-regime RecallProbe run (2M vectors, 22-bit/57-table
  * regime, ~4 GB signature side over 32 partitions) died with "not
  * enough memory to build hash map" without the sizing; the first
  * 5M-doc d04 probe died the same way under a 64 MB budget whose 32
  * concurrent builds oversubscribed the execution pool; and the
  * round-9 starved probe of d13/sn02 died under a 16 MB budget
  * against a ~107 MB pool — each failure tightened this policy. */
class BuildSizingSpec extends SparkSpec {

  test("over-budget side sizes its exchange to the build budget") {
    val left = spark.range(1000).select(col("id").as("k"), col("id").as("a"))
    val right = spark.range(1000).select(col("id").as("k"), col("id").as("b"))
    // declared 2 GiB build (1 MiB/row × 2048 rows) → ⌈2 GiB / 16 MiB⌉
    // = 128 partitions, above the test session's shuffle partitions
    val sized = Dedup.bcastOrHashIf(1L << 20, 2048L, Seq("k"))(right)
    val plan = left.join(sized, Seq("k")).queryExecution.executedPlan.toString
    assert(plan.contains("ShuffledHashJoin"), plan.take(500))
    assert(plan.contains("hashpartitioning(k#") && plan.contains(", 128)"),
      plan.take(2000))
  }

  test("the build budget is conf-overridable") {
    val left = spark.range(1000).select(col("id").as("k"), col("id").as("a"))
    val right = spark.range(1000).select(col("id").as("k"), col("id").as("b"))
    spark.conf.set("spark.graft.join.buildPartitionBytes", (64L << 20).toString)
    try {
      val sized = Dedup.bcastOrHashIf(1L << 20, 8192L, Seq("k"))(right)
      val plan = left.join(sized, Seq("k")).queryExecution.executedPlan.toString
      assert(plan.contains("hashpartitioning(k#") && plan.contains(", 128)"),
        plan.take(2000))
    } finally spark.conf.unset("spark.graft.join.buildPartitionBytes")
  }

  test("under-budget side still broadcasts") {
    val left = spark.range(1000).select(col("id").as("k"), col("id").as("a"))
    val right = spark.range(1000).select(col("id").as("k"), col("id").as("b"))
    val sized = Dedup.bcastOrHashIf(28, 1000L, Seq("k"))(right)
    val plan = left.join(sized, Seq("k")).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(500))
  }
}
