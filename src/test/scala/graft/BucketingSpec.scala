package graft

import org.apache.spark.sql.functions._

import graft.core.Tables

/** Bucketed co-located joins — the 100 TB strategy for repeated joins on
  * the same key: both sides pre-bucketed by the join key join WITHOUT a
  * shuffle (no Exchange in the plan). This is what replaces the
  * reference's consistent-hash write routing (`coordinator.go:274-371`):
  * route-on-write so reads don't re-shuffle. */
class BucketingSpec extends SparkSpec {

  test("bucketed tables join without Exchange") {
    val li = Tables.load(spark, Sf0001, "lineitem")
      .select("l_orderkey", "l_quantity", "l_extendedprice")
    val o = Tables.load(spark, Sf0001, "orders")
      .select("o_orderkey", "o_totalprice")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    // a fresh derby metastore doesn't know about dirs left by previous
    // JVMs — remove the physical locations too
    Seq("b_lineitem", "b_orders").foreach { t =>
      val p = new java.io.File(s"/tmp/graft-warehouse/$t")
      if (p.exists()) org.apache.commons.io.FileUtils.deleteDirectory(p)
    }
    li.write.mode("overwrite").bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("b_lineitem")
    o.write.mode("overwrite").bucketBy(8, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable("b_orders")

    // disable broadcast so the sort-merge bucketed path is exercised
    // (at real scale neither side would be broadcastable)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("b_lineitem")
        .join(spark.table("b_orders"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity")).as("q"), max(col("o_totalprice")).as("p"))
      val n = joined.count()
      assert(n > 0)
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join should not shuffle:\n$plan")
      // same result as the plain (shuffle/broadcast) join
      val plainN = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey")).agg(sum(col("l_quantity")), max(col("o_totalprice")))
        .count()
      assert(n == plainN)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
