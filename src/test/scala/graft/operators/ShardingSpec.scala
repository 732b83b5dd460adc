package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.core.Tables

/** Sharded export ([[Sharding.shardExport]]): the distributed
  * two-phase global rank must equal the sequential sort-and-deal
  * definition exactly, shards must be balanced by construction, and
  * the corpus must never meet a single-partition window. */
class ShardingSpec extends SparkSpec {

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("shard/pos equal the sequential sort-and-deal computation") {
    val docs = Tables.load(spark, Sf0001, "documents")
    val got = Sharding.shardExport(docs).collect()
      .map(r => (r.getLong(2), (r.getLong(0), r.getLong(1)))).toMap
    val expected = docs.select(col("doc_id")).collect().map(_.getLong(0))
      .map(id => (md5hex(s"$id:42"), id)).sorted.zipWithIndex
      .map { case ((_, id), i) => (id, (i.toLong % 16, i.toLong / 16)) }.toMap
    assert(got === expected)
  }

  test("shards are balanced to within one document") {
    val sizes = Sharding.shardExport(Tables.load(spark, Sf001, "documents"))
      .groupBy(col("shard")).count().collect().map(_.getLong(1))
    assert(sizes.length === 16)
    assert(sizes.max - sizes.min <= 1)
  }

  test("a different seed is a different permutation") {
    val docs = Tables.load(spark, Sf0001, "documents")
    def order(seed: String) =
      Sharding.shardExport(docs, seed = seed).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(order("42") !== order("43"))
  }

  test("positions within each shard are dense from zero") {
    val rows = Sharding.shardExport(Tables.load(spark, Sf0001, "documents"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    rows.groupBy(_._1).values.foreach { ps =>
      val sorted = ps.map(_._2).sorted
      assert(sorted === (0L until sorted.length).toArray.toSeq)
    }
  }

  test("no corpus-sized single-partition window in the plan") {
    val plan = Sharding.shardExport(Tables.load(spark, Sf0001, "documents"))
      .queryExecution.executedPlan.toString
    // the corpus window partitions by pid; the only single-partition
    // window runs over the ≤4096-row bucket-count frame
    assert(plan.contains("hashpartitioning(pid"))
    assert(!plan.contains("SPARK_PARTITION_ID"))
  }
}
