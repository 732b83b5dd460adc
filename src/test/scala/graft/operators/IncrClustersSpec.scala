package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.core.Tables

/** Incremental cluster maintenance ([[Dedup.mergeClusters]] /
  * [[Dedup.incrementalClusters]]): folding a delta pair batch into a
  * persisted cluster frame must equal the full CC recompute — on
  * synthetic graphs covering each merge topology, and end-to-end on
  * real data through the persisted-index path. */
class IncrClustersSpec extends SparkSpec {
  import spark.implicits._

  private def pairs(ps: (Long, Long)*): DataFrame =
    ps.toSeq.toDF("doc_a", "doc_b")

  private def rows(df: DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  private def ccOf(df: DataFrame): DataFrame = Dedup.mergeClusters(
    spark.emptyDataFrame
      .select(lit(0L).as("doc_id"), lit(0L).as("cluster_id")).limit(0), df)

  test("delta pair bridging two corpus clusters merges them") {
    val corpus = pairs((1L, 2L), (10L, 11L))
    val clusters = ccOf(corpus)
    assert(rows(clusters) === Set((1L, 1L), (2L, 1L), (10L, 10L), (11L, 10L)))
    val merged = Dedup.mergeClusters(clusters, pairs((2L, 10L)))
    assert(rows(merged) === rows(ccOf(corpus.unionByName(pairs((2L, 10L))))))
    assert(rows(merged) === Set((1L, 1L), (2L, 1L), (10L, 1L), (11L, 1L)))
  }

  test("delta doc with a smaller id becomes its cluster's new label") {
    val corpus = pairs((5L, 6L), (6L, 7L))
    val merged = Dedup.mergeClusters(ccOf(corpus), pairs((3L, 7L)))
    assert(rows(merged) ===
      Set((3L, 3L), (5L, 3L), (6L, 3L), (7L, 3L)))
  }

  test("delta-only component and untouched corpus clusters coexist") {
    val corpus = pairs((1L, 2L), (10L, 11L))
    val merged = Dedup.mergeClusters(ccOf(corpus), pairs((20L, 21L), (21L, 22L)))
    assert(rows(merged) === Set((1L, 1L), (2L, 1L),
      (10L, 10L), (11L, 10L), (20L, 20L), (21L, 20L), (22L, 20L)))
  }

  test("chained delta pairs merge many corpus clusters transitively") {
    val corpus = pairs((1L, 2L), (10L, 11L), (20L, 21L))
    val delta = pairs((2L, 10L), (11L, 20L))
    val merged = Dedup.mergeClusters(ccOf(corpus), delta)
    assert(rows(merged) === rows(ccOf(corpus.unionByName(delta))))
    assert(merged.select(countDistinct(col("cluster_id"))).as[Long].head() === 1L)
  }

  test("d14 equals the full d08 recompute end-to-end (persisted index)") {
    val docs = Tables.load(spark, Sf0001, "documents")
    val incr = Dedup.incrementalClusters(spark, Sf0001)
    val full = Dedup.dedupClusters(docs)
    assert(rows(incr) === rows(full))
    assert(incr.count() > 0)
  }
}
