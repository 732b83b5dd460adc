package graft.index

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables
import graft.operators.Similarity

/** Persisted IVF-PQ index (s05). */
class PqIndexSpec extends SparkSpec {

  private def corpus = Tables.load(spark, Sf001, "embeddings")

  test("indexed query reproduces the batch path row-for-row") {
    // training is deterministic (hash-sample, farthest-first seeding,
    // fixed Lloyd rounds), so the same corpus must yield the same
    // quantizers — and pqSearch is the shared tail, so the results
    // must be IDENTICAL, not merely close
    val path = tmpDir("pqidx-eq")
    PqIndex.build(corpus, path)
    val queries = corpus.filter(col("vec_id") < 5)
    val batch = Similarity.annIvfPq(corpus, queries, 10).collect().toSeq
    val indexed = PqIndex.query(spark, path, queries, 10).collect().toSeq
    assert(indexed == batch)
  }

  test("append encodes the delta at the frozen quantizers") {
    val path = tmpDir("pqidx-app")
    val base = corpus.filter(col("vec_id") % 3 =!= 0)
    val delta = corpus.filter(col("vec_id") % 3 === 0)
    PqIndex.build(base, path)
    val centsBefore = PqIndex.centroids(spark, path)
    PqIndex.append(delta, path)
    // quantizers frozen, corpus count advanced, every vector present
    assert(PqIndex.centroids(spark, path).map(_.toSeq).toSeq ==
      centsBefore.map(_.toSeq).toSeq)
    assert(PqIndex.meta(spark, path)._2 == corpus.count())
    assert(spark.read.parquet(s"$path/codes").count() == corpus.count())
    // the delta's stored codes equal a direct kernel encoding against
    // the recorded quantizers — append is pure projection, no drift
    val cb = PqIndex.codebooks(spark, path)
    val stored = spark.read.parquet(s"$path/codes")
      .filter(col("vec_id") % 3 === 0)
      .select("vec_id", "codes").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    Similarity.withNorm(spark, delta).collect().foreach { r =>
      val v = new GenericArrayData(r.getSeq[Double](1).toArray)
      val cell = graft.functions.VectorKernel.nearestCentroid(v, centsBefore)
      val want = graft.functions.PqKernel.encodeRes(v, cell, centsBefore, cb)
      assert(stored(r.getLong(0)) == want)
    }
    // and the index still answers with healthy recall
    val queries = corpus.filter(col("vec_id") < 5)
    val exact = Similarity.annBrute(corpus, queries, 10)
    val r = Similarity.recallOf(exact, PqIndex.query(spark, path, queries, 10))
    info(f"post-append recall: $r%.3f")
    assert(r >= 0.8)
  }

  test("ensure rebuilds on coarse-resolution drift, not on every call") {
    val path = tmpDir("pqidx-drift")
    val small = corpus.limit(100)
    PqIndex.build(small, path) // 100 vectors -> 40 cells
    val c0 = PqIndex.meta(spark, path)._1
    // same projection: no rebuild (cells unchanged)
    PqIndex.ensure(small, path, 100L)
    assert(PqIndex.meta(spark, path)._1 == c0)
    // projected growth pushes ivfConfig past the recorded resolution
    PqIndex.ensure(corpus, path, 1000000L)
    assert(PqIndex.meta(spark, path)._1 > c0)
  }

  test("ensure re-trains once appended mass passes the staleness bound") {
    // the sf0.01 embeddings table is 500 rows (vec_id 0..499): build
    // on 150, then append 150 + 200 so the second batch crosses 2·n0
    val path = tmpDir("pqidx-stale")
    val base = corpus.filter(col("vec_id") < 150)
    PqIndex.build(base, path)
    val centsBefore = PqIndex.centroids(spark, path)
    // one batch AT the 2× bound (n = 300 = 2·150, not past it):
    // quantizers stay frozen (projection pinned to the build size so
    // the cell-drift axis stays quiet and only staleness is under test)
    PqIndex.append(corpus.filter(col("vec_id") >= 150 && col("vec_id") < 300), path)
    PqIndex.ensure(base, path, 150L)
    assert(PqIndex.centroids(spark, path).map(_.toSeq).toSeq ==
      centsBefore.map(_.toSeq).toSeq, "retrained below the bound")
    // the next batch pushes n past 2·n0: the next ensure re-trains on
    // the frame it is handed (the full corpus) and resets the snapshot
    PqIndex.append(corpus.filter(col("vec_id") >= 300), path)
    assert(PqIndex.meta(spark, path)._2 > 2 * 150L)
    PqIndex.ensure(corpus, path, corpus.count())
    val (_, nAfter) = PqIndex.meta(spark, path)
    assert(nAfter == corpus.count())
    // rebuilt: another ensure at the same size is a no-op again
    val centsRebuilt = PqIndex.centroids(spark, path)
    PqIndex.ensure(corpus, path, corpus.count())
    assert(PqIndex.centroids(spark, path).map(_.toSeq).toSeq ==
      centsRebuilt.map(_.toSeq).toSeq)
  }

  test("probe set prunes the codes partitions in the executed plan") {
    val path = tmpDir("pqidx-prune")
    PqIndex.build(corpus, path)
    val queries = corpus.filter(col("vec_id") < 5)
    val df = PqIndex.query(spark, path, queries, 10)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // codes are partitionBy(cell); the probe join is a broadcast hash
    // join on the partition column, so dynamic partition pruning must
    // reach the codes FileScan
    assert(plan.contains("dynamicpruning") || plan.contains("PartitionFilters: [isnotnull(cell"),
      s"no partition pruning on the codes scan:\n${plan.take(2000)}")
  }
}
