package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.core.Tables

/** The composable pipeline ([[DedupPipeline]]) must produce exactly
  * the catalog operators' results while computing each shared
  * intermediate once. */
class DedupPipelineSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Tables.load(spark, Sf0001, "documents")
  private def emb =
    Dedup.plantedDropCorpus(Tables.load(spark, Sf0001, "embeddings"))

  private def rows(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.collect().map(_.mkString("|")).toSet

  test("pipeline derivations equal the one-shot catalog operators") {
    val p = DedupPipeline(docs, emb)
    assert(rows(p.textClusters) === rows(Dedup.dedupClusters(docs)))
    assert(rows(p.embClusters) === rows(Dedup.embDedupClusters(emb)))
    assert(rows(p.survivors) === rows(Dedup.dedupSurvivors(docs)))
    assert(rows(p.jointSurvivors) === rows(Dedup.jointSurvivors(docs, emb)))
  }

  test("decision joins reuse materialized clusters: no re-clustering jobs") {
    val p = DedupPipeline(docs, emb)
    p.textClusters.count() // materialize (CC loop runs its jobs here)
    p.embClusters.count()
    @volatile var jobs = 0
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs += 1
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      p.survivors.count()
      p.jointSurvivors.count()
      // listener events are posted asynchronously; actions are done, so
      // a short settle is enough for the job-start counter
      Thread.sleep(500)
      // two anti-join counts over checkpointed frames plus the two
      // one-off cluster-count jobs feeding the drop-set broadcast
      // hint: a handful of AQE stage jobs, nowhere near the dozens a
      // cold CC loop runs — the pin that the derivations did NOT
      // recompute the cluster frames
      assert(jobs <= 12, s"decision joins ran $jobs jobs — recomputation?")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("cc durable-checkpoint path produces identical clusters") {
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), // one chain component
      (10L, 11L), // separate pair
      (20L, 21L), (21L, 22L), (20L, 22L) // triangle
    ).toDF("doc_a", "doc_b")
    val local = Dedup.clustersFromPairs(pairs).collect().map(_.toSeq).toSet
    val dir = tmpDir("graft-cc-ck")
    spark.conf.set("spark.graft.cc.checkpointDir", dir)
    try {
      val durable = Dedup.clustersFromPairs(pairs).collect().map(_.toSeq).toSet
      assert(durable === local)
      val wrote = new java.io.File(dir).listFiles()
      assert(wrote != null && wrote.nonEmpty, "no durable checkpoint written")
    } finally spark.conf.unset("spark.graft.cc.checkpointDir")
  }
}
