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

  test("video-only near-dup pair: the third modality shrinks the survivor set") {
    // the r15 verdict's observability fixture: a pipeline WITH a video
    // frame, planted so the video pairs link docs whose images and
    // audio do NOT pair — if the decision join silently lost
    // videoDropIds (the failure every earlier check was blind to),
    // the three-modality survivor set would equal the two-modality one
    // and this test fails.
    val mm = graft.multimodal.Multimodal
    // docs 0..4: image/audio families {0,1,2,3} vs {4} (doc_id/4
    // partition — doc 4 is alone in its family, no image/audio pair);
    // the video clips are members 0..4 of ONE 8-member video family
    // (doc_id/8), chained by consecutive one-patch steps, so all five
    // clips fall into a single video cluster
    val fixture = Seq((0L, 10L), (1L, 11L), (2L, 12L), (3L, 13L), (4L, 14L))
      .toDF("doc_id", "n_chars")
    val images = mm.syntheticImageCorpus(fixture)
    val audio = mm.syntheticAudioCorpus(fixture)
    val video = mm.syntheticVideoCorpus(fixture)

    val twoWay = DedupPipeline.media(fixture, images, audio)
    assert(twoWay.jointMediaSurvivors.collect().map(_.getLong(0)).toSeq
      === Seq(0L, 4L), "image/audio must each keep their family min")

    val threeWay = DedupPipeline.media(fixture, images, audio, Some(video))
    // (3,4) is a video-ONLY near-dup pair: clips chain (consecutive
    // members of one video family), images/audio don't (different
    // doc_id/4 families) — so video alone is why 4 now drops
    val videoPairs = threeWay.videoPairs.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(videoPairs.contains((3L, 4L)),
      s"planted video-only pair missing from $videoPairs")
    assert(threeWay.jointMediaSurvivors.collect().map(_.getLong(0)).toSeq
      === Seq(0L), "video drop set did not reach the joint decision")
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
