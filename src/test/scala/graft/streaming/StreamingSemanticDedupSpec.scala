package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables
import graft.index.SemDedupIndex
import graft.operators.{Dedup, SemanticDedup, Similarity}

/** [[StreamingSemanticDedup]]: the live decision view must equal the
  * batch recompute under the index's frozen centroids at every point
  * in the stream's life — before compaction (pending log riding the
  * corpus side), after replay (exactly-once), and after compaction
  * (state folded into [[SemDedupIndex]] via appendFrames, no
  * re-assign/re-pair). */
class StreamingSemanticDedupSpec extends SparkSpec {

  private def planted =
    Dedup.plantedProductionCorpus(Tables.load(spark, Sf0001, "embeddings"))

  private def decisionSet(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.select(col("vec_id"), col("cell"), col("centroid_sim"), col("is_dup"))
      .collect().map(_.mkString("|")).toSet

  private def batchUnderIndexCents(full: org.apache.spark.sql.DataFrame,
      path: String): org.apache.spark.sql.DataFrame = {
    val (_, _, sub, tau) = SemDedupIndex.meta(spark, path)
    val (cents, subCents) = SemDedupIndex.centroids(spark, path)
    SemanticDedup.semanticDedupWithCents(
      Similarity.withNorm(spark, full), tau, cents, subCents, sub, full.count())
  }

  test("live view equals the batch recompute; replay no-op; compact continuity") {
    val emb = planted
    val b0 = emb.filter(pmod(col("vec_id"), lit(3)) === 1) // indexed corpus
    val b1 = emb.filter(pmod(col("vec_id"), lit(3)) === 2) // first batch
    val b2 = emb.filter(pmod(col("vec_id"), lit(3)) === 0) // second batch
    val idxPath = tmpDir("ssem-idx")
    SemDedupIndex.build(b0, idxPath)
    val outDir = tmpDir("ssem-out")

    StreamingSemanticDedup.processBatch(b1, "sid0", 0L, idxPath, outDir)
    StreamingSemanticDedup.processBatch(b2, "sid0", 1L, idxPath, outDir)
    val live = decisionSet(
      StreamingSemanticDedup.decisions(spark, outDir, idxPath))
    assert(live === decisionSet(batchUnderIndexCents(emb, idxPath)))

    // replay (crash between marker and checkpoint commit): a no-op
    StreamingSemanticDedup.processBatch(b1, "sid0", 0L, idxPath, outDir)
    assert(decisionSet(
      StreamingSemanticDedup.decisions(spark, outDir, idxPath)) === live)

    // compact folds the log into the index: the INDEX's own decision
    // view must now equal the live view, and the log must drain
    StreamingSemanticDedup.compact(spark, outDir, idxPath)
    assert(SemDedupIndex.ready(spark, idxPath))
    assert(new BatchLog(spark, outDir, Seq("members", "drops"))
      .pendingPrefixes.isEmpty)
    assert(decisionSet(SemDedupIndex.decisions(spark, idxPath)) === live)
    // compact is idempotent with an empty log
    StreamingSemanticDedup.compact(spark, outDir, idxPath)
    assert(decisionSet(SemDedupIndex.decisions(spark, idxPath)) === live)
  }

  test("compaction intent WITHOUT a landed append must not delete pending state") {
    val emb = planted
    val b0 = emb.filter(pmod(col("vec_id"), lit(2)) === 1)
    val b1 = emb.filter(pmod(col("vec_id"), lit(2)) === 0)
    val idxPath = tmpDir("ssem-l-idx")
    SemDedupIndex.build(b0, idxPath)
    val outDir = tmpDir("ssem-l-out")
    StreamingSemanticDedup.processBatch(b1, "sid0", 0L, idxPath, outDir)

    // crash window: intent written (with coverage), append never ran
    val lg = new BatchLog(spark, outDir, Seq("members", "drops"))
    val pre = SemDedupIndex.members(spark, idxPath).count()
    val pend = lg.readPending("members", Seq("sid0-b0")).count()
    lg.beginCompaction(Seq("sid0-b0"), pre + pend)

    // recovery must roll the intent back and KEEP the pending state
    val live = decisionSet(
      StreamingSemanticDedup.decisions(spark, outDir, idxPath))
    StreamingSemanticDedup.compact(spark, outDir, idxPath)
    assert(SemDedupIndex.members(spark, idxPath).count() === pre + pend)
    assert(lg.pendingPrefixes.isEmpty)
    assert(decisionSet(SemDedupIndex.decisions(spark, idxPath)) === live)
  }

  test("streaming source end-to-end: two json micro-batches") {
    val emb = planted
    val b0 = emb.filter(pmod(col("vec_id"), lit(3)) === 1)
    val idxPath = tmpDir("ssem-e2e-idx")
    SemDedupIndex.build(b0, idxPath)
    val src = tmpDir("ssem-e2e-src")
    emb.filter(pmod(col("vec_id"), lit(3)) === 2)
      .coalesce(1).write.mode("append").json(src)
    emb.filter(pmod(col("vec_id"), lit(3)) === 0)
      .coalesce(1).write.mode("append").json(src)
    val outDir = tmpDir("ssem-e2e-out")
    val q = StreamingSemanticDedup.start(spark, src,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("vec_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("embedding",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.DoubleType)))),
      idxPath, outDir, tmpDir("ssem-e2e-ckpt"),
      options = Map("maxFilesPerTrigger" -> "1"))
    q.awaitTermination(120000)
    val live = decisionSet(
      StreamingSemanticDedup.decisions(spark, outDir, idxPath))
    assert(live === decisionSet(batchUnderIndexCents(emb, idxPath)))
  }
}
