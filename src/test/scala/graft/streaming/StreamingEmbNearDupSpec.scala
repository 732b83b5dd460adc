package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType, LongType, StructField, StructType}

import graft.SparkSpec
import graft.core.Tables
import graft.index.EmbSignatureIndex
import graft.operators.Dedup

class StreamingEmbNearDupSpec extends SparkSpec {

  private val embSchema = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(DoubleType))))

  /** Drop-planted sf0.001 vectors (d13's corpus): pmod-1 rows are the
    * indexed corpus, pmod-2 and pmod-0 rows play as two stream
    * batches. pmod, not %: planted ids are negative. */
  private def split() = {
    val emb = Dedup.plantedDropCorpus(Tables.load(spark, Sf0001, "embeddings"))
    (emb,
      emb.filter(pmod(col("vec_id"), lit(3)) === 1),
      emb.filter(pmod(col("vec_id"), lit(3)) === 2),
      emb.filter(pmod(col("vec_id"), lit(3)) === 0))
  }

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.collect().map(_.mkString("|")).toSet

  private def writeJsonFile(dir: String, name: String,
      df: org.apache.spark.sql.DataFrame): Unit = {
    val lines = df.collect().map { r =>
      val id = r.getAs[Long]("vec_id")
      val v = r.getAs[scala.collection.Seq[Double]]("embedding")
      s"""{"vec_id":$id,"embedding":[${v.mkString(",")}]}"""
    }
    Files.writeString(Paths.get(dir, name), lines.mkString("\n"))
  }

  test("streamed micro-batch union equals batch pairs minus corpus-internal") {
    val (emb, corpus, b1, b2) = split()
    val idxPath = tmpDir("semb-idx")
    EmbSignatureIndex.build(corpus, idxPath, emb.count())

    val src = tmpDir("semb-src")
    writeJsonFile(src, "a-batch1.json", b1)
    writeJsonFile(src, "b-batch2.json", b2)

    val outDir = tmpDir("semb-out")
    val q = StreamingEmbNearDup.start(spark, src, embSchema, idxPath, outDir,
      tmpDir("semb-ckpt"), options = Map("maxFilesPerTrigger" -> "1"))
    q.awaitTermination(120000)

    val streamed = pairSet(StreamingEmbNearDup.pairs(spark, outDir))
    val expected = pairSet(
      Dedup.embeddingNearDup(emb, Dedup.ProductionEmbTau)
        .filter(pmod(col("vec_a"), lit(3)) =!= 1 || pmod(col("vec_b"), lit(3)) =!= 1))
    assert(streamed == expected,
      s"missed=${(expected -- streamed).take(5)} extra=${(streamed -- expected).take(5)}")
    // cross-batch pairs exist, else the pending-log union is untested
    val crossBatch = Dedup.embeddingNearDup(emb, Dedup.ProductionEmbTau)
      .filter((pmod(col("vec_a"), lit(3)) === 2 && pmod(col("vec_b"), lit(3)) === 0) ||
        (pmod(col("vec_a"), lit(3)) === 0 && pmod(col("vec_b"), lit(3)) === 2))
    assert(crossBatch.count() > 0, "no cross-batch pair — pending log untested")
  }

  test("scoring plan: no sort-merge join may enter the batch score") {
    // same pin as the text scorer: broadcast-or-shuffled-hash only —
    // a sort of the candidate stream is the round-8 OOM mode
    val df = StreamingEmbNearDup.benchScore(spark, Sf0001)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast in:\n${plan.take(3000)}")
    assert(!plan.contains("SortMergeJoin"),
      s"sort-merge join crept into the emb scoring plan:\n${plan.take(3000)}")
  }

  test("replay is a no-op; compact folds the log and scoring continues") {
    val (emb, corpus, b1, b2) = split()
    val idxPath = tmpDir("semb-c-idx")
    EmbSignatureIndex.build(corpus, idxPath, emb.count())
    val outDir = tmpDir("semb-c-out")

    StreamingEmbNearDup.processBatch(b1, "sid0", 0L, idxPath, outDir)
    val afterB1 = pairSet(StreamingEmbNearDup.pairs(spark, outDir))
    StreamingEmbNearDup.processBatch(b1, "sid0", 0L, idxPath, outDir) // replay
    assert(pairSet(StreamingEmbNearDup.pairs(spark, outDir)) == afterB1)

    StreamingEmbNearDup.compact(spark, outDir, idxPath)
    assert(EmbSignatureIndex.ready(spark, idxPath))
    // index now holds corpus ∪ b1 — meta corpus size must say so
    assert(EmbSignatureIndex.meta(spark, idxPath)._2 ===
      corpus.count() + b1.count())
    StreamingEmbNearDup.processBatch(b2, "sid0", 1L, idxPath, outDir)
    val streamed = pairSet(StreamingEmbNearDup.pairs(spark, outDir))
    val expected = pairSet(
      Dedup.embeddingNearDup(emb, Dedup.ProductionEmbTau)
        .filter(pmod(col("vec_a"), lit(3)) =!= 1 || pmod(col("vec_b"), lit(3)) =!= 1))
    assert(streamed == expected,
      s"missed=${(expected -- streamed).take(5)} extra=${(streamed -- expected).take(5)}")
    // compacting the remaining (b2) log leaves pair outputs untouched
    StreamingEmbNearDup.compact(spark, outDir, idxPath)
    assert(pairSet(StreamingEmbNearDup.pairs(spark, outDir)) == streamed)
    assert(EmbSignatureIndex.meta(spark, idxPath)._2 === emb.count())
  }
}
