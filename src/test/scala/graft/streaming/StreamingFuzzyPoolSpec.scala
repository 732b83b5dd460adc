package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.SparkSpec
import graft.index.FuzzyPoolIndex
import graft.operators.TrainingCorpus

/** Streaming FUZZY pool maintenance ([[StreamingFuzzyPool]]): the live
  * pool after any number of micro-batches must equal the batch
  * recompute `fuzzyCleanPool(corpus ∪ batches, benchmark)` — including
  * cross-batch exact-dup retraction re-keying a NEAR-DUP cluster (the
  * split-capable maintenance the persisted edge graph exists for) —
  * and compaction must fold the pending log into the index without
  * changing the answer. The sn03 spec set, lifted to the fuzzy
  * state. */
class StreamingFuzzyPoolSpec extends SparkSpec {

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("source", StringType),
    StructField("text", StringType)))

  private def corpusSplit() = {
    val docs = graft.core.Tables.load(spark, Sf0001, "documents")
      .select(col("doc_id"), col("source"), col("text"))
    val train = docs.filter(col("doc_id") % 23 =!= 0)
    val bench = docs.filter(col("doc_id") % 23 === 0)
    (train, bench,
      train.filter(col("doc_id") % 3 =!= 0),
      train.filter(col("doc_id") % 3 === 0))
  }

  private def writeJsonFile(dir: String, name: String,
      rows: Seq[(Long, String, String)]): Unit = {
    def esc(s: String) = s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case c => c.toString
    }
    val lines = rows.map { case (id, src, t) =>
      s"""{"doc_id":$id,"source":"${esc(src)}","text":"${esc(t)}"}""" }
    Files.writeString(Paths.get(dir, name), lines.mkString("\n"))
  }

  private def poolSet(df: org.apache.spark.sql.DataFrame) =
    df.select(col("doc_id"), col("source"), col("n_tokens"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet

  test("streamed micro-batches: live fuzzy pool and assembly equal the batch recompute") {
    val (train, bench, corpus, delta) = corpusSplit()
    val idxPath = tmpDir("sfp-idx")
    FuzzyPoolIndex.build(corpus, bench, idxPath)

    val src = tmpDir("sfp-src")
    val deltaRows = delta.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    val (b1, b2) = deltaRows.partition(_._1 % 2 == 0)
    writeJsonFile(src, "a-batch1.json", b1)
    writeJsonFile(src, "b-batch2.json", b2)

    val outDir = tmpDir("sfp-out")
    val q = StreamingFuzzyPool.start(spark, src, docSchema, idxPath, outDir,
      tmpDir("sfp-ckpt"), options = Map("maxFilesPerTrigger" -> "1"))
    q.awaitTermination(180000)

    val live = poolSet(StreamingFuzzyPool.pool(spark, outDir, idxPath))
    val full = poolSet(TrainingCorpus.fuzzyCleanPool(train, bench))
    assert(live === full,
      s"missed=${(full -- live).take(3)} extra=${(live -- full).take(3)}")
    // and through the global mixture/packing stages (stream ≡ p03)
    val asmLive = StreamingFuzzyPool.assembleLive(spark, outDir, idxPath)
      .collect().map(_.toSeq).toSet
    val asmFull = TrainingCorpus.assembleFuzzy(train, bench)
      .collect().map(_.toSeq).toSet
    assert(asmLive === asmFull)
  }

  test("cross-batch retraction re-keys a near-dup cluster; compaction preserves the view") {
    val (train, bench, corpus, delta) = corpusSplit()
    val idxPath = tmpDir("sfp-r-idx")
    FuzzyPoolIndex.build(corpus, bench, idxPath)
    val outDir = tmpDir("sfp-r-out")

    // a near-dup cluster among the INDEXED gated docs with ≥2 members:
    // keeper = min member; a later smaller-id exact twin must retract
    // it and hand the cluster to the twin
    val byCluster = FuzzyPoolIndex.clusters(spark, idxPath)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._2).filter(_._2.length >= 2)
    assert(byCluster.nonEmpty, "testdata must plant a multi-member cluster")
    val (keeper, members) = byCluster.head
    val kRow = corpus.filter(col("doc_id") === keeper).collect().head
    import spark.implicits._
    val twin = Seq((-5L, kRow.getString(1), kRow.getString(2)))
      .toDF("doc_id", "source", "text")

    StreamingFuzzyPool.processBatch(delta, "sid0", 0L, idxPath, outDir)
    StreamingFuzzyPool.processBatch(twin, "sid0", 1L, idxPath, outDir)
    val live = poolSet(StreamingFuzzyPool.pool(spark, outDir, idxPath))
    val full = poolSet(TrainingCorpus.fuzzyCleanPool(
      train.unionByName(twin), bench))
    assert(live === full)
    assert(!live.exists(_._1 == keeper),
      "the indexed keeper was not retracted by the smaller-id twin")
    members.map(_._1).filter(_ != keeper)
      .foreach(m => assert(!live.exists(_._1 == m)))
    assert(live.exists(_._1 == -5L) === full.exists(_._1 == -5L))

    // compaction folds the log into the index without changing the view
    StreamingFuzzyPool.compact(spark, outDir, idxPath)
    assert(FuzzyPoolIndex.ready(spark, idxPath))
    assert(new BatchLog(spark, outDir,
      Seq("adds", "fpmins", "bands", "shingles", "newpairs"))
      .pendingPrefixes.isEmpty)
    assert(poolSet(StreamingFuzzyPool.pool(spark, outDir, idxPath)) === full)

    // a batch AFTER compaction scores against the folded index: a
    // fresh near-dup of the twin's cluster must land in ITS cluster
    StreamingFuzzyPool.processBatch(
      Seq((-9L, kRow.getString(1), kRow.getString(2)))
        .toDF("doc_id", "source", "text"),
      "sid0", 2L, idxPath, outDir)
    val live3 = poolSet(StreamingFuzzyPool.pool(spark, outDir, idxPath))
    val full3 = poolSet(TrainingCorpus.fuzzyCleanPool(
      train.unionByName(twin).unionByName(
        Seq((-9L, kRow.getString(1), kRow.getString(2)))
          .toDF("doc_id", "source", "text")), bench))
    assert(live3 === full3)
    assert(live3.exists(_._1 == -9L) && !live3.exists(_._1 == -5L))
  }

  test("replay of a committed batch is a no-op") {
    val (_, bench, corpus, delta) = corpusSplit()
    val idxPath = tmpDir("sfp-p-idx")
    FuzzyPoolIndex.build(corpus, bench, idxPath)
    val outDir = tmpDir("sfp-p-out")
    StreamingFuzzyPool.processBatch(delta, "sid0", 0L, idxPath, outDir)
    val before = poolSet(StreamingFuzzyPool.pool(spark, outDir, idxPath))
    StreamingFuzzyPool.processBatch(delta, "sid0", 0L, idxPath, outDir)
    assert(poolSet(StreamingFuzzyPool.pool(spark, outDir, idxPath)) === before)
    assert(new BatchLog(spark, outDir,
      Seq("adds", "fpmins", "bands", "shingles", "newpairs"))
      .pendingPrefixes === Seq("sid0-b0"))
  }
}
