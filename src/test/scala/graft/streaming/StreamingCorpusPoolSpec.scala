package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.SparkSpec
import graft.index.CorpusPoolIndex
import graft.operators.TrainingCorpus

/** Streaming corpus-pool maintenance ([[StreamingCorpusPool]]): the
  * live pool after any number of micro-batches must equal the batch
  * recompute `cleanPool(corpus ∪ batches, benchmark)` — including
  * cross-batch retractions — and compaction must fold the pending log
  * into the index without changing the answer. */
class StreamingCorpusPoolSpec extends SparkSpec {

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("source", StringType),
    StructField("text", StringType)))

  /** sf0.001 train/bench split (the p01 convention), with the train
    * side split corpus vs stream on %3 (the p02 convention). */
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
    df.collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"),
        r.getAs[Long]("n_tokens"), r.getAs[String]("fp"))).toSet

  test("streamed micro-batches: live pool equals the batch recompute") {
    val (train, bench, corpus, delta) = corpusSplit()
    val idxPath = tmpDir("scp-idx")
    CorpusPoolIndex.build(corpus, bench, idxPath)

    val src = tmpDir("scp-src")
    val deltaRows = delta.collect().map(r =>
      (r.getAs[Long]("doc_id"), r.getAs[String]("source"),
        r.getAs[String]("text"))).toSeq
    val (b1, b2) = deltaRows.partition(_._1 % 2 == 0)
    writeJsonFile(src, "a-batch1.json", b1)
    writeJsonFile(src, "b-batch2.json", b2)

    val outDir = tmpDir("scp-out")
    val q = StreamingCorpusPool.start(spark, src, docSchema, idxPath, outDir,
      tmpDir("scp-ckpt"), options = Map("maxFilesPerTrigger" -> "1"))
    q.awaitTermination(120000)

    val live = poolSet(StreamingCorpusPool.pool(spark, outDir, idxPath))
    val full = poolSet(TrainingCorpus.cleanPool(train, bench, keepFp = true))
    assert(live === full,
      s"missed=${(full -- live).take(3)} extra=${(live -- full).take(3)}")
  }

  test("cross-batch retraction, then compaction, then a post-compact batch") {
    val (train, bench, corpus, delta) = corpusSplit()
    val idxPath = tmpDir("scp-r-idx")
    CorpusPoolIndex.build(corpus, bench, idxPath)
    val outDir = tmpDir("scp-r-out")

    // batch 1: the real delta. batch 2: a smaller-id exact duplicate
    // of an INDEXED pool keeper — the recompute would re-pick it
    val keeper = TrainingCorpus.cleanPool(corpus, bench, keepFp = true)
      .orderBy(col("doc_id")).limit(1).collect().head
    val kId = keeper.getAs[Long]("doc_id")
    val kText = corpus.filter(col("doc_id") === kId)
      .select(col("text")).collect().head.getString(0)
    import spark.implicits._
    val b2 = Seq((-7L, keeper.getAs[String]("source"), kText))
      .toDF("doc_id", "source", "text")

    StreamingCorpusPool.processBatch(delta, "sid0", 0L, idxPath, outDir)
    StreamingCorpusPool.processBatch(b2, "sid0", 1L, idxPath, outDir)
    val live = poolSet(StreamingCorpusPool.pool(spark, outDir, idxPath))
    val full = poolSet(TrainingCorpus.cleanPool(
      train.unionByName(b2), bench, keepFp = true))
    assert(live === full)
    assert(live.exists(_._1 == -7L) && !live.exists(_._1 == kId),
      "the indexed keeper was not retracted by the smaller-id arrival")

    // compaction folds the log into the index without changing the view
    StreamingCorpusPool.compact(spark, outDir, idxPath)
    assert(new BatchLog(spark, outDir, Seq("adds", "fpmins"))
      .pendingPrefixes.isEmpty)
    assert(poolSet(CorpusPoolIndex.pool(spark, idxPath)) === full)

    // a batch AFTER compaction scores against the folded index
    val b3 = Seq((-9L, keeper.getAs[String]("source"), kText))
      .toDF("doc_id", "source", "text")
    StreamingCorpusPool.processBatch(b3, "sid0", 2L, idxPath, outDir)
    val live3 = poolSet(StreamingCorpusPool.pool(spark, outDir, idxPath))
    val full3 = poolSet(TrainingCorpus.cleanPool(
      train.unionByName(b2).unionByName(b3), bench, keepFp = true))
    assert(live3 === full3)
    assert(live3.exists(_._1 == -9L) && !live3.exists(_._1 == -7L))
  }

  test("replay of a committed batch is a no-op") {
    val (_, bench, corpus, delta) = corpusSplit()
    val idxPath = tmpDir("scp-p-idx")
    CorpusPoolIndex.build(corpus, bench, idxPath)
    val outDir = tmpDir("scp-p-out")
    StreamingCorpusPool.processBatch(delta, "sid0", 0L, idxPath, outDir)
    val before = poolSet(StreamingCorpusPool.pool(spark, outDir, idxPath))
    StreamingCorpusPool.processBatch(delta, "sid0", 0L, idxPath, outDir)
    assert(poolSet(StreamingCorpusPool.pool(spark, outDir, idxPath)) === before)
    assert(new BatchLog(spark, outDir, Seq("adds", "fpmins"))
      .pendingPrefixes === Seq("sid0-b0"))
  }

  test("compaction intent WITHOUT a landed fold must not delete pending state") {
    val (_, bench, corpus, delta) = corpusSplit()
    val idxPath = tmpDir("scp-l-idx")
    CorpusPoolIndex.build(corpus, bench, idxPath)
    val outDir = tmpDir("scp-l-out")
    StreamingCorpusPool.processBatch(delta, "sid0", 0L, idxPath, outDir)
    val live = poolSet(StreamingCorpusPool.pool(spark, outDir, idxPath))

    // crash window: compact wrote its TOKEN intent and died before the
    // pool rewrite — the pool is still the pre-fold version (rewrite
    // folds can shrink counts, so coverage is the persisted fold token)
    val lg = new BatchLog(spark, outDir, Seq("adds", "fpmins"))
    lg.beginCompaction(Seq("sid0-b0"),
      token = lg.compactionToken(Seq("sid0-b0")))

    // recovery must roll the intent back and KEEP the pending batch —
    // the live view stays correct throughout
    StreamingCorpusPool.compact(spark, outDir, idxPath)
    assert(lg.pendingPrefixes.isEmpty,
      "the real compact should then fold and drain the log")
    assert(poolSet(CorpusPoolIndex.pool(spark, idxPath)) === live,
      "pool after recovery+compact must equal the pre-crash live view")
  }
}
