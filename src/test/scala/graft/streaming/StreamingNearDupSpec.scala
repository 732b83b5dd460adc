package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.SparkSpec
import graft.operators.Dedup

class StreamingNearDupSpec extends SparkSpec {

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType)))

  /** sf0.001 docs split: corpus = id%3!=0 (indexed), stream = id%3==0
    * played as JSON files. Returns (docs, corpus, delta). */
  private def corpusSplit() = {
    val docs = graft.core.Tables.load(spark, Sf0001, "documents")
      .select(col("doc_id"), col("text"))
    (docs, docs.filter(col("doc_id") % 3 =!= 0), docs.filter(col("doc_id") % 3 === 0))
  }

  private def writeJsonFile(dir: String, name: String,
      rows: Seq[(Long, String)]): Unit = {
    def esc(s: String) = s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case c => c.toString
    }
    val lines = rows.map { case (id, t) => s"""{"doc_id":$id,"text":"${esc(t)}"}""" }
    Files.writeString(Paths.get(dir, name), lines.mkString("\n"))
  }

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet

  test("micro-batch union equals the batch pair set minus corpus-internal pairs") {
    val (docs, corpus, delta) = corpusSplit()
    val idxPath = tmpDir("snd-idx")
    graft.index.SignatureIndex.build(corpus, idxPath)

    // two micro-batches: delta split by parity, one source file each —
    // maxFilesPerTrigger=1 forces file-per-batch under AvailableNow
    val src = tmpDir("snd-src")
    val deltaRows = delta.collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text"))).toSeq
    val (b1, b2) = deltaRows.partition(_._1 % 2 == 0)
    writeJsonFile(src, "a-batch1.json", b1)
    writeJsonFile(src, "b-batch2.json", b2)

    val outDir = tmpDir("snd-out")
    val q = StreamingNearDup.start(spark, src, docSchema, idxPath, outDir,
      tmpDir("snd-ckpt"), options = Map("maxFilesPerTrigger" -> "1"))
    q.awaitTermination(120000)

    val streamed = pairSet(StreamingNearDup.pairs(spark, outDir))
    val full = pairSet(Dedup.minhashLsh(docs))
    val expected = full.filter { case (a, b) => a % 3 == 0 || b % 3 == 0 }
    assert(streamed == expected,
      s"missed=${(expected -- streamed).take(5)} extra=${(streamed -- expected).take(5)}")
    // cross-batch pairs exist (both sides post-corpus, different
    // batches) — otherwise the pending-log union is untested
    val crossBatch = expected.filter { case (a, b) =>
      a % 3 == 0 && b % 3 == 0 && (a % 2) != (b % 2) }
    assert(crossBatch.nonEmpty, "no cross-batch pair — pending log untested")
    assert((full -- expected).nonEmpty, "every pair touches the stream — vacuous")
  }

  test("torn compaction (append landed, deletes did not) is recovered") {
    val (_, corpus, delta) = corpusSplit()
    val idxPath = tmpDir("snd-t-idx")
    graft.index.SignatureIndex.build(corpus, idxPath)
    val outDir = tmpDir("snd-t-out")
    val deltaRows = delta.collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text"))).toSeq
    val (b1, b2) = deltaRows.partition(_._1 % 2 == 0)
    import spark.implicits._
    val b1df = b1.toDF("doc_id", "text")
    val b2df = b2.toDF("doc_id", "text")

    StreamingNearDup.processBatch(b1df, "sid0", 0L, idxPath, outDir)
    val afterB1 = pairSet(StreamingNearDup.pairs(spark, outDir))

    // simulate the crash window inside compact: the index append has
    // LANDED but the pending-dir deletes (and intent removal) have not
    val lg = new BatchLog(spark, outDir, Seq("bands", "shingles"))
    graft.index.SignatureIndex.appendFrames(spark,
      lg.readPending("bands", Seq("sid0-b0")),
      lg.readPending("shingles", Seq("sid0-b0")), idxPath)
    lg.beginCompaction(Seq("sid0-b0"))

    // the next batch must finish the recovery FIRST — otherwise batch-1
    // docs ride the corpus side twice (index AND stale pending log),
    // double-counting bucket widths in the hot-bucket ledger
    StreamingNearDup.processBatch(b2df, "sid0", 1L, idxPath, outDir)
    assert(lg.pendingPrefixes == Seq("sid0-b1"),
      s"stale pending survived recovery: ${lg.pendingPrefixes}")

    val streamed = pairSet(StreamingNearDup.pairs(spark, outDir))
    val incrB2 = pairSet(Dedup.incrementalPairs(
      b2df, { // reference: fresh index over corpus ∪ batch1
        val p = tmpDir("snd-t-ref")
        graft.index.SignatureIndex.build(corpus.unionByName(b1df), p); p
      }))
    assert(streamed == (afterB1 ++ incrB2),
      s"missed=${((afterB1 ++ incrB2) -- streamed).take(5)} " +
        s"extra=${(streamed -- (afterB1 ++ incrB2)).take(5)}")
  }

  test("compaction intent WITHOUT a landed append must not delete pending state") {
    val (_, corpus, delta) = corpusSplit()
    val idxPath = tmpDir("snd-l-idx")
    graft.index.SignatureIndex.build(corpus, idxPath)
    val outDir = tmpDir("snd-l-out")
    import spark.implicits._
    val deltaRows = delta.collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text"))).toSeq
    val (b1, b2) = deltaRows.partition(_._1 % 2 == 0)
    StreamingNearDup.processBatch(b1.toDF("doc_id", "text"),
      "sid0", 0L, idxPath, outDir)

    // crash window: compact wrote its coverage intent and died BEFORE
    // the append touched the index
    val lg = new BatchLog(spark, outDir, Seq("bands", "shingles"))
    val pre = graft.index.SignatureIndex.shingles(spark, idxPath).count()
    val pend = lg.readPending("shingles", Seq("sid0-b0")).count()
    lg.beginCompaction(Seq("sid0-b0"), pre + pend)

    // recovery (next batch) must KEEP the un-folded pending state
    StreamingNearDup.processBatch(b2.toDF("doc_id", "text"),
      "sid0", 1L, idxPath, outDir)
    assert(lg.pendingPrefixes.toSet == Set("sid0-b0", "sid0-b1"),
      s"pending state lost to an un-landed compaction: ${lg.pendingPrefixes}")
    // a real compact then folds both batches in and drains the log
    StreamingNearDup.compact(spark, outDir, idxPath)
    assert(lg.pendingPrefixes.isEmpty)
    assert(graft.index.SignatureIndex.shingles(spark, idxPath).count() >
      pre + pend)
  }

  test("scoring plan: candidate and verify joins broadcast the delta side") {
    // benchScore = one batch scored with another already pending — the
    // shape the ladder measures. The delta probes must BROADCAST into
    // the candidate join (corpus∪pending bands stream, never shuffle),
    // and the verify's shingle prune must be a broadcast semi-join.
    val df = StreamingNearDup.benchScore(spark, Sf0001)
    df.collect() // force the final AQE plan
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"delta side not broadcast in:\n${plan.take(4000)}")
    assert(plan.contains("LeftSemi"),
      s"shingle prune missing in:\n${plan.take(4000)}")
    // no sort-merge join anywhere: the candidate stream must never be
    // sorted (the round-8 OOM lesson — broadcast or shuffled-hash only)
    assert(!plan.contains("SortMergeJoin"),
      s"sort-merge join crept into the scoring plan:\n${plan.take(4000)}")
  }

  test("replayed micro-batch is a no-op; compact folds the log into the index") {
    val (_, corpus, delta) = corpusSplit()
    val idxPath = tmpDir("snd-c-idx")
    graft.index.SignatureIndex.build(corpus, idxPath)
    val outDir = tmpDir("snd-c-out")

    val deltaRows = delta.collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text"))).toSeq
    val (b1, b2) = deltaRows.partition(_._1 % 2 == 0)
    import spark.implicits._
    val b1df = b1.toDF("doc_id", "text")
    val b2df = b2.toDF("doc_id", "text")

    StreamingNearDup.processBatch(b1df, "sid0", 0L, idxPath, outDir)
    val afterB1 = pairSet(StreamingNearDup.pairs(spark, outDir))
    // replay (crash between marker and checkpoint commit): no-op
    StreamingNearDup.processBatch(b1df, "sid0", 0L, idxPath, outDir)
    assert(pairSet(StreamingNearDup.pairs(spark, outDir)) == afterB1)

    // compact batch 1 into the index, then score batch 2 with an
    // EMPTY pending log — pairs must still see batch-1 docs as corpus
    StreamingNearDup.compact(spark, outDir, idxPath)
    assert(graft.index.SignatureIndex.ready(spark, idxPath))
    StreamingNearDup.processBatch(b2df, "sid0", 1L, idxPath, outDir)
    val streamed = pairSet(StreamingNearDup.pairs(spark, outDir))
    val incrB1 = pairSet(Dedup.incrementalPairs(
      b1df, { // reference: fresh index over the same corpus
        val p = tmpDir("snd-ref1"); graft.index.SignatureIndex.build(corpus, p); p
      }))
    val incrB2 = pairSet(Dedup.incrementalPairs(
      b2df, {
        val p = tmpDir("snd-ref2")
        graft.index.SignatureIndex.build(corpus.unionByName(b1df), p); p
      }))
    assert(streamed == (incrB1 ++ incrB2),
      s"missed=${((incrB1 ++ incrB2) -- streamed).take(5)} " +
        s"extra=${(streamed -- (incrB1 ++ incrB2)).take(5)}")
    // compact is idempotent with an empty log
    StreamingNearDup.compact(spark, outDir, idxPath)
    StreamingNearDup.compact(spark, outDir, idxPath)
    assert(pairSet(StreamingNearDup.pairs(spark, outDir)) == streamed)
  }

  test("compact after a crash mid-append must not re-append (no double fold)") {
    // The crash window INSIDE a fold: intent written, the index append
    // landed, but the crash hit before the READY marker was recreated.
    // The next compact() must NOT fold again — the index already holds
    // the pending rows, and a re-append would duplicate every one of
    // them while the count coverage reads the doubled rows as "landed"
    // and deletes the pending dirs. Contract shared by all six
    // streaming compactors (the `if (!ready) return` gate after the
    // recovery finishCompaction).
    val (_, corpus, delta) = corpusSplit()
    val idxPath = tmpDir("snd-d-idx")
    graft.index.SignatureIndex.build(corpus, idxPath)
    val outDir = tmpDir("snd-d-out")
    import spark.implicits._
    val deltaRows = delta.collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text"))).toSeq
    val b1df = deltaRows.toDF("doc_id", "text")
    StreamingNearDup.processBatch(b1df, "sid0", 0L, idxPath, outDir)

    val lg = new BatchLog(spark, outDir, Seq("bands", "shingles"))
    val pre = graft.index.SignatureIndex.shingles(spark, idxPath).count()
    val pend = lg.readPending("shingles", Seq("sid0-b0")).count()
    lg.beginCompaction(Seq("sid0-b0"), pre + pend)
    graft.index.SignatureIndex.appendFrames(spark,
      lg.readPending("bands", Seq("sid0-b0")),
      lg.readPending("shingles", Seq("sid0-b0")), idxPath)
    val fs = new org.apache.hadoop.fs.Path(idxPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(idxPath, "_SIGIDX_READY"), false)

    // gated: the torn index must be left for the rebuild contract —
    // no second append, pending and intent both kept
    StreamingNearDup.compact(spark, outDir, idxPath)
    assert(!graft.index.SignatureIndex.ready(spark, idxPath))
    assert(graft.index.SignatureIndex.shingles(spark, idxPath).count()
      == pre + pend,
      "compact re-appended into a torn index (double fold)")
    assert(lg.pendingPrefixes == Seq("sid0-b0"),
      s"pending lost under a torn index: ${lg.pendingPrefixes}")

    // the rebuild contract repairs the index from the corpus (pending
    // still in the log), after which ONE fold drains it exactly once
    graft.index.SignatureIndex.build(corpus, idxPath)
    StreamingNearDup.compact(spark, outDir, idxPath)
    assert(lg.pendingPrefixes.isEmpty)
    assert(graft.index.SignatureIndex.shingles(spark, idxPath).count()
      == pre + pend)
  }
}
