package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.index.MediaHashIndex
import graft.multimodal.Multimodal
import graft.operators.Dedup

class StreamingMediaDedupSpec extends SparkSpec {

  /** sf0.001 docs split by family position: corpus = members 0,1 of
    * each planted family of 4 (indexed), stream = members 2,3 — so
    * corpus-internal pairs (4k,4k+1), corpus↔stream pairs (4k+1,4k+2),
    * and cross-batch pairs (4k+2,4k+3) all exist BY CONSTRUCTION
    * (consecutive family members are hamming≤5 by the planted-corpus
    * contract). Returns (docs, corpusDocs, b1Docs, b2Docs). */
  private def familySplit() = {
    val docs = graft.core.Tables.load(spark, Sf0001, "documents")
    (docs, docs.filter(col("doc_id") % 4 <= 1),
      docs.filter(col("doc_id") % 4 === 2),
      docs.filter(col("doc_id") % 4 === 3))
  }

  /** Write one media frame as a single parquet FILE inside `srcDir`
    * (the stream source lists files, not subdirectories). */
  private def writeParquetFile(media: DataFrame, srcDir: String,
      name: String): Unit = {
    val tmp = tmpDir(s"smd-stage-$name")
    media.coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = Files.list(Paths.get(tmp)).toArray.map(_.toString)
      .filter(p => p.endsWith(".parquet") && !p.contains("_SUCCESS")).head
    Files.move(Paths.get(part), Paths.get(srcDir, name))
  }

  private def pairSet(df: DataFrame): Set[(Long, Long)] =
    df.collect().map(r =>
      (r.getAs[Long]("media_a"), r.getAs[Long]("media_b"))).toSet

  /** Incremental reference: delta sigs probed against a FRESH index
    * built over `corpusSigs` at a throwaway path. */
  private def incrRef(corpusSigs: DataFrame, deltaSigs: DataFrame,
      tag: String): Set[(Long, Long)] = {
    val p = tmpDir(s"smd-ref-$tag")
    MediaHashIndex.build(corpusSigs, p)
    pairSet(Dedup.incrementalHamming64PairsFrames(deltaSigs,
      MediaHashIndex.buckets(spark, p), MediaHashIndex.counts(spark, p), 5))
  }

  test("micro-batch union equals the batch pair set minus corpus-internal pairs") {
    val (docs, corpus, b1, b2) = familySplit()
    val idxPath = tmpDir("smd-idx")
    MediaHashIndex.build(
      Multimodal.imageSigFrame(Multimodal.syntheticImageCorpus(corpus)),
      idxPath)

    val src = tmpDir("smd-src")
    writeParquetFile(Multimodal.syntheticImageCorpus(b1), src, "a-batch1.parquet")
    writeParquetFile(Multimodal.syntheticImageCorpus(b2), src, "b-batch2.parquet")

    val outDir = tmpDir("smd-out")
    val q = StreamingMediaDedup.start(spark, src, Multimodal.imageSigFrame,
      idxPath, outDir, tmpDir("smd-ckpt"),
      options = Map("maxFilesPerTrigger" -> "1"))
    q.awaitTermination(120000)

    val streamed = pairSet(StreamingMediaDedup.pairs(spark, outDir))
    val full = pairSet(
      Multimodal.imageNeardup(Multimodal.syntheticImageCorpus(docs)))
    val expected = full.filter { case (a, b) => a % 4 >= 2 || b % 4 >= 2 }
    assert(streamed == expected,
      s"missed=${(expected -- streamed).take(5)} extra=${(streamed -- expected).take(5)}")
    // the split guarantees all three pair provenances are non-vacuous
    assert(expected.exists { case (a, b) => a % 4 == 2 && b % 4 == 3 },
      "no cross-batch pair — pending log untested")
    assert((full -- expected).nonEmpty, "every pair touches the stream — vacuous")
  }

  test("torn compaction (append landed, deletes did not) is recovered") {
    val (_, corpus, b1, b2) = familySplit()
    val idxPath = tmpDir("smd-t-idx")
    val corpusSigs =
      Multimodal.imageSigFrame(Multimodal.syntheticImageCorpus(corpus))
        .localCheckpoint(true)
    MediaHashIndex.build(corpusSigs, idxPath)
    val outDir = tmpDir("smd-t-out")

    StreamingMediaDedup.processBatch(Multimodal.syntheticImageCorpus(b1),
      Multimodal.imageSigFrame, "sid0", 0L, idxPath, outDir)
    val afterB1 = pairSet(StreamingMediaDedup.pairs(spark, outDir))

    // simulate the crash window inside compact: the index append has
    // LANDED but the pending-dir deletes (and intent removal) have not
    val lg = new BatchLog(spark, outDir, Seq("sigs"))
    MediaHashIndex.append(lg.readPending("sigs", Seq("sid0-b0")), idxPath)
    lg.beginCompaction(Seq("sid0-b0"))

    // the next batch must finish the recovery FIRST — otherwise batch-0
    // media ride the corpus side twice (index AND stale pending log),
    // double-counting bucket widths in the hot-bucket ledger
    StreamingMediaDedup.processBatch(Multimodal.syntheticImageCorpus(b2),
      Multimodal.imageSigFrame, "sid0", 1L, idxPath, outDir)
    assert(lg.pendingPrefixes == Seq("sid0-b1"),
      s"stale pending survived recovery: ${lg.pendingPrefixes}")

    val streamed = pairSet(StreamingMediaDedup.pairs(spark, outDir))
    val b1Sigs = Multimodal.imageSigFrame(Multimodal.syntheticImageCorpus(b1))
      .localCheckpoint(true)
    val b2Sigs = Multimodal.imageSigFrame(Multimodal.syntheticImageCorpus(b2))
    val expected = afterB1 ++
      incrRef(corpusSigs.unionByName(b1Sigs), b2Sigs, "t")
    assert(streamed == expected,
      s"missed=${(expected -- streamed).take(5)} extra=${(streamed -- expected).take(5)}")
  }

  test("compaction intent WITHOUT a landed append must not delete pending sigs") {
    val (_, corpus, b1, b2) = familySplit()
    val idxPath = tmpDir("smd-l-idx")
    val corpusSigs =
      Multimodal.imageSigFrame(Multimodal.syntheticImageCorpus(corpus))
        .localCheckpoint(true)
    MediaHashIndex.build(corpusSigs, idxPath)
    val outDir = tmpDir("smd-l-out")

    StreamingMediaDedup.processBatch(Multimodal.syntheticImageCorpus(b1),
      Multimodal.imageSigFrame, "sid0", 0L, idxPath, outDir)

    // simulate the LOSS crash window: compact wrote its intent (with
    // the coverage line) and died before MediaHashIndex.append touched
    // anything — the index is still ready at its OLD count
    val lg = new BatchLog(spark, outDir, Seq("sigs"))
    val preCount = MediaHashIndex.sigs(spark, idxPath).count()
    val pendCount = lg.readPending("sigs", Seq("sid0-b0")).count()
    lg.beginCompaction(Seq("sid0-b0"), preCount + pendCount)

    // the next batch's recovery must KEEP the un-folded pending state
    // (before the coverage check it deleted it — silent signature loss)
    StreamingMediaDedup.processBatch(Multimodal.syntheticImageCorpus(b2),
      Multimodal.imageSigFrame, "sid0", 1L, idxPath, outDir)
    assert(lg.pendingPrefixes.toSet == Set("sid0-b0", "sid0-b1"),
      s"pending sigs lost to an un-landed compaction: ${lg.pendingPrefixes}")

    // b2's pairs saw b1 via the surviving pending log
    val streamed = pairSet(StreamingMediaDedup.pairs(spark, outDir))
    val b1Sigs = Multimodal.imageSigFrame(Multimodal.syntheticImageCorpus(b1))
      .localCheckpoint(true)
    val b2Sigs = Multimodal.imageSigFrame(Multimodal.syntheticImageCorpus(b2))
    val expected = incrRef(corpusSigs, b1Sigs, "l1") ++
      incrRef(corpusSigs.unionByName(b1Sigs), b2Sigs, "l2")
    assert(streamed == expected,
      s"missed=${(expected -- streamed).take(5)} extra=${(streamed -- expected).take(5)}")

    // a real compact then folds BOTH batches in and drains the log
    StreamingMediaDedup.compact(spark, outDir, idxPath)
    assert(lg.pendingPrefixes.isEmpty)
    assert(MediaHashIndex.sigs(spark, idxPath).count() ===
      preCount + pendCount + b2Sigs.count())
  }

  test("replayed micro-batch is a no-op; compact folds the log into the index (audio)") {
    val (_, corpus, b1, b2) = familySplit()
    val idxPath = tmpDir("smd-c-idx")
    val corpusSigs =
      Multimodal.audioSigFrame(Multimodal.syntheticAudioCorpus(corpus))
        .localCheckpoint(true)
    MediaHashIndex.build(corpusSigs, idxPath)
    val outDir = tmpDir("smd-c-out")

    StreamingMediaDedup.processBatch(Multimodal.syntheticAudioCorpus(b1),
      Multimodal.audioSigFrame, "sid0", 0L, idxPath, outDir)
    val afterB1 = pairSet(StreamingMediaDedup.pairs(spark, outDir))
    // replay (crash between marker and checkpoint commit): no-op
    StreamingMediaDedup.processBatch(Multimodal.syntheticAudioCorpus(b1),
      Multimodal.audioSigFrame, "sid0", 0L, idxPath, outDir)
    assert(pairSet(StreamingMediaDedup.pairs(spark, outDir)) == afterB1)

    // compact batch 0 into the index, then score batch 1 with an EMPTY
    // pending log — pairs must still see batch-0 media as corpus
    StreamingMediaDedup.compact(spark, outDir, idxPath)
    assert(MediaHashIndex.ready(spark, idxPath))
    StreamingMediaDedup.processBatch(Multimodal.syntheticAudioCorpus(b2),
      Multimodal.audioSigFrame, "sid0", 1L, idxPath, outDir)
    val streamed = pairSet(StreamingMediaDedup.pairs(spark, outDir))
    val b1Sigs = Multimodal.audioSigFrame(Multimodal.syntheticAudioCorpus(b1))
      .localCheckpoint(true)
    val b2Sigs = Multimodal.audioSigFrame(Multimodal.syntheticAudioCorpus(b2))
    val expected = incrRef(corpusSigs, b1Sigs, "c1") ++
      incrRef(corpusSigs.unionByName(b1Sigs), b2Sigs, "c2")
    assert(streamed == expected,
      s"missed=${(expected -- streamed).take(5)} extra=${(streamed -- expected).take(5)}")
    // compact is idempotent with an empty log
    StreamingMediaDedup.compact(spark, outDir, idxPath)
    StreamingMediaDedup.compact(spark, outDir, idxPath)
    assert(pairSet(StreamingMediaDedup.pairs(spark, outDir)) == streamed)
  }

  test("scoring plan: candidate join broadcasts the delta side; no sort-merge join") {
    val df = StreamingMediaDedup.benchScore(spark, Sf0001)
    df.collect() // force the final AQE plan
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"delta side not broadcast in:\n${plan.take(4000)}")
    assert(!plan.contains("SortMergeJoin"),
      s"sort-merge join crept into the scoring plan:\n${plan.take(4000)}")
  }

  test("video binding (sn05b): micro-batch union equals m06 pairs touching the stream") {
    // the modality-parametric contract made concrete for the third
    // modality: videoSigFrame through the SAME start/processBatch
    // dataflow — real AVI decode in the batch, frozen video index on
    // the corpus side, cross-batch pairs via the pending log
    val (docs, corpus, b1, b2) = familySplit()
    val idxPath = tmpDir("smd-v-idx")
    MediaHashIndex.build(
      Multimodal.videoSigFrame(Multimodal.syntheticVideoCorpus(corpus)),
      idxPath)

    val src = tmpDir("smd-v-src")
    writeParquetFile(Multimodal.syntheticVideoCorpus(b1), src, "a-batch1.parquet")
    writeParquetFile(Multimodal.syntheticVideoCorpus(b2), src, "b-batch2.parquet")

    val outDir = tmpDir("smd-v-out")
    val q = StreamingMediaDedup.start(spark, src, Multimodal.videoSigFrame,
      idxPath, outDir, tmpDir("smd-v-ckpt"),
      options = Map("maxFilesPerTrigger" -> "1"))
    q.awaitTermination(120000)

    val streamed = pairSet(StreamingMediaDedup.pairs(spark, outDir))
    val full = pairSet(
      Multimodal.videoNeardup(Multimodal.syntheticVideoCorpus(docs)))
    val expected = full.filter { case (a, b) => a % 4 >= 2 || b % 4 >= 2 }
    assert(streamed == expected,
      s"missed=${(expected -- streamed).take(5)} extra=${(streamed -- expected).take(5)}")
    assert(expected.exists { case (a, b) => a % 4 == 2 && b % 4 == 3 },
      "no cross-batch pair — pending log untested")
    assert((full -- expected).nonEmpty, "every pair touches the stream — vacuous")
  }
}
