package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{DoubleType, LongType, StructField, StructType}

import graft.index.SignatureIndex
import graft.operators.Dedup

/** Continuous near-dup scoring: Structured Streaming over a document
  * source, scored per micro-batch against the persisted MinHash index
  * ([[graft.index.SignatureIndex]]) — the streaming form of the d07
  * daily-ingest story. The reference has no streaming dedup at all
  * (its subscription surface, `internal/subscription`, only publishes
  * CDC events); this is the pipeline-scale addition: a 100 TB corpus
  * taking a continuous document feed scores each arriving batch
  * delta-vs-corpus in delta-proportional time instead of re-running a
  * corpus-wide near-dup job on a schedule.
  *
  * Contract — frozen-index scoring with bounded staleness:
  *
  *  - batch N emits every verified pair (d, x) with d in batch N and
  *    x in (index corpus ∪ batches 1..N): within-batch and
  *    cross-batch pairs surface at the LATER side's batch, so the
  *    union over batches is exactly the [[Dedup.minhashLsh]] pair set
  *    minus corpus-internal pairs (restricted to uncapped buckets —
  *    the same caveat as [[Dedup.incrementalPairs]], whose core this
  *    shares).
  *  - the INDEX is never mutated by the stream. Committed batches
  *    accumulate in a pending log (their bands/shingles, written once
  *    per batch); scoring unions the log onto the corpus side. The
  *    log is horizon-bounded by [[compact]] — an offline single-writer
  *    step that folds it into the index via the batch
  *    [[SignatureIndex.appendFrames]] (the staleness bound: run it
  *    daily and the log never exceeds a day of ingest).
  *
  * Exactly-once under foreachBatch's at-least-once replay: the
  * [[BatchLog]] protocol (batch-scoped OVERWRITE dirs, marker last,
  * replay of a marked batch is a no-op).
  *
  * Single-writer per outDir, like every index writer in this repo
  * (concurrent streams would need a table-format transaction log,
  * which SURVEY §4 scopes out). */
object StreamingNearDup {

  private val PendingTables = Seq("bands", "shingles")

  private def log(s: SparkSession, outDir: String) =
    new BatchLog(s, outDir, PendingTables)

  private def streamId(checkpoint: String): String = {
    val d = java.security.MessageDigest.getInstance("SHA-256")
      .digest(checkpoint.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    "s" + d.take(8).map(b => f"$b%02x").mkString
  }

  /** All pairs the stream has committed so far (union of per-batch
    * outputs; empty-schema frame when none). */
  def pairs(s: SparkSession, outDir: String): DataFrame =
    log(s, outDir).pairs(StructType(Seq(
      StructField("doc_a", LongType), StructField("doc_b", LongType),
      StructField("jaccard", DoubleType))))

  /** The scoring plan for one batch: delta signatures scored against
    * (index ∪ pending log minus `excludePrefix`). Returns the scored
    * pairs plus the delta's bands/shingles (the commit path persists
    * them as the batch's pending state). */
  private def scorePlan(batch: DataFrame, indexPath: String, lg: BatchLog,
      excludePrefix: String): (DataFrame, DataFrame, DataFrame) = {
    val s = batch.sparkSession
    val docs = batch.select(col("doc_id"), col("text"))
    val deltaSh = Dedup.hashedShingleSets(docs)
    val deltaBands = Dedup.bandedSignatures(deltaSh).localCheckpoint(true)

    val pending = lg.pendingPrefixes.filterNot(_ == excludePrefix)
    val idxBands = SignatureIndex.bands(s, indexPath)
    val idxSh = SignatureIndex.shingles(s, indexPath)
    val idxCounts = SignatureIndex.counts(s, indexPath)
    val (corpusBands, corpusSh, corpusCounts) =
      if (pending.isEmpty) (idxBands, idxSh, idxCounts)
      else {
        val pb = lg.readPending("bands", pending)
        val ps = lg.readPending("shingles", pending)
        // pending recount rides as EXTRA (band, bh) rows — the core
        // merges per-key after its delta-sized semi-prune
        val pc = pb.groupBy(col("band"), col("bh"))
          .agg(count(lit(1)).as("n"), min(col("doc_id")).as("min_doc"))
        (idxBands.unionByName(pb), idxSh.unionByName(ps),
          idxCounts.unionByName(pc))
      }
    (Dedup.incrementalPairsFrames(
      deltaSh, deltaBands, corpusBands, corpusSh, corpusCounts),
      deltaBands, deltaSh)
  }

  /** Score one micro-batch and commit its outputs. Exposed for the
    * replay-idempotence spec; the stream calls it from foreachBatch. */
  private[streaming] def processBatch(batch: DataFrame, sid: String,
      batchId: Long, indexPath: String, outDir: String): Unit = {
    val s = batch.sparkSession
    val lg = log(s, outDir)
    val prefix = s"$sid-b$batchId"
    if (lg.isCommitted(prefix)) return // replay of a fully committed batch
    // torn compact: complete its deletes first — under the coverage
    // check, so a compact that crashed BEFORE its append rolls back
    // instead of losing the pending state (see StreamingMediaDedup)
    lg.finishCompaction(SignatureIndex.ready(s, indexPath),
      SignatureIndex.shingles(s, indexPath).count())
    val (scored, deltaBands, deltaSh) = scorePlan(batch, indexPath, lg, prefix)
    // batch-scoped OVERWRITE dirs: a replayed crash recomputes the same
    // content (same pending set — markers gate what a replay can see)
    scored.write.mode("overwrite").parquet(lg.pairsPath(prefix))
    deltaBands.write.mode("overwrite").parquet(lg.pendingPath("bands", prefix))
    deltaSh.write.mode("overwrite").parquet(lg.pendingPath("shingles", prefix))
    lg.commit(prefix)
  }

  /** Scaling-ladder binding (sn01): the cost of scoring ONE streaming
    * micro-batch — half the d07 delta (1/6 of the corpus) — with the
    * other half already committed in the pending log. Reuses d07's
    * content-keyed corpus index (same corpus slice, same tag); the
    * first attempt pays the one-time index build + batch-0 commit, the
    * second measures the warm per-batch scoring cost (the d07
    * best-of-2 precedent). */
  def benchScore(s: SparkSession, dir: String): DataFrame = {
    val docs = graft.core.Tables.load(s, dir, "documents")
      .select(col("doc_id"), col("text"))
    val isDelta = col("doc_id") % 3 === 0
    val idxPath = graft.index.IndexCache.pathFor(
      s, s"$dir/documents.parquet", "sig-mod=3")
    if (!SignatureIndex.ready(s, idxPath))
      SignatureIndex.build(docs.filter(!isDelta), idxPath)
    val logDir = graft.index.IndexCache.pathFor(
      s, s"$dir/documents.parquet", "snd-log")
    val lg = log(s, logDir)
    if (!lg.isCommitted("bench-b0"))
      processBatch(docs.filter(isDelta && col("doc_id") % 2 === 0),
        "bench", 0L, idxPath, logDir)
    scorePlan(docs.filter(isDelta && col("doc_id") % 2 =!= 0),
      idxPath, lg, "")._1
  }

  /** Start the scorer on a newline-JSON document source (canonical
    * doc_id/text fields, like the documents table). Use
    * `maxFilesPerTrigger` via `options` to bound batch size. */
  def start(
      spark: SparkSession,
      sourceDir: String,
      schema: StructType,
      indexPath: String,
      outDir: String,
      checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow(),
      options: Map[String, String] = Map.empty): StreamingQuery = {
    require(SignatureIndex.ready(spark, indexPath),
      s"signature index at $indexPath is not ready — build it first")
    val sid = streamId(checkpoint)
    spark.readStream
      .schema(schema)
      .options(options)
      .json(sourceDir)
      .writeStream
      .queryName("neardup-score")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) processBatch(batch, sid, batchId, indexPath, outDir)
        ()
      }
      .start()
  }

  /** Fold the pending log into the index (single-writer; stream must
    * be stopped or between batches — same assumption as every
    * [[SignatureIndex.append]] caller). Protocol: intent file listing
    * the prefixes → batch appendFrames → delete listed pending dirs →
    * drop intent. A crash after the append is recovered by
    * [[BatchLog.finishCompaction]] at the next batch or compact; a
    * crash DURING the append leaves the index not-ready (rebuild
    * contract); a crash BEFORE the append rolls the intent back under
    * the coverage line instead of deleting un-folded pending state.
    * Pair outputs are untouched — [[pairs]] keeps serving them. */
  def compact(s: SparkSession, outDir: String, indexPath: String): Unit = {
    val lg = log(s, outDir)
    def ready = SignatureIndex.ready(s, indexPath)
    def count = SignatureIndex.shingles(s, indexPath).count()
    lg.finishCompaction(ready, count)
    // a torn APPEND (the previous compact's fold crashed mid-write:
    // index not-ready, intent and pending kept by the recovery above)
    // must be repaired by the index's rebuild contract BEFORE any
    // re-fold — re-appending into an index that already received these
    // rows would duplicate them, and the count coverage would read the
    // doubled rows as "landed" and delete the pending dirs
    if (!ready) { BatchLog.tornIndexWarn(indexPath, "SignatureIndex.build"); return }
    val pending = lg.pendingPrefixes
    if (pending.isEmpty) return
    lg.beginCompaction(pending,
      count + lg.readPending("shingles", pending).count())
    val pb = lg.readPending("bands", pending)
    val ps = lg.readPending("shingles", pending)
    SignatureIndex.appendFrames(s, pb, ps, indexPath)
    lg.finishCompaction(ready, count)
  }
}
