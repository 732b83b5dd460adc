package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.index.CorpusPoolIndex
import graft.operators.{Dedup, TrainingCorpus}

/** Continuous corpus-pool maintenance: Structured Streaming over a
  * document source, each micro-batch gated / exact-deduped /
  * decontaminated against the persisted assembly state
  * ([[graft.index.CorpusPoolIndex]]) — the streaming form of the p02
  * daily-ingest story, and the assembly-pipeline sibling of
  * [[StreamingNearDup]] (same [[BatchLog]] protocol).
  *
  * Contract — frozen-index scoring with bounded staleness:
  *
  *  - batch N's ACCEPTED additions are the delta docs that survive the
  *    quality/length gates, the combined min-id dedup rule vs
  *    (index corpus ∪ batches 1..N), and 5-gram decontamination
  *    against the index's benchmark shingle set. An acceptance is
  *    PROVISIONAL: a later batch carrying a smaller-id duplicate
  *    retracts it (exact dedup is a global property; no streaming
  *    system can finalize it early). The live pool at any moment —
  *    [[pool]] — applies every committed batch's pre-gate
  *    per-fingerprint mins to (index pool ∪ pending additions), and
  *    by construction equals the batch recompute
  *    `TrainingCorpus.cleanPool(corpus ∪ batches, benchmark)`.
  *  - the INDEX is never mutated by the stream. Committed batches
  *    accumulate additions + pre-gate fp-mins in the pending log;
  *    [[compact]] folds them into the index via
  *    [[CorpusPoolIndex.writeVersion]] (offline, single-writer — the
  *    staleness bound: run it daily and the log never exceeds a day).
  *
  * Per-batch cost is BATCH-proportional in text (one scored scan +
  * survivor-pruned shingle explode) plus slim-frame joins against the
  * index (streamed, never shuffled — see
  * [[TrainingCorpus.deltaSurvivorsFp]]); the pending fp-min frames it
  * unions in are log-sized. Exactly-once under foreachBatch's
  * at-least-once replay: the [[BatchLog]] protocol (batch-scoped
  * OVERWRITE dirs, marker last, replay of a marked batch is a no-op).
  * Single-writer per outDir. */
object StreamingCorpusPool {

  private val PendingTables = Seq("adds", "fpmins")

  private def log(s: SparkSession, outDir: String) =
    new BatchLog(s, outDir, PendingTables)

  private def streamId(checkpoint: String): String = {
    val d = java.security.MessageDigest.getInstance("SHA-256")
      .digest(checkpoint.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    "s" + d.take(8).map(b => f"$b%02x").mkString
  }

  /** The accept plan for one batch: additions + pre-gate fp-mins vs
    * (index ∪ pending log minus `excludePrefix`). */
  private def acceptPlan(batch: DataFrame, indexPath: String, lg: BatchLog,
      excludePrefix: String): (DataFrame, DataFrame) = {
    val s = batch.sparkSession
    val docs = batch.select(col("doc_id"), col("source"), col("text"))
    val pending = lg.pendingPrefixes.filterNot(_ == excludePrefix)
    val idxFps = CorpusPoolIndex.fps(s, indexPath)
    val extFps =
      if (pending.isEmpty) idxFps
      else idxFps.unionByName(lg.readPending("fpmins", pending)
        .withColumnRenamed("dmin", "keep_id"))
    val (additions, deltaFps, _) = TrainingCorpus.deltaSurvivorsFp(
      docs, extFps, CorpusPoolIndex.benchShingles(s, indexPath))
    (additions, deltaFps)
  }

  /** Accept one micro-batch and commit its outputs. Exposed for the
    * replay-idempotence spec; the stream calls it from foreachBatch. */
  private[streaming] def processBatch(batch: DataFrame, sid: String,
      batchId: Long, indexPath: String, outDir: String): Unit = {
    val s = batch.sparkSession
    val lg = log(s, outDir)
    val prefix = s"$sid-b$batchId"
    if (lg.isCommitted(prefix)) return // replay of a fully committed batch
    // torn compact: complete (or roll back) under the fold-token check —
    // a compact that crashed before its pool rewrite must NOT have its
    // pending dirs deleted (see BatchLog.finishCompaction)
    lg.finishCompaction(CorpusPoolIndex.ready(s, indexPath),
      foldToken = CorpusPoolIndex.lastFold(s, indexPath))
    val (additions, deltaFps) = acceptPlan(batch, indexPath, lg, prefix)
    val adds = additions.localCheckpoint(true)
    // batch-scoped OVERWRITE dirs: a replayed crash recomputes the same
    // content (same pending set — markers gate what a replay can see)
    adds.write.mode("overwrite").parquet(lg.pairsPath(prefix))
    adds.write.mode("overwrite").parquet(lg.pendingPath("adds", prefix))
    deltaFps.write.mode("overwrite").parquet(lg.pendingPath("fpmins", prefix))
    lg.commit(prefix)
  }

  /** The LIVE clean pool — (doc_id, source, n_tokens, fp): the index
    * pool plus every pending batch's additions, with the committed
    * batches' pre-gate fp-mins applied as retractions. An index row is
    * live while no pending min undercuts it; a pending addition is
    * live while it still IS the pending min for its fingerprint (its
    * own batch contributed exactly its id). Pending mins are log-sized
    * and broadcast; neither the index pool nor the additions shuffle. */
  def pool(s: SparkSession, outDir: String, indexPath: String): DataFrame = {
    val lg = log(s, outDir)
    val pending = lg.pendingPrefixes
    val basePool = CorpusPoolIndex.pool(s, indexPath)
    if (pending.isEmpty) basePool
    else {
      val pendMins = lg.readPending("fpmins", pending)
        .groupBy(col("fp")).agg(min(col("dmin")).as("pmin"))
        .localCheckpoint(true)
      val nPend = pendMins.count()
      val candidates = basePool.withColumn("from_idx", lit(true))
        .unionByName(lg.readPending("adds", pending)
          .withColumn("from_idx", lit(false)))
      candidates
        .join(Dedup.bcastIf(48, nPend)(pendMins), Seq("fp"), "left_outer")
        .filter(
          (col("from_idx") &&
            (col("pmin").isNull || col("pmin") > col("doc_id"))) ||
          (!col("from_idx") && col("pmin") === col("doc_id")))
        .select(col("doc_id"), col("source"), col("n_tokens"), col("fp"))
    }
  }

  /** Scaling-ladder binding (sn03): the cost of accepting ONE
    * streaming micro-batch — half the p02 delta (1/6 of the train
    * split) — with the other half already committed in the pending
    * log. Reuses p02's content-keyed index (same corpus slice, same
    * tag); first attempt pays the one-time index build + batch-0
    * commit, the second measures the warm per-batch cost (the sn01
    * best-of-2 precedent). */
  def benchScore(s: SparkSession, dir: String): DataFrame = {
    val docs = graft.core.Tables.load(s, dir, "documents")
      .select(col("doc_id"), col("source"), col("text"))
    val train = docs.filter(col("doc_id") % 23 =!= 0)
    val bench = docs.filter(col("doc_id") % 23 === 0)
    val isDelta = col("doc_id") % 3 === 0
    val idxPath = graft.index.IndexCache.pathFor(
      s, s"$dir/documents.parquet", "pool-mod=3")
    if (!CorpusPoolIndex.ready(s, idxPath))
      CorpusPoolIndex.build(train.filter(!isDelta), bench, idxPath)
    val logDir = graft.index.IndexCache.pathFor(
      s, s"$dir/documents.parquet", "scp-log")
    val lg = log(s, logDir)
    if (!lg.isCommitted("bench-b0"))
      processBatch(train.filter(isDelta && col("doc_id") % 2 === 0),
        "bench", 0L, idxPath, logDir)
    acceptPlan(train.filter(isDelta && col("doc_id") % 2 =!= 0),
      idxPath, lg, "")._1
  }

  /** Start the maintainer on a newline-JSON document source (canonical
    * doc_id/source/text fields). Use `maxFilesPerTrigger` via
    * `options` to bound batch size. */
  def start(
      spark: SparkSession,
      sourceDir: String,
      schema: StructType,
      indexPath: String,
      outDir: String,
      checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow(),
      options: Map[String, String] = Map.empty): StreamingQuery = {
    require(CorpusPoolIndex.ready(spark, indexPath),
      s"corpus pool index at $indexPath is not ready — build it first")
    val sid = streamId(checkpoint)
    spark.readStream
      .schema(schema)
      .options(options)
      .json(sourceDir)
      .writeStream
      .queryName("corpus-pool")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) processBatch(batch, sid, batchId, indexPath, outDir)
        ()
      }
      .start()
  }

  /** Fold the pending log into the index (single-writer; stream must
    * be stopped or between batches). The folded pool is exactly
    * [[pool]]'s live view; fps merges every pending batch's pre-gate
    * mins. Protocol: intent file → [[CorpusPoolIndex.writeVersion]]
    * (marker-guarded rewrite) → delete listed pending dirs → drop
    * intent; a crash between the version write and the deletes is
    * completed by [[BatchLog.finishCompaction]] at the next batch. */
  def compact(s: SparkSession, outDir: String, indexPath: String): Unit = {
    val lg = log(s, outDir)
    def ready = CorpusPoolIndex.ready(s, indexPath)
    def fold = CorpusPoolIndex.lastFold(s, indexPath)
    lg.finishCompaction(ready, foldToken = fold)
    // a torn REWRITE (the previous fold crashed mid-overwrite: index
    // not-ready, intent and pending kept by the recovery above) must
    // be repaired by the index's rebuild contract BEFORE any re-fold —
    // the fold below READS the index, and a fold computed from torn
    // frames would persist corruption under a valid token
    if (!ready) { BatchLog.tornIndexWarn(indexPath, "CorpusPoolIndex.build"); return }
    val pending = lg.pendingPrefixes
    if (pending.isEmpty) return
    val newPool = pool(s, outDir, indexPath)
    val newFps = CorpusPoolIndex.fps(s, indexPath)
      .unionByName(lg.readPending("fpmins", pending)
        .withColumnRenamed("dmin", "keep_id"))
      .groupBy(col("fp")).agg(min(col("keep_id")).as("keep_id"))
    // rewrite-style fold: pool counts can legally shrink (retraction),
    // so the intent's coverage is the fold TOKEN the rewrite persists
    val token = lg.compactionToken(pending)
    lg.beginCompaction(pending, token = token)
    CorpusPoolIndex.writeVersion(s, newPool, newFps, indexPath, token)
    lg.finishCompaction(ready, foldToken = fold)
  }
}
