package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.index.{FuzzyPoolIndex, SignatureIndex}
import graft.operators.{Dedup, TrainingCorpus}

/** Continuous FUZZY corpus-pool maintenance: Structured Streaming over
  * a document source, each micro-batch gated / exact-deduped /
  * decontaminated / LSH-SCORED against the persisted fuzzy assembly
  * state ([[graft.index.FuzzyPoolIndex]]) — the streaming form of the
  * p04 daily-ingest story, completing the streaming family
  * ([[StreamingNearDup]] scores pairs, [[StreamingCorpusPool]]
  * maintains the exact pool; this maintains the pool WITH the
  * near-dup stage).
  *
  * Contract — frozen-index scoring with bounded staleness:
  *
  *  - batch N commits DELTA-SIZED state only: its gate-survivor
  *    additions (with contamination flags), pre-gate fp-mins, LSH
  *    bands/shingles, and the verified near-dup pairs touching it vs
  *    (index corpus ∪ batches 1..N) — the [[StreamingNearDup]]
  *    frozen-index probe with the pending log unioned onto the corpus
  *    side. Acceptances are PROVISIONAL (a later batch carrying a
  *    smaller-id exact duplicate retracts them; no streaming system
  *    can finalize a global min early), and pair rows may touch docs
  *    later retracted — retraction is resolved at READ time.
  *  - the INDEX is never mutated by the stream. [[pool]] folds the
  *    pending log into the live decision frames via
  *    [[TrainingCorpus.foldFuzzyDecisions]] — the SAME fold the batch
  *    ingest runs, handed the union of pending batches: live pending
  *    additions, undercut additions as extra retractions, global
  *    pending pre-gate mins, and the pending pair log. By
  *    construction it equals the batch recompute
  *    `fuzzyCleanPool(corpus ∪ batches, benchmark)`.
  *  - [[compact]] persists exactly that fold through
  *    [[FuzzyPoolIndex.ingestFrames]] (offline, single-writer), with
  *    the log's accumulated bands/shingles appended to the signature
  *    index — no re-scoring, no re-signing. The staleness bound is
  *    the compaction cadence, and [[FuzzyPoolIndex.compact]] remains
  *    the deeper maintenance that clears tombstones.
  *
  * Exactly-once under foreachBatch's at-least-once replay: the
  * [[BatchLog]] protocol (batch-scoped OVERWRITE dirs, marker last,
  * replay of a marked batch is a no-op; a replayed batch excludes its
  * own prefix from the pending set it scores against, so the
  * recompute sees exactly what the first attempt saw).
  * Single-writer per outDir. */
object StreamingFuzzyPool {

  private val PendingTables =
    Seq("adds", "fpmins", "bands", "shingles", "newpairs")

  private def log(s: SparkSession, outDir: String) =
    new BatchLog(s, outDir, PendingTables)

  private def streamId(checkpoint: String): String = {
    val d = java.security.MessageDigest.getInstance("SHA-256")
      .digest(checkpoint.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    "s" + d.take(8).map(b => f"$b%02x").mkString
  }

  /** The accept-and-score plan for one batch vs (index ∪ pending log
    * minus `excludePrefix`). Returns (additions w/ contam flag,
    * pre-gate fp-mins, bands, shingles, new pairs). */
  private def scorePlan(batch: DataFrame, indexPath: String, lg: BatchLog,
      excludePrefix: String)
      : (DataFrame, DataFrame, DataFrame, DataFrame, DataFrame) = {
    val s = batch.sparkSession
    val docs = batch.select(col("doc_id"), col("source"), col("text"))
    val pending = lg.pendingPrefixes.filterNot(_ == excludePrefix)

    // exact-dedup + gates + contamination vs index fps ∪ pending mins
    val idxFps = FuzzyPoolIndex.fps(s, indexPath)
    val extFps =
      if (pending.isEmpty) idxFps
      else idxFps.unionByName(lg.readPending("fpmins", pending)
        .withColumnRenamed("dmin", "keep_id"))
    val (kept, contamIds, deltaFps, _) = TrainingCorpus.deltaGatedFp(
      docs, extFps, FuzzyPoolIndex.benchShingles(s, indexPath))
    val adds = kept
      .join(contamIds.withColumn("contam", lit(true)), Seq("doc_id"), "left")
      .select(col("doc_id"), col("source"), col("n_tokens"), col("fp"),
        coalesce(col("contam"), lit(false)).as("contam"))

    // LSH probe vs index signature state ∪ pending batches (the
    // StreamingNearDup corpus-side union, verbatim); pairs touching
    // the index's frozen tombstones are dropped here, pairs touching
    // docs retracted by LATER batches at read time
    val deltaSh = Dedup.hashedShingleSets(
      docs.join(adds.select(col("doc_id")), Seq("doc_id"), "left_semi"))
    val deltaBands = Dedup.bandedSignatures(deltaSh).localCheckpoint(true)
    val sp = FuzzyPoolIndex.sigPath(indexPath)
    val (corpusBands, corpusSh, corpusCounts) =
      if (pending.isEmpty)
        (SignatureIndex.bands(s, sp), SignatureIndex.shingles(s, sp),
          SignatureIndex.counts(s, sp))
      else {
        val pb = lg.readPending("bands", pending)
        val ps = lg.readPending("shingles", pending)
        val pc = pb.groupBy(col("band"), col("bh"))
          .agg(count(lit(1)).as("n"), min(col("doc_id")).as("min_doc"))
        (SignatureIndex.bands(s, sp).unionByName(pb),
          SignatureIndex.shingles(s, sp).unionByName(ps),
          SignatureIndex.counts(s, sp).unionByName(pc))
      }
    val retiredIdx = FuzzyPoolIndex.retired(s, indexPath)
      .localCheckpoint(true)
    val nRet = retiredIdx.count()
    def notRetired(df: DataFrame, side: String): DataFrame =
      df.join(Dedup.bcastIf(8, nRet)(
        retiredIdx.withColumnRenamed("doc_id", side)), Seq(side), "left_anti")
    val newPairs = notRetired(notRetired(
      Dedup.incrementalPairsFrames(deltaSh, deltaBands,
          corpusBands, corpusSh, corpusCounts)
        .select(col("doc_a"), col("doc_b")), "doc_a"), "doc_b")
    (adds, deltaFps, deltaBands, deltaSh, newPairs)
  }

  /** Accept one micro-batch and commit its outputs. Exposed for the
    * replay-idempotence spec; the stream calls it from foreachBatch. */
  private[streaming] def processBatch(batch: DataFrame, sid: String,
      batchId: Long, indexPath: String, outDir: String): Unit = {
    val s = batch.sparkSession
    val lg = log(s, outDir)
    val prefix = s"$sid-b$batchId"
    if (lg.isCommitted(prefix)) return // replay of a fully committed batch
    // torn compact: complete (or roll back) under the fold-token check
    lg.finishCompaction(FuzzyPoolIndex.ready(s, indexPath),
      foldToken = FuzzyPoolIndex.lastFold(s, indexPath))
    val (adds, deltaFps, deltaBands, deltaSh, newPairs) =
      scorePlan(batch, indexPath, lg, prefix)
    val a = adds.localCheckpoint(true)
    // batch-scoped OVERWRITE dirs: a replayed crash recomputes the same
    // content (same pending set — markers gate what a replay can see)
    a.write.mode("overwrite").parquet(lg.pairsPath(prefix))
    a.write.mode("overwrite").parquet(lg.pendingPath("adds", prefix))
    deltaFps.write.mode("overwrite").parquet(lg.pendingPath("fpmins", prefix))
    deltaBands.write.mode("overwrite").parquet(lg.pendingPath("bands", prefix))
    deltaSh.write.mode("overwrite").parquet(lg.pendingPath("shingles", prefix))
    newPairs.write.mode("overwrite")
      .parquet(lg.pendingPath("newpairs", prefix))
    lg.commit(prefix)
  }

  /** The LIVE decision frames: index frames + every pending batch,
    * folded by the batch path's own
    * [[TrainingCorpus.foldFuzzyDecisions]]. A pending addition is live
    * while it still IS the pending min for its fingerprint; an
    * addition undercut by a later batch joins the retraction set, so
    * its pairs drop and its cluster (if any) re-keys — the same
    * split-capable maintenance the p04 ingest runs. */
  private def liveDecisions(s: SparkSession, outDir: String,
      indexPath: String): TrainingCorpus.FuzzyDecisions = {
    val lg = log(s, outDir)
    val pending = lg.pendingPrefixes
    val idxGated = FuzzyPoolIndex.gated(s, indexPath)
    val idxPairs = FuzzyPoolIndex.pairs(s, indexPath)
    val idxClusters = FuzzyPoolIndex.clusters(s, indexPath)
    val idxRetired = FuzzyPoolIndex.retired(s, indexPath)
    if (pending.isEmpty)
      return TrainingCorpus.FuzzyDecisions(
        idxGated, idxPairs, idxClusters, idxRetired)
    val pendAdds = lg.readPending("adds", pending)
    val pendMins = lg.readPending("fpmins", pending)
      .groupBy(col("fp")).agg(min(col("dmin")).as("dmin"))
      .localCheckpoint(true)
    val nMins = pendMins.count()
    val flagged = pendAdds
      .join(Dedup.bcastIf(48, nMins)(pendMins), Seq("fp"))
      .localCheckpoint(true)
    val liveAdds = flagged.filter(col("dmin") === col("doc_id"))
      .drop(col("dmin"))
    val undercut = flagged.filter(col("dmin") =!= col("doc_id"))
      .select(col("doc_id"))
    TrainingCorpus.foldFuzzyDecisions(
      idxGated, idxPairs, idxClusters, idxRetired,
      liveAdds, undercut, pendMins, nMins,
      lg.readPending("newpairs", pending))
  }

  /** The LIVE fuzzy survivor pool — (doc_id, source, n_tokens): by
    * construction equals the batch recompute
    * `fuzzyCleanPool(corpus ∪ batches, benchmark)`. */
  def pool(s: SparkSession, outDir: String, indexPath: String): DataFrame = {
    val d = liveDecisions(s, outDir, indexPath)
    val dropIds = d.clusters
      .filter(col("doc_id") =!= col("cluster_id")).select(col("doc_id"))
    d.gated.filter(!col("contam"))
      .join(dropIds, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("source"), col("n_tokens"))
  }

  /** The live pool through the global mixture/packing stages — equals
    * `assembleFuzzy(corpus ∪ batches, benchmark)` (p03's oracle). */
  def assembleLive(s: SparkSession, outDir: String,
      indexPath: String): DataFrame =
    TrainingCorpus.mixAndPack(
      pool(s, outDir, indexPath).localCheckpoint(true),
      graft.operators.Mixture.DefaultTargetPct,
      graft.operators.Packing.DefaultBudget)

  /** Scaling-ladder binding (sn04): the cost of accepting-and-scoring
    * ONE streaming micro-batch — half the p04 delta (1/6 of the train
    * split) — with the other half already committed in the pending
    * log. Reuses p04's content-keyed fuzzy index (same corpus slice,
    * same tag — the stream never mutates it); first attempt pays the
    * one-time index build + batch-0 commit, the second measures the
    * warm per-batch cost (the sn01/sn03 best-of-2 precedent). */
  def benchScore(s: SparkSession, dir: String): DataFrame = {
    val docs = graft.core.Tables.load(s, dir, "documents")
      .select(col("doc_id"), col("source"), col("text"))
    val train = docs.filter(col("doc_id") % 23 =!= 0)
    val bench = docs.filter(col("doc_id") % 23 === 0)
    val isDelta = col("doc_id") % 3 === 0
    val idxPath = graft.index.IndexCache.pathFor(
      s, s"$dir/documents.parquet", "fuzzypool-mod=3")
    if (!FuzzyPoolIndex.ready(s, idxPath))
      FuzzyPoolIndex.build(train.filter(!isDelta), bench, idxPath)
    val logDir = graft.index.IndexCache.pathFor(
      s, s"$dir/documents.parquet", "sfp-log")
    val lg = log(s, logDir)
    if (!lg.isCommitted("bench-b0"))
      processBatch(train.filter(isDelta && col("doc_id") % 2 === 0),
        "bench", 0L, idxPath, logDir)
    scorePlan(train.filter(isDelta && col("doc_id") % 2 =!= 0),
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
    require(FuzzyPoolIndex.ready(spark, indexPath),
      s"fuzzy pool index at $indexPath is not ready — build it first")
    val sid = streamId(checkpoint)
    spark.readStream
      .schema(schema)
      .options(options)
      .json(sourceDir)
      .writeStream
      .queryName("fuzzy-pool")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) processBatch(batch, sid, batchId, indexPath, outDir)
        ()
      }
      .start()
  }

  /** Fold the pending log into the index (single-writer; stream must
    * be stopped or between batches). Persists exactly the live
    * decision frames plus the merged fp-mins, with the log's
    * bands/shingles appended to the signature index — no re-scoring.
    * Protocol: intent file → [[FuzzyPoolIndex.ingestFrames]]
    * (marker-guarded rewrite) → delete listed pending dirs → drop
    * intent; a crash between the rewrite and the deletes is completed
    * by [[BatchLog.finishCompaction]] at the next batch; a crash
    * DURING the rewrite leaves the index not-ready (rebuild
    * contract). */
  def compact(s: SparkSession, outDir: String, indexPath: String): Unit = {
    val lg = log(s, outDir)
    def ready = FuzzyPoolIndex.ready(s, indexPath)
    def fold = FuzzyPoolIndex.lastFold(s, indexPath)
    lg.finishCompaction(ready, foldToken = fold)
    // torn rewrite from a crashed fold: rebuild contract first, never
    // re-fold from torn frames (see StreamingCorpusPool.compact)
    if (!ready) { BatchLog.tornIndexWarn(indexPath, "FuzzyPoolIndex.build"); return }
    val pending = lg.pendingPrefixes
    if (pending.isEmpty) return
    val d = liveDecisions(s, outDir, indexPath)
    val mergedFps = FuzzyPoolIndex.fps(s, indexPath)
      .unionByName(lg.readPending("fpmins", pending)
        .withColumnRenamed("dmin", "keep_id"))
      .groupBy(col("fp")).agg(min(col("keep_id")).as("keep_id"))
    // rewrite-style fold (retraction can shrink every frame): the
    // intent's coverage is the fold TOKEN the rewrite persists
    val token = lg.compactionToken(pending)
    lg.beginCompaction(pending, token = token)
    FuzzyPoolIndex.ingestFrames(s, d.gated, d.pairs, d.clusters, d.retired,
      mergedFps, lg.readPending("bands", pending),
      lg.readPending("shingles", pending), indexPath, token)
    lg.finishCompaction(ready, foldToken = fold)
  }
}
