package graft.index

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, TextAnalysis, TrainingCorpus}

/** Persisted FUZZY corpus-assembly state — what the p03 pipeline keeps
  * between ingest batches so a daily delta never re-signs the
  * gate-survivor corpus (the [[CorpusPoolIndex]] design extended with
  * the near-dup stage's state; VERDICT r9 #2):
  *
  *  - `fps/`      (fp, keep_id) — pre-gate min doc_id per fingerprint
  *    over ALL corpus docs (the retraction key, exactly as in
  *    [[CorpusPoolIndex]]).
  *  - `gated/`    (doc_id, source, n_tokens, fp, contam) — exact-dedup
  *    keepers that passed the quality/length gates, WITH their
  *    contamination flag. This is the population the fuzzy pair graph
  *    is formed over; the flag is persisted (not just the post-filter
  *    pool) because a retraction can promote a previously-DROPPED
  *    cluster member to keeper, and its contamination status must be
  *    known without re-exploding corpus text.
  *  - `benchsh/`  (h) — benchmark 5-gram shingle set (decontamination
  *    join's right side).
  *  - `sig/`      — a [[SignatureIndex]] over the gated survivors'
  *    text (bands/shingles/counts): the delta's LSH probes run against
  *    this instead of re-signing the corpus.
  *  - `pairs/`    (doc_a, doc_b) — the verified near-dup pair graph
  *    over gated survivors. Persisted as EDGES, not just clusters,
  *    because exact-dedup retraction REMOVES nodes, and removing a cut
  *    vertex can split a component — a maintenance operation the
  *    cluster frame alone cannot express ([[Dedup.mergeClusters]] only
  *    merges).
  *  - `clusters/` (doc_id, cluster_id) — connected components over
  *    `pairs/` (the keep/drop decision frame).
  *  - `retired/`  (doc_id) — tombstones for gated docs retracted by a
  *    later smaller-id exact duplicate. Their LSH signatures remain in
  *    `sig/` (append-only), so delta probe results are anti-joined
  *    against this set; `pairs/`/`clusters/`/`gated/` are rewritten at
  *    ingest (decision-sized frames), so they never carry retired docs.
  *
  * Every frame is slim (≤5 columns, no text) except `sig/shingles`,
  * which is the same per-survivor hashed-shingle state the d07 index
  * keeps. At 100 TB the incremental joins against them stream the
  * persisted side exactly once (see
  * [[graft.operators.TrainingCorpus.incrementalFuzzyFrames]]).
  *
  * Single-writer per index path; torn-ingest crash contract identical
  * to [[SignatureIndex.append]] (READY marker drops first, re-creates
  * after the last rewrite lands). */
object FuzzyPoolIndex {

  private def fs(s: SparkSession, path: String) =
    new Path(path).getFileSystem(s.sparkContext.hadoopConfiguration)

  private def marker(path: String) = new Path(path, "_FUZZYIDX_READY")

  /** Token of the last streaming-compaction fold this index absorbed
    * (null when none) — the rewrite-style coverage check; see
    * [[CorpusPoolIndex.lastFold]]. */
  def lastFold(s: SparkSession, path: String): String =
    FoldToken.read(s, path)

  def ready(s: SparkSession, path: String): Boolean =
    fs(s, path).exists(marker(path))

  def fps(s: SparkSession, path: String): DataFrame =
    s.read.parquet(s"$path/fps")

  def gated(s: SparkSession, path: String): DataFrame =
    s.read.parquet(s"$path/gated")

  def benchShingles(s: SparkSession, path: String): DataFrame =
    s.read.parquet(s"$path/benchsh")

  def pairs(s: SparkSession, path: String): DataFrame =
    s.read.parquet(s"$path/pairs")

  def clusters(s: SparkSession, path: String): DataFrame =
    s.read.parquet(s"$path/clusters")

  def retired(s: SparkSession, path: String): DataFrame =
    s.read.parquet(s"$path/retired")

  def sigPath(path: String): String = s"$path/sig"

  /** Full build from the corpus and benchmark frames (canonical
    * `doc_id`/`source`/`text` columns). One scored scan feeds the
    * fingerprint table and the gated pool; the gate-survivor text is
    * LSH-signed once, with the hashed-shingle frame SHARED between the
    * signature index and the batch pair graph, and 5-gram-exploded
    * once (the contamination flag).
    *
    * Memory shape (the sf100 OOM lesson): corpus TEXT is never
    * checkpointed — the semi-joined `keptText` stays lazy, so each of
    * its two consumers re-scans source parquet instead of pinning
    * gigabytes of block-manager text; the one corpus-sized pinned
    * frame is the compact hashed-shingle set (spillable), and it is
    * explicitly released once the pair graph lands. */
  def build(corpusDocs: DataFrame, benchmarkDocs: DataFrame,
      path: String): Unit = {
    val s = corpusDocs.sparkSession
    // Rebuild over an ALREADY-ready index must honor the same torn-write
    // contract as ingest/compact: drop READY before the first overwrite,
    // or a crash mid-rebuild leaves ready()==true over half-rewritten
    // frames and the next reader consumes a torn index.
    fs(s, path).delete(marker(path), false)
    FoldToken.clear(s, path) // a rebuilt index contains no fold
    TrainingCorpus.scoredScan(corpusDocs)
      .groupBy(col("fp")).agg(min(col("doc_id")).as("keep_id"))
      .write.mode("overwrite").parquet(s"$path/fps")
    val kept = TrainingCorpus.gatedKeepers(corpusDocs).localCheckpoint(true)
    val keptText = corpusDocs
      .join(kept.select(col("doc_id")), Seq("doc_id"), "left_semi")
    val preSh = graft.core.Caching.snapshot(s)
    val sh = Dedup.hashedShingleSets(keptText)
    val postSh = graft.core.Caching.snapshot(s)
    SignatureIndex.buildFrames(sh, sigPath(path))
    val prs = Dedup.minhashLshFrames(sh)
      .select(col("doc_a"), col("doc_b")).localCheckpoint(true)
    // the shingle blocks are dead once the pair graph lands — release
    // them before the decontamination scan raises the next peak
    graft.core.Caching.releaseBetween(s, preSh, postSh)
    prs.write.mode("overwrite").parquet(s"$path/pairs")
    Dedup.clustersFromPairs(prs)
      .write.mode("overwrite").parquet(s"$path/clusters")
    val contam = TextAnalysis.decontaminate(keptText, benchmarkDocs)
      .select(col("doc_id"), lit(true).as("contam"))
    kept.join(contam, Seq("doc_id"), "left")
      .select(col("doc_id"), col("source"), col("n_tokens"), col("fp"),
        coalesce(col("contam"), lit(false)).as("contam"))
      .write.mode("overwrite").parquet(s"$path/gated")
    TrainingCorpus.benchShingleSet(benchmarkDocs)
      .write.mode("overwrite").parquet(s"$path/benchsh")
    s.range(0).select(col("id").as("doc_id"))
      .write.mode("overwrite").parquet(s"$path/retired")
    fs(s, path).create(marker(path), true).close()
  }

  /** Compact the signature index: re-sign the CURRENT gated pool's
    * text and clear the tombstones. `retired/` grows monotonically
    * under ingest (signatures are append-only, so every retraction
    * leaves a dead band row the probe path must anti-join), and a
    * retired doc that was an over-cap bucket's min severs that
    * bucket's approximate star links — compaction is the documented
    * maintenance that bounds both. `allDocs` is the corpus ∪ every
    * ingested delta (the index stores no text); cadence is an
    * operator choice, e.g. when |retired| crosses a fraction of
    * |gated| — the LSM analogy the reference's tiered compaction
    * already sets (`internal/compaction/manager.go`). Same torn-write
    * marker contract as [[ingest]]. */
  def compact(allDocs: DataFrame, path: String): Unit = {
    val s = allDocs.sparkSession
    val keptText = allDocs.join(
      gated(s, path).select(col("doc_id")), Seq("doc_id"), "left_semi")
    fs(s, path).delete(marker(path), false)
    SignatureIndex.build(keptText, sigPath(path))
    s.range(0).select(col("id").as("doc_id"))
      .write.mode("overwrite").parquet(s"$path/retired")
    fs(s, path).create(marker(path), true).close()
  }

  /** Ingest a delta batch: advance the persisted state so the NEXT
    * batch sees corpus ∪ delta. Text work is delta-proportional (the
    * delta is scored, signed, and 5-gram-exploded once); the
    * gated/pairs/clusters rewrites are decision-frame-proportional;
    * `sig/` takes delta-sized appends; `fps/` re-merges (the
    * [[CorpusPoolIndex.ingest]] cost class).
    *
    * Crash consistency: READY drops before the first rewrite and
    * re-creates after the last — a torn ingest leaves
    * `ready() == false` and the next builder rebuilds. The
    * [[SignatureIndex]] appends run inside that window, so a torn
    * signature append is also covered by the outer marker. */
  def ingest(deltaDocs: DataFrame, path: String): Unit = {
    val s = deltaDocs.sparkSession
    val st = TrainingCorpus.incrementalFuzzyFrames(deltaDocs, path)
    val mergedFps = fps(s, path)
      .join(TrainingCorpus.deltaFpMins(deltaDocs), Seq("fp"), "full_outer")
      .select(col("fp"),
        least(col("keep_id"), col("dmin")).as("keep_id"))
    ingestFrames(s, st.gated, st.pairs, st.clusters, st.retired,
      mergedFps, st.deltaBands, st.deltaShingles, path)
  }

  /** [[ingest]] with the advanced frames already computed — the
    * streaming compactor folds its pending log in without re-scoring
    * ([[graft.streaming.StreamingFuzzyPool.compact]] hands the live
    * decision frames plus the log's accumulated bands/shingles).
    * `deltaBands`/`deltaShingles` must be at most log-sized and
    * materialized or cheap to rescan (the [[SignatureIndex
    * .appendFrames]] contract). Same crash contract as [[ingest]]:
    * READY drops before the first rewrite, re-creates after the
    * last. */
  private[graft] def ingestFrames(s: SparkSession, gatedNew: DataFrame,
      pairsNew: DataFrame, clustersNew: DataFrame, retiredNew: DataFrame,
      mergedFps: DataFrame, deltaBands: DataFrame, deltaShingles: DataFrame,
      path: String, foldToken: String = null): Unit = {
    // every frame below may READ the current index — materialize before
    // any overwrite (Spark cannot overwrite a path its plan still reads)
    val f = mergedFps.localCheckpoint(true)
    val g = gatedNew.localCheckpoint(true)
    val p = pairsNew.localCheckpoint(true)
    val c = clustersNew.localCheckpoint(true)
    val r = retiredNew.localCheckpoint(true)
    fs(s, path).delete(marker(path), false)
    SignatureIndex.appendFrames(s, deltaBands, deltaShingles, sigPath(path))
    f.write.mode("overwrite").parquet(s"$path/fps")
    g.write.mode("overwrite").parquet(s"$path/gated")
    p.write.mode("overwrite").parquet(s"$path/pairs")
    c.write.mode("overwrite").parquet(s"$path/clusters")
    r.write.mode("overwrite").parquet(s"$path/retired")
    FoldToken.write(s, path, foldToken)
    fs(s, path).create(marker(path), true).close()
  }
}
