package graft.streaming

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Batch-scoped commit log shared by the streaming near-dup scorers
  * ([[StreamingNearDup]], [[StreamingEmbNearDup]]): per-batch OVERWRITE
  * dirs + a marker created last give exactly-once under foreachBatch's
  * at-least-once replay, and a pending-log area accumulates per-batch
  * corpus-side state (tables named at construction) until an offline
  * compactor folds it into the persisted index.
  *
  * Layout under `outDir`:
  *  - `pairs/<prefix>/`            scored output per batch (kept forever)
  *  - `pending/<table>/<prefix>/`  corpus-side state per batch (until compact)
  *  - `_commits/<prefix>`          marker: the batch is fully committed
  *  - `_compacting`                intent file: prefixes mid-compaction
  *
  * Crash recovery: a torn compact (intent present, index append landed)
  * is completed by [[finishCompaction]] at the next batch or compact; a
  * crash DURING the index append leaves the index not-ready and the
  * index's own rebuild contract applies. Single-writer per outDir. */
private[streaming] object BatchLog {
  private val logger = org.slf4j.LoggerFactory.getLogger(classOf[BatchLog])

  /** Operator signal for the torn-index gate (the r13 advice finding):
    * every compactor's `if (!ready) return` is a deliberate no-op —
    * re-appending into an index that already received the crashed
    * fold's rows would duplicate them — but a SILENT one leaves
    * pending dirs accumulating with no hint of the recovery step.
    * One warning per gate firing, naming the repair entry point. */
  private[streaming] def tornIndexWarn(indexPath: String, repair: String): Unit =
    logger.warn(
      s"torn index at $indexPath: compaction is a no-op until the index " +
        s"is rebuilt (run $repair over the full corpus); pending batch " +
        "state is retained and will fold in after the rebuild")
}

private[streaming] final class BatchLog(s: SparkSession, outDir: String,
    tables: Seq[String]) {

  private val f =
    new Path(outDir).getFileSystem(s.sparkContext.hadoopConfiguration)

  private def markerDir = new Path(outDir, "_commits")
  private def marker(prefix: String) = new Path(markerDir, prefix)
  private def pendingDir(table: String, prefix: String) =
    new Path(s"$outDir/pending/$table/$prefix")
  private def intentFile = new Path(outDir, "_compacting")

  def isCommitted(prefix: String): Boolean = f.exists(marker(prefix))

  def commit(prefix: String): Unit = {
    f.mkdirs(markerDir)
    f.create(marker(prefix), true).close()
  }

  def committedPrefixes: Seq[String] =
    if (!f.exists(markerDir)) Nil
    else f.listStatus(markerDir).map(_.getPath.getName).toSeq.sorted

  /** Committed prefixes whose pending state has NOT been compacted. */
  def pendingPrefixes: Seq[String] =
    committedPrefixes.filter(p => f.exists(pendingDir(tables.head, p)))

  def pairsPath(prefix: String): String = s"$outDir/pairs/$prefix"

  def pendingPath(table: String, prefix: String): String =
    pendingDir(table, prefix).toString

  def readPending(table: String, prefixes: Seq[String]): DataFrame =
    s.read.parquet(prefixes.map(pendingPath(table, _)): _*)

  /** All committed pair outputs (empty with `emptySchema` when none).
    * Pair dirs survive compaction — only pending state is folded. */
  def pairs(emptySchema: org.apache.spark.sql.types.StructType): DataFrame = {
    val committed = committedPrefixes
    if (committed.isEmpty)
      s.createDataFrame(
        s.sparkContext.emptyRDD[org.apache.spark.sql.Row], emptySchema)
    else s.read.parquet(committed.map(pairsPath): _*)
  }

  /** The deterministic token naming one compaction of one pending set —
    * APPEND-style compactors verify by row count, REWRITE-style ones
    * (pool fold; counts can legally shrink) persist this token with the
    * fold and recovery verifies token equality. A rebuild of the index
    * by anyone else never writes it, so a rebuilt-but-never-folded
    * index can't pass for a landed fold. */
  def compactionToken(prefixes: Seq[String]): String = {
    val d = java.security.MessageDigest.getInstance("SHA-256")
      .digest(prefixes.sorted.mkString(",")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    d.take(8).map(b => f"$b%02x").mkString
  }

  /** Record the compaction intent plus its coverage line —
    * `expected` (>= 0) for an append-style fold verified by row count,
    * or `token` for a rewrite-style fold verified by the fold's
    * persisted [[compactionToken]]. Without a coverage line, a crash
    * between this intent and the fold would let the next
    * [[finishCompaction]] delete pending state the index never
    * received (silent loss). */
  def beginCompaction(prefixes: Seq[String], expected: Long = -1L,
      token: String = null): Unit = {
    val out = f.create(intentFile, true)
    val head =
      if (token != null) s"token=$token\n"
      else if (expected >= 0) s"expected=$expected\n"
      else ""
    out.write((head + prefixes.mkString("\n"))
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    out.close()
  }

  /** Complete a (possibly torn) compaction. When the intent carries a
    * coverage line, the pending dirs are deleted ONLY once the index
    * confirms the fold landed:
    *  - index not ready → torn fold; touch nothing (the index's own
    *    rebuild contract applies first, pending state stays recoverable)
    *  - `expected=` line: count >= expected → landed; else the fold
    *    never completed — drop the intent (the compaction un-begins,
    *    pending stays, a later compact retries)
    *  - `token=` line: `foldToken` == token → landed; else un-begin
    * Intents without a coverage line keep the legacy
    * delete-unconditionally behavior. */
  def finishCompaction(indexReady: => Boolean = true,
      indexCount: => Long = Long.MaxValue,
      foldToken: => String = null): Unit = {
    if (!f.exists(intentFile)) return
    val in = f.open(intentFile)
    val lines = scala.io.Source.fromInputStream(in).getLines().toList
    in.close()
    val expected = lines.headOption
      .filter(_.startsWith("expected="))
      .map(_.stripPrefix("expected=").toLong)
    val token = lines.headOption
      .filter(_.startsWith("token="))
      .map(_.stripPrefix("token="))
    val listed =
      if (expected.isDefined || token.isDefined) lines.tail else lines
    val verified =
      if (expected.isEmpty && token.isEmpty) Some(true) // legacy intent
      else if (!indexReady) None // torn fold — defer to rebuild contract
      else Some(expected.forall(indexCount >= _) &&
        token.forall(t => foldToken == t))
    verified match {
      case None => ()
      case Some(false) =>
        f.delete(intentFile, false) // fold never landed; keep pending
      case Some(true) =>
        for (p <- listed; t <- tables) f.delete(pendingDir(t, p), true)
        f.delete(intentFile, false)
    }
    ()
  }
}
