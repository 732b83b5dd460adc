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

  /** Record the compaction intent. `expected` (when >= 0) is the index
    * row count the fold must reach before the listed pending dirs may
    * be deleted — [[finishCompaction]]'s coverage check. Without it, a
    * crash between this intent and the index append would let the next
    * [[finishCompaction]] delete pending state the index never
    * received (silent signature loss). */
  def beginCompaction(prefixes: Seq[String], expected: Long = -1L): Unit = {
    val out = f.create(intentFile, true)
    val head = if (expected >= 0) s"expected=$expected\n" else ""
    out.write((head + prefixes.mkString("\n"))
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    out.close()
  }

  /** Complete a (possibly torn) compaction. When the intent carries an
    * `expected=` coverage line, the pending dirs are deleted ONLY once
    * `indexCount` confirms the fold landed:
    *  - index not ready → torn append; touch nothing (the index's own
    *    rebuild contract applies first, pending state stays recoverable)
    *  - count >= expected → the append landed; delete pending + intent
    *  - count < expected → the append never completed; drop the intent
    *    (the compaction un-begins — pending stays, a later compact
    *    retries) so the sigs are never silently lost.
    * Intents without the coverage line keep the legacy
    * delete-unconditionally behavior (callers that verify by other
    * means). */
  def finishCompaction(indexReady: => Boolean = true,
      indexCount: => Long = Long.MaxValue): Unit = {
    if (!f.exists(intentFile)) return
    val in = f.open(intentFile)
    val lines = scala.io.Source.fromInputStream(in).getLines().toList
    in.close()
    val expected = lines.headOption
      .filter(_.startsWith("expected="))
      .map(_.stripPrefix("expected=").toLong)
    val listed = if (expected.isDefined) lines.tail else lines
    expected match {
      case Some(_) if !indexReady =>
        () // torn append — defer to the index's rebuild contract
      case Some(exp) if indexCount < exp =>
        f.delete(intentFile, false) // fold never landed; keep pending
      case _ =>
        for (p <- listed; t <- tables) f.delete(pendingDir(t, p), true)
        f.delete(intentFile, false)
    }
    ()
  }
}
