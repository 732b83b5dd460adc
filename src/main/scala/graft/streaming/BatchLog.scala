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

  def beginCompaction(prefixes: Seq[String]): Unit = {
    val out = f.create(intentFile, true)
    out.write(prefixes.mkString("\n")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    out.close()
  }

  /** Complete a (possibly torn) compaction's pending-dir deletes. */
  def finishCompaction(): Unit = {
    if (!f.exists(intentFile)) return
    val in = f.open(intentFile)
    val listed = scala.io.Source.fromInputStream(in).getLines().toList
    in.close()
    for (p <- listed; t <- tables) f.delete(pendingDir(t, p), true)
    f.delete(intentFile, false)
  }
}
