package graft.index

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.SparkSession

/** Persistence of the streaming-compaction fold token shared by the
  * REWRITE-style pool indexes ([[CorpusPoolIndex]], [[FuzzyPoolIndex]]).
  * Pool counts can legally SHRINK across a fold (retraction), so the
  * [[graft.streaming.BatchLog.finishCompaction]] coverage check
  * verifies fold IDENTITY, not row counts: the fold persists the
  * intent's token here, and recovery deletes pending state only when
  * the persisted token matches. One implementation, not one per index —
  * a divergence in trim/encoding semantics between the two pools would
  * silently split their recovery behavior. */
private[index] object FoldToken {

  private def file(path: String) = new Path(path, "_LAST_FOLD")

  private def fs(s: SparkSession, path: String) =
    new Path(path).getFileSystem(s.sparkContext.hadoopConfiguration)

  /** Token of the last fold this index absorbed; null when none. */
  def read(s: SparkSession, path: String): String = {
    val f = fs(s, path)
    if (!f.exists(file(path))) null
    else {
      val in = f.open(file(path))
      try scala.io.Source.fromInputStream(in).mkString.trim finally in.close()
    }
  }

  /** Persist `token` (no-op when null — a non-streaming rewrite). */
  def write(s: SparkSession, path: String, token: String): Unit =
    if (token != null) {
      val out = fs(s, path).create(file(path), true)
      out.write(token.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      out.close()
    }

  /** Remove a stale token — a full REBUILD must not advertise a fold
    * it no longer contains (prefix-derived tokens never repeat within
    * a stream, so this is hygiene, not a correctness hole). */
  def clear(s: SparkSession, path: String): Unit = {
    fs(s, path).delete(file(path), false)
    ()
  }
}
