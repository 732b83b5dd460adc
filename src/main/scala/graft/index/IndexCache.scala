package graft.index

import org.apache.spark.sql.SparkSession

/** Content-addressed tmp paths for derived per-corpus indexes (the
  * signature/BM25 index caches the driver bindings build once per
  * corpus and reuse across queries).
  *
  * The key hashes the source path PLUS a content fingerprint of its
  * files (name/length/mtime): regenerated data at the same path gets a
  * fresh index instead of silently reusing a stale one, and a
  * marker-guarded build races only between processes reading identical
  * source data (where both builds write identical content). At cluster
  * scale the same keying applies to a durable index root instead of
  * tmpdir. */
object IndexCache {

  /** Fingerprint of every file under `srcPath` (name:length:mtime,
    * sorted) — "absent" when the path does not exist. */
  def fingerprint(s: SparkSession, srcPath: String): String = {
    val src = new org.apache.hadoop.fs.Path(srcPath)
    val fs = src.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(src)) "absent"
    else {
      val it = fs.listFiles(src, true)
      val parts = scala.collection.mutable.ArrayBuffer[String]()
      while (it.hasNext) {
        val f = it.next()
        parts += s"${f.getPath.getName}:${f.getLen}:${f.getModificationTime}"
      }
      parts.sorted.mkString("|")
    }
  }

  /** Cache path under java.io.tmpdir keyed by (source content, tag) —
    * `tag` separates indexes of different shapes or corpus slices built
    * from the same files (e.g. the mod-split corpora). */
  def pathFor(s: SparkSession, srcPath: String, tag: String): String = {
    val key = java.security.MessageDigest.getInstance("SHA-256")
      .digest(s"$srcPath|${fingerprint(s, srcPath)}|$tag".getBytes("UTF-8"))
      .take(8).map(b => f"$b%02x").mkString
    s"${System.getProperty("java.io.tmpdir")}/graft-idx-$key"
  }
}
