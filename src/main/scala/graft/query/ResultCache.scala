package graft.query

import java.security.MessageDigest

/** Keyed query-result cache with table-version invalidation.
  *
  * Mirrors the reference's Redis result cache semantics
  * (`internal/query/query_cache.go:226-412`): key = normalized SQL hash +
  * sorted table list; invalidation by table on write/update/delete. Here
  * invalidation is by table *version* captured at insert time — a hit is
  * only valid if every referenced table's version is unchanged, so
  * writers don't need to enumerate cache entries. LRU bounded by entry
  * count + total bytes (reference: 100 MB local accounting). */
class ResultCache(maxEntries: Int = 1024, maxBytes: Long = 100L << 20) {

  final case class Entry(value: String, tableVersions: Map[String, Long], bytes: Long)

  private val lru = new java.util.LinkedHashMap[String, Entry](64, 0.75f, true)
  private var totalBytes = 0L
  private var hitCount = 0L
  private var missCount = 0L

  /** Normalize SQL for keying: trim only. Lowercasing or whitespace-
    * collapsing the whole string (as the reference does,
    * `query_cache.go:412-465`) would conflate queries whose string
    * LITERALS differ only by case/whitespace and serve wrong results —
    * a false miss is cheap, a false hit is a correctness bug. */
  def normalize(sql: String): String = sql.trim

  def key(sql: String, tables: Seq[String]): String = {
    val md = MessageDigest.getInstance("SHA-256")
    val raw = normalize(sql) + "|" + tables.sorted.mkString(",")
    md.digest(raw.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  def get(k: String, currentVersions: Map[String, Long]): Option[String] = synchronized {
    Option(lru.get(k)) match {
      case Some(e) if e.tableVersions.forall { case (t, v) => currentVersions.getOrElse(t, -1L) == v } =>
        hitCount += 1; Some(e.value)
      case Some(_) => // stale: some table moved on
        remove(k); missCount += 1; None
      case None => missCount += 1; None
    }
  }

  def put(k: String, value: String, tableVersions: Map[String, Long]): Unit = synchronized {
    val bytes = value.length.toLong * 2
    if (bytes > maxBytes) return
    remove(k)
    lru.put(k, Entry(value, tableVersions, bytes))
    totalBytes += bytes
    val it = lru.entrySet().iterator()
    while ((lru.size() > maxEntries || totalBytes > maxBytes) && it.hasNext) {
      val e = it.next(); totalBytes -= e.getValue.bytes; it.remove()
    }
  }

  private def remove(k: String): Unit =
    Option(lru.remove(k)).foreach(e => totalBytes -= e.bytes)

  def stats: (Long, Long, Int, Long) = synchronized { (hitCount, missCount, lru.size(), totalBytes) }

  def clear(): Unit = synchronized { lru.clear(); totalBytes = 0 }
}
