package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

import graft.catalog.TableStore

/** Parquet-backed CDC event log, shared by every event producer.
  *
  * The reference publishes INSERT/UPDATE/DELETE/BATCH events to Redis
  * Streams / Kafka with consumer groups (`internal/subscription/
  * event.go:12-98`, `manager.go:157-225`); here the log is a directory
  * of per-emission parquet dirs under `<root>/_cdc/<table>` — a Kafka
  * sink would swap in `format("kafka")` at the write sites. Streaming
  * ingest appends INSERT/BATCH per micro-batch (replay-idempotent:
  * batch-scoped dir + overwrite); mutations append UPDATE/DELETE here.
  * One schema for all producers so the consumer-side read is a single
  * union-free scan. */
object CdcLog {

  val Schema: StructType = StructType(Seq(
    StructField("op", StringType, nullable = false),
    StructField("id", StringType, nullable = true),
    StructField("timestamp", TimestampType, nullable = true),
    StructField("batch_id", LongType, nullable = false),
    StructField("emitted_at", TimestampType, nullable = false)))

  def path(store: TableStore, table: String): String = s"${store.root}/_cdc/$table"

  /** Timestamp ↔ epoch-micros round-trip — ONE implementation, because
    * the consumer's cursor-boundary correctness depends on it exactly. */
  def toMicros(t: Timestamp): Long =
    (t.getTime / 1000L) * 1000000L + t.getNanos / 1000L
  def fromMicros(micros: Long): Timestamp = {
    val t = new Timestamp(micros / 1000L)
    t.setNanos(((micros % 1000000L) * 1000L).toInt)
    t
  }

  // Strictly-increasing emitted_at in MICROseconds: two emissions in the
  // same wall-clock millisecond must not share a timestamp, or a consumer
  // committing between them would drop the second one at its strict-'>'
  // cursor (micros survive parquet TimestampType exactly). EVERY event
  // producer must stamp through this clock — mixing in another clock
  // (e.g. current_timestamp()) re-opens the cursor-straddle hole.
  private val lastMicros = new java.util.concurrent.atomic.AtomicLong(0)
  private[streaming] def nextEmittedAt(): Timestamp = {
    val micros = lastMicros.updateAndGet { prev =>
      math.max(System.currentTimeMillis() * 1000L, prev + 1)
    }
    fromMicros(micros)
  }

  /** Append one event per (id, timestamp) with operation `op`.
    * Each emission lands in its own `mut-<uuid>` dir (no '=' in the
    * name, so partition discovery doesn't invent a column; unique name,
    * so concurrent emitters never collide). */
  def append(store: TableStore, table: String, op: String,
      rows: Seq[(String, Timestamp)], batchId: Long = -1L): Unit = {
    if (rows.isEmpty) return
    val now = nextEmittedAt()
    val data = rows.map { case (id, ts) => Row(op, id, ts, batchId, now) }
    store.spark.createDataFrame(
        store.spark.sparkContext.parallelize(data, 1), Schema)
      .write.mode("overwrite")
      .parquet(s"${path(store, table)}/mut-${java.util.UUID.randomUUID()}")
  }

  /** Consumer-side read of the full event log (empty frame when no
    * events exist). Batch dirs are plain subdirs → recursive lookup. */
  def read(store: TableStore, table: String): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(path(store, table))
    val fs = p.getFileSystem(store.spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p))
      store.spark.read.option("recursiveFileLookup", "true").parquet(path(store, table))
    else store.spark.createDataFrame(
      store.spark.sparkContext.emptyRDD[Row], Schema)
  }
}

/** Named consumer group over a table's CDC log — the reference's
  * subscription consumer groups, which keep a per-group cursor in Redis
  * (`internal/subscription/manager.go:157-225`). Here the cursor is the
  * high-water `emitted_at` timestamp, persisted per group under the
  * table's CDC directory, so independent groups replay independently
  * and survive restarts.
  *
  * Semantics: at-least-once (uncommitted polls re-deliver). `poll()`
  * returns events strictly newer than the committed cursor; `commit()`
  * advances it to the high-water mark of the last poll. Emission
  * timestamps are strictly increasing micros ([[CdcLog.nextEmittedAt]]),
  * so two events can never share the cursor boundary — committing
  * between two same-millisecond emissions drops neither.
  *
  * Producer assumption: event producers (mutations, streaming batch
  * commits) are synchronous, driver-coordinated operations — no append
  * is in flight while poll() lists the log. A multi-writer deployment
  * would add a stability horizon (exclude events younger than the max
  * append latency) before trusting the high-water mark. */
class CdcConsumer(store: TableStore, table: String, group: String) {

  require(group.matches("[A-Za-z0-9_-]+"), s"invalid group name '$group'")

  private def cursorPath = new org.apache.hadoop.fs.Path(
    CdcLog.path(store, table), s"_offsets/$group")
  private def fs = cursorPath.getFileSystem(store.spark.sparkContext.hadoopConfiguration)

  /** Committed high-water mark (epoch micros — emitted_at is
    * micros-unique, so micros must survive the round-trip or
    * same-millisecond events would straddle the cursor), 0 when never
    * committed. */
  def committed(): Long =
    if (!fs.exists(cursorPath)) 0L
    else {
      val in = fs.open(cursorPath) // hot path: close explicitly, no fd leak
      val txt = try new String(
        org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8")
      finally in.close()
      txt.trim.toLongOption.getOrElse(0L)
    }

  @volatile private var lastSeenHighWater: Long = -1L

  /** Events strictly newer than the committed cursor, oldest first. */
  def poll(): DataFrame = {
    val since = CdcLog.fromMicros(committed())
    val events = CdcLog.read(store, table)
      .filter(org.apache.spark.sql.functions.col("emitted_at") > since)
      .orderBy(org.apache.spark.sql.functions.col("emitted_at"),
        org.apache.spark.sql.functions.col("id"))
    val hw = events.agg(org.apache.spark.sql.functions.max("emitted_at")).head().getTimestamp(0)
    lastSeenHighWater = if (hw == null) -1L else CdcLog.toMicros(hw)
    events
  }

  /** Advance the cursor past everything the last poll returned. */
  def commit(): Unit = if (lastSeenHighWater >= 0) {
    commitAt(lastSeenHighWater)
    lastSeenHighWater = -1L
  }

  /** Commit an EXPLICIT high-water mark (micros) — for stateless/remote
    * consumers (REST) that received the mark in a poll response. Never
    * moves the cursor backwards: a late or replayed commit request must
    * not re-deliver everything after an earlier successful commit. */
  def commitAt(micros: Long): Unit = if (micros > committed()) {
    val out = fs.create(cursorPath, true)
    out.write(micros.toString.getBytes("UTF-8")); out.close()
  }
}
