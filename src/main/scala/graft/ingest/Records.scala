package graft.ingest

import java.sql.Timestamp
import java.util.UUID

/** Record envelope (reference `miniodb.proto:53-57`): id + timestamp +
  * arbitrary payload. Tables are schemaless; schema is inferred per
  * flush batch by [[DynamicSchema]]. */
final case class DynRecord(
    id: String,
    timestamp: Timestamp,
    payload: Map[String, Any])

/** Per-table configuration (reference `miniodb.proto:155-174` /
  * `config/config.yaml:36-38,93-97`). */
final case class TableConfig(
    bufferSize: Int = 5000,
    flushIntervalMs: Long = 15000L,
    retentionDays: Int = 0, // 0 = keep forever
    idStrategy: IdStrategy = IdStrategy.Uuid,
    idPattern: Option[String] = None) // validation regex for user ids

sealed trait IdStrategy
object IdStrategy {
  case object Uuid extends IdStrategy
  case object Snowflake extends IdStrategy
  final case class CustomPrefix(prefix: String) extends IdStrategy
  case object UserProvided extends IdStrategy
}

/** ID generation mirroring the reference strategies
  * (`miniodb_service.go:532-601`, `pkg/idgen`). Snowflake: 41-bit ms
  * timestamp | 10-bit node | 12-bit sequence. */
object IdGen {
  private val Epoch = 1704067200000L // 2024-01-01
  private var lastMs = -1L
  private var seq = 0L

  /** Snowflake sequence: resets each millisecond, spins to the next ms on
    * 12-bit overflow — a wrapping counter would collide ids generated
    * 4096 apart within one millisecond. */
  private def nextSnowflake(nodeId: Int): Long = synchronized {
    var now = System.currentTimeMillis()
    // clock stepped backwards (NTP): never regress below lastMs — doing
    // so would reissue (ts, seq) pairs already handed out
    if (now < lastMs) now = lastMs
    if (now == lastMs) {
      seq += 1
      if (seq > 0xFFF) { // sequence exhausted: wait for the next ms
        while (now <= lastMs) now = System.currentTimeMillis()
        seq = 0
      }
    } else seq = 0
    lastMs = now
    ((now - Epoch) << 22) | ((nodeId.toLong & 0x3FF) << 12) | seq
  }

  def generate(strategy: IdStrategy, nodeId: Int = 0): String = strategy match {
    case IdStrategy.Uuid => UUID.randomUUID().toString
    case IdStrategy.Snowflake => nextSnowflake(nodeId).toString
    case IdStrategy.CustomPrefix(p) => s"$p-${UUID.randomUUID().toString.take(8)}"
    case IdStrategy.UserProvided =>
      throw new IllegalArgumentException("user_provided strategy requires an explicit id")
  }

  private val DefaultIdPattern = "^[a-zA-Z0-9_-]{1,255}$"

  /** Validate a user-provided id (reference `sql_sanitizer.go:110-124`). */
  def validate(id: String, pattern: Option[String] = None): Boolean =
    id != null && id.matches(pattern.getOrElse(DefaultIdPattern))
}
