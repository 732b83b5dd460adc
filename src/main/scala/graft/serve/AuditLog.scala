package graft.serve

/** Append-only JSONL audit log for facade mutations — the reference's
  * per-operation audit trail (`internal/audit/audit.go:87-158`: one
  * JSON entry per write/update/delete with success/failure, error
  * text, and duration, appended under a mutex to a local file). The
  * CDC log records the mutation FACTS for consumers; this records the
  * ATTEMPTS — including denied and failed ones — for operators.
  *
  * Driver-side by design: facade verbs are control-plane decisions
  * (driver-sized by definition — the data plane's distributed facts
  * flow through [[graft.streaming.CdcLog]]), so a local synchronized
  * appender is the right scale, exactly as in the reference. At
  * cluster scale the file path points at shared storage and the
  * single-writer constraint is per facade instance, the same contract
  * as the reference's per-node log file. */
final class AuditLog(path: String, nodeId: String = "local") {

  private val file = {
    val p = java.nio.file.Paths.get(path)
    if (p.getParent != null) java.nio.file.Files.createDirectories(p.getParent)
    new java.io.FileOutputStream(path, true) // append mode
  }

  private def esc(s: String): String = s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  /** Append one entry. Thread-safe (facade verbs may race); never
    * throws — an audit failure must not fail the audited operation
    * (the reference logs-and-continues too). */
  def log(action: String, table: String, recordId: String,
      success: Boolean, error: String, durationMs: Long): Unit =
    try {
      val err = if (error == null) "" else s""","error":"${esc(error)}""""
      val line = s"""{"timestamp":"${java.time.Instant.now()}"""" +
        s""","action":"${esc(action)}","table":"${esc(table)}"""" +
        s""","record_id":"${esc(if (recordId == null) "" else recordId)}"""" +
        s""","success":$success$err""" +
        s""","node_id":"${esc(nodeId)}","duration_ms":$durationMs}""" + "\n"
      synchronized {
        file.write(line.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        file.flush()
      }
    } catch { case _: java.io.IOException => () }

  def close(): Unit = synchronized { file.close() }
}
