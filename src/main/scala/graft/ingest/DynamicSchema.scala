package graft.ingest

import org.apache.spark.sql.types._

/** Dynamic-record flattening — the one piece of genuinely ported
  * *semantics* from the reference (minIODB flattens JSON payloads to
  * typed parquet columns per flush batch; see reference
  * `internal/buffer/concurrent_buffer.go:560-655` for the rules).
  *
  * Rules re-implemented here:
  *  - field names sanitized: `[^a-zA-Z0-9_]` → `_`, lowercased
  *  - names colliding after sanitization get `_2`, `_3`, … suffixes
  *    (first occurrence in payload-key order wins the bare name)
  *  - names colliding with system columns (`id`, `timestamp`,
  *    `table_name`, `date`) are suffixed the same way
  *  - type inference per batch: Boolean → BooleanType; ALL numbers →
  *    DoubleType (proto-Struct numbers are float64 — reference
  *    `internal/ingest/ingest.go:132-133`; widening also makes Spark
  *    `mergeSchema` conflict-free, SURVEY.md §7.4a); String → StringType;
  *    nested maps/seqs → JSON text (StringType), like the reference's
  *    BYTE_ARRAY/UTF8 fallback
  *  - a field that appears with conflicting scalar types in one batch
  *    widens: any-numeric+bool/string → StringType (JSON-encoded)
  */
object DynamicSchema {

  val SystemColumns: Seq[String] = Seq("id", "timestamp", "table_name", "date")

  def sanitizeName(raw: String): String = {
    val cleaned = raw.replaceAll("[^a-zA-Z0-9_]", "_").toLowerCase
    if (cleaned.isEmpty || cleaned.head.isDigit) "f_" + cleaned else cleaned
  }

  /** Assign final column names for payload keys (stable order = first
    * appearance across the batch). */
  def assignNames(keysInOrder: Seq[String]): Map[String, String] = {
    val taken = scala.collection.mutable.Set[String](SystemColumns: _*)
    keysInOrder.map { raw =>
      val base = sanitizeName(raw)
      val name =
        if (!taken(base)) base
        else Iterator.from(2).map(i => s"${base}_$i").find(!taken(_)).get
      taken += name
      raw -> name
    }.toMap
  }

  /** JSON-encode an arbitrary payload value (minimal, dependency-free). */
  def toJson(v: Any): String = v match {
    case null => "null"
    case b: Boolean => b.toString
    case n: Byte => n.toString
    case n: Short => n.toString
    case n: Int => n.toString
    case n: Long => n.toString
    case n: Float => jsonNum(n.toDouble)
    case n: Double => jsonNum(n)
    case n: BigDecimal => n.toString
    case s: String => jsonStr(s)
    case m: scala.collection.Map[_, _] =>
      m.map { case (k, value) => jsonStr(k.toString) + ":" + toJson(value) }
        .mkString("{", ",", "}")
    case it: Iterable[_] => it.map(toJson).mkString("[", ",", "]")
    case other => jsonStr(other.toString)
  }

  private def jsonNum(d: Double): String =
    if (d.isWhole && math.abs(d) < 1e15) d.toLong.toString else d.toString

  private def jsonStr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  sealed trait VType { def spark: DataType }
  case object VBool extends VType { val spark: DataType = BooleanType }
  case object VNum extends VType { val spark: DataType = DoubleType }
  case object VStr extends VType { val spark: DataType = StringType }
  case object VJson extends VType { val spark: DataType = StringType }

  def typeOf(v: Any): Option[VType] = v match {
    case null => None
    case _: Boolean => Some(VBool)
    case _: Byte | _: Short | _: Int | _: Long | _: Float | _: Double => Some(VNum)
    case _: BigDecimal => Some(VNum)
    case _: String => Some(VStr)
    case _ => Some(VJson)
  }

  /** Widen two observed types for the same field. */
  def widen(a: VType, b: VType): VType = (a, b) match {
    case (x, y) if x == y => x
    case _ => VJson // mixed scalar types → JSON text, like the reference's UTF8 fallback
  }

  /** Convert a payload value to the chosen column type. */
  def convert(v: Any, t: VType): Any = (v, t) match {
    case (null, _) => null
    case (b: Boolean, VBool) => b
    case (n: Byte, VNum) => n.toDouble
    case (n: Short, VNum) => n.toDouble
    case (n: Int, VNum) => n.toDouble
    case (n: Long, VNum) => n.toDouble
    case (n: Float, VNum) => n.toDouble
    case (n: Double, VNum) => n
    case (n: BigDecimal, VNum) => n.toDouble
    case (s: String, VStr) => s
    // VJson = "stringify": scalars keep their plain text form (the
    // reference Sprintf's scalars and JSON-marshals only nested values),
    // so mixed-type batches read back as natural strings, not "\"x\""
    case (s: String, VJson) => s
    case (other, VJson) => toJson(other)
    case (other, VStr) => other.toString
    case (other, _) => toJson(other) // type-conflict fallback
  }
}
