package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table resolution over a scale-factor directory of parquet files.
  *
  * Mirrors the reference's per-table view materialization
  * (`internal/query/query.go:514-574`: `CREATE VIEW t AS SELECT * FROM
  * read_parquet([...], union_by_name=true)`) — in Spark a temp view over a
  * parquet read. Column pruning / predicate pushdown / partition pruning
  * are Catalyst's job, so unlike the reference there is no hand-written
  * pruning layer between the view and the scan.
  */
object Tables {

  val All: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Small dimension tables — always broadcastable at any scale factor
    * (region=5, nation=25 rows at every TPC-H sf). */
  val Dims: Set[String] = Set("region", "nation")

  def path(sfDir: String, table: String): String = s"$sfDir/$table.parquet"

  def load(spark: SparkSession, sfDir: String, table: String): DataFrame = {
    val df = spark.read.parquet(path(sfDir, table))
    // events.ts has shipped under two encodings across driver rounds:
    // parquet TIMESTAMP(NANOS) — read as long nanos (GraftSession
    // nanosAsLong), truncated here to µs TimestampType exactly like
    // DuckDB's ns→µs cast — and native µs timestamps, which pass
    // through untouched (their scan filters push down natively; the
    // long-nanos path gets the same via NanosTimePushdown).
    df.schema.fields.foldLeft(df) {
      case (d, f) if f.name == "ts" && f.dataType == org.apache.spark.sql.types.LongType =>
        d.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      case (d, _) => d
    }
  }

  // session → dir already registered: re-registering all 10 views costs
  // ~10 parquet footer reads + catalog ops (~1s) PER QUERY otherwise —
  // dominating sub-second queries on the spark.sql path. Weak keys: a
  // GC'd session's entry must not alias a new session (identity hashes
  // are reused), and entries die with their session.
  private val registered =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, String]())

  /** Register every table in `sfDir` as a temp view (cached per
    * session+dir; safe to call before each query). */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    if (registered.get(spark) != sfDir) {
      All.foreach { t => load(spark, sfDir, t).createOrReplaceTempView(t) }
      registered.put(spark, sfDir)
    }
}
