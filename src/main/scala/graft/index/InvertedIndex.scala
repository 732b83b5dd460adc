package graft.index

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.catalog.TableStore
import graft.functions.TextFunctions

/** Persisted token → document inverted index — the reference's inverted
  * text index (`internal/index/inverted*.go`, SURVEY §2.2 #35), which it
  * maintains per table and consults for token queries. Round 1 covered
  * the QUERY form only (array-membership predicate over a scan); this is
  * the materialized index.
  *
  * Layout: `(token, id)` pairs under `<root>/_index/<table>/`,
  * repartitioned BY TOKEN and token-sorted within files — a term lookup
  * prunes to the one partition file whose min/max token range covers
  * the term (footer stats + dictionary filtering), instead of scanning
  * the corpus. At 100 TB the index is the standard sub-linear path for
  * selective terms; the scan form stays right for dense terms.
  *
  * Freshness: the build records the table's mutation version; [[isFresh]]
  * compares against the live version and [[searchFresh]] rebuilds before
  * serving when stale (the reference updates its index synchronously on
  * write; rebuilding on version change is the batch-engine equivalent —
  * an incremental refresh would diff per-partition versions). */
class InvertedIndex(store: TableStore) {

  private def spark = store.spark

  def indexPath(table: String): String = s"${store.root}/_index/$table"

  private def versionFile(table: String) =
    new org.apache.hadoop.fs.Path(indexPath(table), "_built_version")

  /** Build (or rebuild) the index for `table`'s `textCol`. */
  def build(table: String, textCol: String = "text", idCol: String = "id"): Unit =
    store.withTableLock(table) {
      val version = store.version(table)
      InvertedIndex.buildFrame(
        spark, store.read(table), idCol, textCol, indexPath(table))
      val fs = versionFile(table).getFileSystem(spark.sparkContext.hadoopConfiguration)
      val out = fs.create(versionFile(table), true)
      out.write(version.toString.getBytes("UTF-8")); out.close()
    }

  /** Does the persisted index match the table's current version? */
  def isFresh(table: String): Boolean = {
    val p = versionFile(table)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p) && {
      val in = fs.open(p)
      val txt = try new String(
        org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8")
      finally in.close()
      txt.trim.toLongOption.contains(store.version(table))
    }
  }

  /** Ids of documents matching `terms` through the index (no table
    * join): ANY-semantics by default, ALL when `requireAll`. */
  def lookup(table: String, terms: Seq[String], requireAll: Boolean = false): DataFrame =
    InvertedIndex.lookupAt(spark, indexPath(table), terms, requireAll)

  /** Matching table rows via the index (semi join back to the table). */
  def search(table: String, terms: Seq[String], requireAll: Boolean = false): DataFrame =
    store.read(table).join(lookup(table, terms, requireAll), Seq("id"), "left_semi")

  /** [[search]] with rebuild-on-stale. */
  def searchFresh(table: String, terms: Seq[String],
      requireAll: Boolean = false, textCol: String = "text"): DataFrame = {
    if (!isFresh(table)) build(table, textCol)
    search(table, terms, requireAll)
  }
}

object InvertedIndex {

  /** Build an index for any frame: distinct `(token, id)` pairs,
    * token-clustered. Tokens follow the engine's tokenizer
    * ([[TextFunctions.tokens]] — the same rule every text operator and
    * the t06 scan-form search use, so index answers match scan answers
    * bit-for-bit). */
  def buildFrame(spark: SparkSession, df: DataFrame, idCol: String,
      textCol: String, path: String): Unit =
    df.select(col(idCol).as("id"),
        explode(array_distinct(TextFunctions.tokens(col(textCol)))).as("token"))
      .repartition(col("token"))
      .sortWithinPartitions(col("token"))
      .write.mode("overwrite").parquet(path)

  /** Id lookup against a built index path. The `isin` filter pushes to
    * the parquet scan (min/max + dictionary pruning on the
    * token-clustered files). */
  def lookupAt(spark: SparkSession, path: String, terms: Seq[String],
      requireAll: Boolean): DataFrame = {
    val distinctTerms = terms.distinct
    val hits = spark.read.parquet(path)
      .filter(col("token").isin(distinctTerms: _*))
    if (requireAll)
      hits.groupBy(col("id"))
        .agg(count_distinct(col("token")).as("n_terms"))
        .filter(col("n_terms") === distinctTerms.size)
        .select(col("id"))
    else hits.select(col("id")).distinct()
  }
}
