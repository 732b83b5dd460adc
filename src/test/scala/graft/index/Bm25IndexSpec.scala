package graft.index

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.core.Tables
import graft.operators.TextAnalysis

/** The indexed BM25 path must reproduce the scan path BIT-FOR-BIT —
  * that is what lets t14/t15 share t11/t12's DuckDB oracles. */
class Bm25IndexSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Tables.load(spark, Sf0001, "documents")

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.mkString("|")).toSeq

  test("indexed single-query scores equal the scan form exactly") {
    val path = tmpDir("graft-bm25-single")
    Bm25Index.build(docs, path)
    val terms = Seq("spark", "window", "dup")
    val scan = rows(TextAnalysis.bm25(docs, terms).orderBy(col("doc_id")))
    val idx = rows(TextAnalysis.bm25FromIndex(spark, path, terms)
      .orderBy(col("doc_id")))
    assert(scan.nonEmpty)
    assert(idx === scan)
  }

  test("a term absent from the corpus scores like the scan form (df=0)") {
    val path = tmpDir("graft-bm25-absent")
    Bm25Index.build(docs, path)
    val terms = Seq("spark", "zzz_not_a_token")
    val scan = rows(TextAnalysis.bm25(docs, terms).orderBy(col("doc_id")))
    val idx = rows(TextAnalysis.bm25FromIndex(spark, path, terms)
      .orderBy(col("doc_id")))
    assert(idx === scan)
  }

  test("indexed batch top-k equals the scan form exactly") {
    val path = tmpDir("graft-bm25-batch")
    Bm25Index.build(docs, path)
    val q = Seq(
      (1L, "spark"), (1L, "window"),
      (2L, "dup"), (2L, "spark"),
      (3L, "window"), (3L, "dup")).toDF("query_id", "term")
    val scan = rows(TextAnalysis.bm25MultiQuery(docs, q, 10))
    val idx = rows(TextAnalysis.bm25BatchFromIndex(spark, path, q, 10))
    assert(scan.nonEmpty)
    assert(idx === scan)
  }

  test("query-time plan touches the index, not the corpus") {
    val path = tmpDir("graft-bm25-plan")
    Bm25Index.build(docs, path)
    val plan = TextAnalysis.bm25FromIndex(spark, path, Seq("spark"))
      .queryExecution.executedPlan.toString
    assert(plan.contains(path), "scan should read the index path")
    assert(!plan.contains("documents.parquet"),
      "indexed query must not rescan the corpus")
    // the term filter reaches the postings scan (footer/dictionary
    // pruning on the token-clustered files)
    assert(plan.contains("PushedFilters") && plan.contains("token"),
      "term predicate should push into the postings scan")
  }

  test("stats include docs matching no query term (N and sumdl are corpus-wide)") {
    val path = tmpDir("graft-bm25-stats")
    Bm25Index.build(docs, path)
    val st = Bm25Index.stats(spark, path).collect()(0)
    assert(st.getLong(0) === docs.count())
  }

  test("ensure() reuses an existing build (content-addressed marker)") {
    val path = tmpDir("graft-bm25-ensure")
    Bm25Index.build(docs, path)
    val mtime = new java.io.File(path, "_BM25_READY").lastModified()
    Bm25Index.ensure(docs, path)
    assert(new java.io.File(path, "_BM25_READY").lastModified() === mtime)
  }
}
