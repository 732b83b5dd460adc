package graft.index

import java.sql.Timestamp

import graft.SparkSpec
import graft.catalog.TableStore
import graft.ingest.DynRecord

class InvertedIndexSpec extends SparkSpec {

  private def rec(id: String, text: String) =
    DynRecord(id, Timestamp.valueOf("2024-01-01 00:00:00"), Map("text" -> text))

  test("build + any/all search over a dynamic table") {
    val store = new TableStore(spark, tmpDir("idx"))
    store.write("t", Seq(
      rec("a", "spark window functions"),
      rec("b", "spark streaming"),
      rec("c", "window shopping"),
      rec("d", "nothing relevant")))
    store.flush("t")
    val idx = new InvertedIndex(store)
    idx.build("t")
    assert(idx.isFresh("t"))
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.getAs[String]("id")).toSet
    assert(ids(idx.search("t", Seq("spark"))) == Set("a", "b"))
    assert(ids(idx.search("t", Seq("spark", "window"))) == Set("a", "b", "c")) // ANY
    assert(ids(idx.search("t", Seq("spark", "window"), requireAll = true)) == Set("a"))
    assert(ids(idx.search("t", Seq("ghost"))) == Set.empty)
    // duplicate terms must not break ALL-semantics
    assert(ids(idx.search("t", Seq("spark", "spark"), requireAll = true)) == Set("a", "b"))
  }

  test("staleness: a write invalidates, searchFresh rebuilds") {
    val store = new TableStore(spark, tmpDir("idx2"))
    store.write("t", Seq(rec("a", "alpha beta")))
    store.flush("t")
    val idx = new InvertedIndex(store)
    idx.build("t")
    store.write("t", Seq(rec("b", "beta gamma")))
    store.flush("t")
    assert(!idx.isFresh("t"))
    // stale index still serves the old view via plain search
    assert(idx.search("t", Seq("beta")).count() >= 1)
    val fresh = idx.searchFresh("t", Seq("beta"))
    assert(fresh.collect().map(_.getAs[String]("id")).toSet == Set("a", "b"))
    assert(idx.isFresh("t"))
  }

  test("term lookup pushes the token filter into the index scan") {
    val store = new TableStore(spark, tmpDir("idx3"))
    store.write("t", Seq(rec("a", "x y z"), rec("b", "p q r")))
    store.flush("t")
    val idx = new InvertedIndex(store)
    idx.build("t")
    val df = idx.lookup("t", Seq("x"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("token"),
      s"token filter not pushed:\n$plan")
  }

  test("index-backed corpus search equals the scan form (t07 == t06)") {
    val a = graft.operators.TextAnalysis.textSearch(spark, Sf001).collect().map(_.toSeq)
    val b = graft.operators.TextAnalysis.indexedSearch(spark, Sf001).collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq)
    assert(a.nonEmpty)
  }
}
