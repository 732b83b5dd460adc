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

  test("incremental refresh re-indexes only changed date partitions") {
    val store = new TableStore(spark, tmpDir("idx4"))
    def recAt(id: String, date: String, text: String) =
      DynRecord(id, Timestamp.valueOf(s"$date 00:00:00"), Map("text" -> text))
    store.write("t", Seq(
      recAt("a", "2024-01-01", "alpha beta"),
      recAt("b", "2024-01-02", "gamma delta")))
    store.flush("t")
    val idx = new InvertedIndex(store)
    idx.build("t")
    val fs = new org.apache.hadoop.fs.Path(idx.indexPath("t"))
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def dateDirModTime(d: String): Long = {
      val p = new org.apache.hadoop.fs.Path(idx.indexPath("t"), s"date=$d")
      fs.listStatus(p).filter(_.isFile).map(_.getModificationTime).max
    }
    val day1Before = dateDirModTime("2024-01-01")
    Thread.sleep(1100) // FS modtime granularity can be 1s
    // append to day 2 and add day 3 — day 1 untouched
    store.write("t", Seq(
      recAt("c", "2024-01-02", "delta epsilon"),
      recAt("d", "2024-01-03", "zeta")))
    val stats = idx.refresh("t") // flushes internally
    assert(stats.rebuilt == Seq("2024-01-02", "2024-01-03"), stats)
    assert(stats.removed.isEmpty && stats.unchanged == 1, stats)
    // the unchanged date partition's files were NOT rewritten
    assert(dateDirModTime("2024-01-01") == day1Before,
      "unchanged date partition was rewritten")
    assert(idx.isFresh("t"))
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.getAs[String]("id")).toSet
    assert(ids(idx.search("t", Seq("delta"))) == Set("b", "c"))
    assert(ids(idx.search("t", Seq("zeta"))) == Set("d"))
    assert(ids(idx.search("t", Seq("alpha"))) == Set("a"))
    // no-op refresh touches nothing
    val stats2 = idx.refresh("t")
    assert(stats2.rebuilt.isEmpty && stats2.unchanged == 3, stats2)
  }

  test("refresh drops index partitions for dates removed by retention") {
    val store = new TableStore(spark, tmpDir("idx5"))
    def recAt(id: String, date: String, text: String) =
      DynRecord(id, Timestamp.valueOf(s"$date 00:00:00"), Map("text" -> text))
    store.write("t", Seq(
      recAt("old", "2020-01-01", "ancient words"),
      recAt("new", "2024-06-01", "fresh words")))
    store.flush("t")
    val idx = new InvertedIndex(store)
    idx.build("t")
    // retention purge of the old date, then refresh
    store.setConfig("t", graft.ingest.TableConfig(retentionDays = 30))
    val muts = new graft.mutate.Mutations(store)
    muts.applyRetention("t", java.time.LocalDate.parse("2024-06-10"))
    val stats = idx.refresh("t")
    assert(stats.removed == Seq("2020-01-01"), stats)
    val fs = new org.apache.hadoop.fs.Path(idx.indexPath("t"))
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(
      idx.indexPath("t"), "date=2020-01-01")))
    val hits = idx.search("t", Seq("words")).collect().map(_.getAs[String]("id")).toSet
    assert(hits == Set("new"))
  }

  test("refresh purges index entries when a changed date ends up with zero rows") {
    val store = new TableStore(spark, tmpDir("idx6"))
    def recAt(id: String, date: String, text: String) =
      DynRecord(id, Timestamp.valueOf(s"$date 00:00:00"), Map("text" -> text))
    store.write("t", Seq(
      recAt("a", "2024-01-01", "unique marker"),
      recAt("b", "2024-01-02", "other stuff")))
    store.flush("t")
    val idx = new InvertedIndex(store)
    idx.build("t")
    assert(idx.search("t", Seq("marker")).count() == 1)
    // delete the only doc of day 1: the date's files change but the new
    // index content for it is EMPTY — dynamic overwrite alone would keep
    // the stale (token → a) entries forever
    val muts = new graft.mutate.Mutations(store)
    assert(muts.deleteById("t", "a") == 1)
    idx.refresh("t")
    assert(idx.search("t", Seq("marker")).count() == 0,
      "stale index entries survived a zero-row partition refresh")
    assert(idx.search("t", Seq("stuff")).count() == 1)
  }

  test("an index emptied of every partition serves zero matches, not an error") {
    val store = new TableStore(spark, tmpDir("idx7"))
    store.write("t", Seq(rec("only", "solitary words")))
    store.flush("t")
    val idx = new InvertedIndex(store)
    idx.build("t")
    assert(idx.search("t", Seq("solitary")).count() == 1)
    new graft.mutate.Mutations(store).deleteById("t", "only")
    idx.refresh("t") // every index partition is now gone — no parquet files
    assert(idx.search("t", Seq("solitary")).count() == 0)
    assert(idx.lookup("t", Seq("anything")).count() == 0)
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
