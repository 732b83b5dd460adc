package graft.catalog

import java.sql.Timestamp

import graft.SparkSpec
import graft.ingest.{DynRecord, TableConfig}

class TableStoreSpec extends SparkSpec {

  private def rec(id: String, ts: String, payload: Map[String, Any]) =
    DynRecord(id, Timestamp.valueOf(ts), payload)

  test("write/flush/read roundtrip with date partitioning") {
    val store = new TableStore(spark, tmpDir("ts1"))
    store.write("users", Seq(
      rec("u1", "2024-01-01 10:00:00", Map("name" -> "ann", "age" -> 31)),
      rec("u2", "2024-01-02 11:00:00", Map("name" -> "bob", "age" -> 25))))
    store.flush("users")
    val df = store.read("users")
    assert(df.count() == 2)
    assert(df.columns.toSet == Set("id", "timestamp", "name", "age", "date"))
    // numbers widened to double
    assert(df.schema("age").dataType.typeName == "double")
    // hive partition dirs exist
    val dirs = new java.io.File(store.tablePath("users")).listFiles().map(_.getName)
    assert(dirs.contains("date=2024-01-01") && dirs.contains("date=2024-01-02"))
  }

  test("hybrid visibility: unflushed rows are readable immediately") {
    val store = new TableStore(spark, tmpDir("ts2"))
    store.write("t", Seq(rec("a", "2024-02-01 00:00:01", Map("v" -> 1))))
    // buffer not flushed (below size trigger, interval not elapsed)
    assert(store.read("t").count() == 1)
    store.flush("t")
    store.write("t", Seq(rec("b", "2024-02-01 00:00:02", Map("v" -> 2))))
    assert(store.read("t").count() == 2) // storage ∪ buffer
  }

  test("schema evolution across batches: union by name, missing cols null") {
    val store = new TableStore(spark, tmpDir("ts3"))
    store.write("evo", Seq(rec("1", "2024-03-01 00:00:00", Map("a" -> 1))))
    store.flush("evo")
    store.write("evo", Seq(rec("2", "2024-03-02 00:00:00", Map("b" -> "x"))))
    store.flush("evo")
    val df = store.read("evo")
    assert(df.columns.toSet == Set("id", "timestamp", "a", "b", "date"))
    val rows = df.orderBy("id").collect()
    assert(rows(0).getAs[Any]("b") == null)
    assert(rows(1).getAs[Any]("a") == null)
  }

  test("conflicting payload types in one batch become JSON text") {
    val store = new TableStore(spark, tmpDir("ts4"))
    store.write("mix", Seq(
      rec("1", "2024-03-01 00:00:00", Map("v" -> 1)),
      rec("2", "2024-03-01 00:00:01", Map("v" -> "str"))))
    store.flush("mix")
    val df = store.read("mix")
    assert(df.schema("v").dataType.typeName == "string")
    assert(df.orderBy("id").collect().map(_.getAs[String]("v")).toSeq == Seq("1", "str"))
  }

  test("cross-batch type conflict: storage is migrated to string, table stays readable") {
    val store = new TableStore(spark, tmpDir("ts-conflict"))
    store.write("c", Seq(rec("1", "2024-03-01 00:00:00", Map("v" -> 1.5))))
    store.flush("c")
    assert(store.read("c").schema("v").dataType.typeName == "double")
    // second batch flips the type — must widen storage, not break reads
    store.write("c", Seq(rec("2", "2024-03-02 00:00:00", Map("v" -> "str"))))
    store.flush("c")
    val df = store.read("c")
    assert(df.schema("v").dataType.typeName == "string")
    assert(df.orderBy("id").collect().map(_.getAs[String]("v")).toSeq == Seq("1.5", "str"))
    // and a third numeric batch stays string per the recorded schema
    store.write("c", Seq(rec("3", "2024-03-03 00:00:00", Map("v" -> 7))))
    store.flush("c")
    assert(store.read("c").orderBy("id").collect().map(_.getAs[String]("v")).toSeq ==
      Seq("1.5", "str", "7"))
  }

  test("schema registry survives a new TableStore instance (persisted)") {
    val root = tmpDir("ts-persist")
    val s1 = new TableStore(spark, root)
    s1.write("p", Seq(rec("1", "2024-03-01 00:00:00", Map("v" -> 1))))
    s1.flush("p")
    s1.write("p", Seq(rec("2", "2024-03-02 00:00:00", Map("v" -> "x"))))
    s1.flush("p") // migrated to string
    val s2 = new TableStore(spark, root) // fresh process, reads registry
    s2.createTable("p")
    s2.write("p", Seq(rec("3", "2024-03-03 00:00:00", Map("v" -> 2))))
    s2.flush("p")
    assert(s2.read("p").schema("v").dataType.typeName == "string")
    assert(s2.read("p").count() == 3)
  }

  test("registry bootstraps from pre-registry parquet (conflict still migrates)") {
    val root = tmpDir("ts-boot")
    val store = new TableStore(spark, root)
    // simulate a table written without the registry: direct parquet write
    import spark.implicits._
    Seq(("a", java.sql.Timestamp.valueOf("2024-03-01 00:00:00"), 1.5))
      .toDF("id", "timestamp", "v")
      .withColumn("date", org.apache.spark.sql.functions.to_date(
        org.apache.spark.sql.functions.col("timestamp")))
      .write.partitionBy("date").parquet(store.tablePath("b"))
    store.createTable("b")
    // conflicting later batch must widen + migrate, not corrupt
    store.write("b", Seq(rec("z", "2024-03-02 00:00:00", Map("v" -> "str"))))
    store.flush("b")
    val vals = store.read("b").orderBy("id").collect().map(_.getAs[String]("v")).toSeq
    assert(vals == Seq("1.5", "str"))
  }

  test("drop + recreate does not inherit the old schema registry") {
    val root = tmpDir("ts-drop")
    val store = new TableStore(spark, root)
    store.write("t", Seq(rec("1", "2024-03-01 00:00:00", Map("v" -> "text"))))
    store.flush("t")
    store.dropTable("t")
    store.write("t", Seq(rec("2", "2024-03-01 00:00:00", Map("v" -> 2.5))))
    store.flush("t")
    assert(store.read("t").schema("v").dataType.typeName == "double")
  }

  test("payload name collisions and system columns are suffixed") {
    val store = new TableStore(spark, tmpDir("ts5"))
    store.write("c", Seq(
      rec("1", "2024-03-01 00:00:00",
        Map("user name" -> "x", "user_name" -> "y", "timestamp" -> "fake"))))
    store.flush("c")
    val cols = store.read("c").columns.toSet
    assert(cols.contains("user_name") && cols.contains("user_name_2"))
    assert(cols.contains("timestamp_2")) // payload's 'timestamp' didn't clobber system col
  }

  test("size trigger flushes automatically") {
    val store = new TableStore(spark, tmpDir("ts6"))
    store.createTable("auto", TableConfig(bufferSize = 10, flushIntervalMs = Long.MaxValue))
    val recs = (1 to 10).map(i => rec(s"r$i", "2024-04-01 00:00:00", Map("i" -> i)))
    store.write("auto", recs)
    // buffer hit size trigger → flushed to storage
    assert(store.storageDf("auto").count() == 10)
  }

  test("version bumps on write and drop") {
    val store = new TableStore(spark, tmpDir("ts7"))
    store.write("v", Seq(rec("1", "2024-01-01 00:00:00", Map("x" -> 1))))
    val v1 = store.version("v")
    store.write("v", Seq(rec("2", "2024-01-01 00:00:00", Map("x" -> 2))))
    assert(store.version("v") > v1)
  }

  test("concurrent writers + flusher lose nothing (locked WAL write path)") {
    val root = tmpDir("ts9")
    val store = new TableStore(spark, root)
    store.createTable("t", TableConfig(bufferSize = 10000, flushIntervalMs = Long.MaxValue))
    val writers = 4
    val perWriter = 25
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val fs = (0 until writers).map { w =>
      Future {
        (0 until perWriter).foreach { i =>
          store.write("t", Seq(rec(s"w$w-r$i", "2024-05-01 00:00:00", Map("v" -> i))))
          if (i % 7 == 0) store.flush("t")
        }
      }
    }
    fs.foreach(Await.result(_, 300.seconds))
    store.flush("t")
    val ids = store.read("t").collect().map(_.getAs[String]("id")).toSet
    assert(ids.size == writers * perWriter,
      s"lost ${writers * perWriter - ids.size} of ${writers * perWriter} rows")
    // WAL fully drained after final flush
    val walDir = new java.io.File(s"$root/t/_graft_wal")
    assert(!walDir.exists() || walDir.listFiles().isEmpty,
      s"WAL not drained: ${Option(walDir.listFiles()).map(_.length)}")
    // restart sees exactly the same rows (no replay duplicates)
    assert(new TableStore(spark, root).read("t").count() == writers * perWriter)
  }

  test("un-flushed writes survive a store restart via WAL replay") {
    val root = tmpDir("ts8")
    val store = new TableStore(spark, root)
    store.createTable("t", TableConfig(bufferSize = 1000, flushIntervalMs = Long.MaxValue))
    store.write("t", Seq(
      rec("a", "2024-01-01 00:00:00", Map("v" -> 1)),
      rec("b", "2024-01-01 00:00:01", Map("v" -> 2))))
    store.write("t", Seq(rec("c", "2024-01-02 00:00:00", Map("v" -> 3))))
    // no flush — a crash here used to lose all three rows
    val reborn = new TableStore(spark, root)
    reborn.createTable("t", TableConfig(bufferSize = 1000, flushIntervalMs = Long.MaxValue))
    val ids = reborn.read("t").collect().map(_.getAs[String]("id")).toSeq.sorted
    assert(ids == Seq("a", "b", "c"), s"WAL replay lost rows: $ids")
    // flush persists the replayed rows and clears the WAL
    reborn.flush("t")
    assert(reborn.storageDf("t").count() == 3)
    val again = new TableStore(spark, root)
    val after = again.read("t").collect().map(_.getAs[String]("id")).toSeq.sorted
    assert(after == Seq("a", "b", "c"), s"WAL not cleared after flush: $after")
    // mixed: one flushed store + one fresh un-flushed write on a new store
    again.write("t", Seq(rec("d", "2024-01-03 00:00:00", Map("v" -> 4))))
    val last = new TableStore(spark, root)
    assert(last.read("t").count() == 4)
  }

  test("table names are validated: path traversal and separators refused") {
    val store = new TableStore(spark, tmpDir("ts-val"))
    // the traversal hole: dropTable("..") would have recursively
    // deleted the data root's PARENT (reference sanitizes every table
    // identifier — internal/security/sql_sanitizer.go)
    for (bad <- Seq("..", ".", "a/b", "a\\b", "../x", "a..b", "", "a.", " a"))
      intercept[IllegalArgumentException] { store.tablePath(bad) }
    for (bad <- Seq("..", "a/b"))
      intercept[IllegalArgumentException] { store.dropTable(bad) }
    // normal names (incl. dots and dashes) pass
    for (ok <- Seq("t", "events_v2", "a-b", "a.b", "T1"))
      store.tablePath(ok)
  }
}
