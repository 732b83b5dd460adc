package graft.streaming

import java.nio.file.{Files, Paths}
import java.sql.Timestamp

import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.catalog.TableStore

class StreamingSpec extends SparkSpec {

  private val recSchema = StructType(Seq(
    StructField("id", StringType),
    StructField("timestamp", TimestampType),
    StructField("v", DoubleType)))

  test("file-source micro-batch ingest lands partitioned parquet + CDC log") {
    val root = tmpDir("stream")
    val src = tmpDir("stream-src")
    val store = new TableStore(spark, root)
    val ing = new StreamingIngest(store)

    Files.writeString(Paths.get(src, "b1.json"),
      """{"id":"a","timestamp":"2024-01-01T10:00:00.000Z","v":1.0}
        |{"id":"b","timestamp":"2024-01-02T10:00:00.000Z","v":2.0}""".stripMargin)

    val q = ing.startJsonIngest("t", src, recSchema, tmpDir("stream-ckpt"))
    q.awaitTermination(60000)

    val df = store.read("t")
    assert(df.count() == 2)
    assert(df.columns.contains("date"))
    // date partitions from event time
    val dirs = new java.io.File(store.tablePath("t")).listFiles().map(_.getName)
    assert(dirs.contains("date=2024-01-01") && dirs.contains("date=2024-01-02"))
    // CDC log carries one INSERT per record
    val cdc = ing.cdcLog("t")
    assert(cdc.filter("op = 'INSERT'").count() == 2)
  }

  test("dynamic ingest: batches of different payload shapes widen the schema") {
    val root = tmpDir("dyn")
    val src = tmpDir("dyn-src")
    val ckpt = tmpDir("dyn-ckpt")
    val store = new TableStore(spark, root)
    val ing = new StreamingIngest(store)

    // batch 1: numeric v, extra field only here
    Files.writeString(Paths.get(src, "b1.json"),
      """{"id":"a","timestamp":"2024-01-01T10:00:00.000Z","v":1,"only1":"x"}
        |{"id":"b","timestamp":"2024-01-01T11:00:00.000Z","v":2,"only1":"y"}""".stripMargin)
    ing.startDynamicJsonIngest("t", src, ckpt).awaitTermination(60000)
    val s1 = store.read("t")
    assert(s1.count() == 2)
    assert(s1.schema("v").dataType == DoubleType) // numbers widen to double

    // batch 2: v becomes a STRING (cross-batch conflict), nested payload,
    // new field absent in batch 1
    Files.writeString(Paths.get(src, "b2.json"),
      """{"id":"c","timestamp":"2024-01-02T10:00:00.000Z","v":"high","nested":{"k":1},"only2":7}""".stripMargin)
    ing.startDynamicJsonIngest("t", src, ckpt).awaitTermination(60000)

    val df = store.read("t")
    assert(df.count() == 3)
    // conflict migrated storage: v is string everywhere, old rows readable
    assert(df.schema("v").dataType == StringType)
    val byId = df.collect().map(r => r.getAs[String]("id") -> r).toMap
    assert(byId("a").getAs[String]("v") == "1.0")
    assert(byId("c").getAs[String]("v") == "high")
    // union-by-name semantics: fields missing in the other batch are null
    assert(byId("c").getAs[String]("only1") == null)
    assert(byId("a").isNullAt(byId("a").fieldIndex("only2")))
    // nested value landed as JSON text
    assert(byId("c").getAs[String]("nested").contains("\"k\":1"))
  }

  test("dynamic JSON path and DynRecord batch path produce the same table") {
    // the two ingest front doors share the dynamic-schema rules — the
    // same logical records must land identically through either
    import graft.ingest.DynRecord
    val records = Seq(
      ("r1", "2024-02-01T08:00:00.000Z", Map[String, Any]("num" -> 1.5, "s" -> "x")),
      ("r2", "2024-02-02T09:30:00.000Z", Map[String, Any]("num" -> 2.0, "flag" -> true)))

    val storeA = new TableStore(spark, tmpDir("xpathA"))
    storeA.write("t", records.map { case (id, ts, p) =>
      DynRecord(id, java.sql.Timestamp.from(java.time.Instant.parse(ts)), p)
    })
    storeA.flush("t")

    val storeB = new TableStore(spark, tmpDir("xpathB"))
    val src = tmpDir("xpath-src")
    Files.writeString(Paths.get(src, "b.json"), records.map { case (id, ts, p) =>
      val fields = p.map {
        case (k, v: String) => s""""$k":"$v""""
        case (k, v) => s""""$k":$v"""
      }.mkString(",")
      s"""{"id":"$id","timestamp":"$ts",$fields}"""
    }.mkString("\n"))
    new StreamingIngest(storeB)
      .startDynamicJsonIngest("t", src, tmpDir("xpath-ckpt"))
      .awaitTermination(60000)

    def snap(s: TableStore) = s.read("t")
      .select("id", "timestamp", "num", "s", "flag", "date")
      .orderBy("id").collect().map(_.toSeq).toSeq
    assert(snap(storeA) == snap(storeB),
      s"paths diverge:\nbatch=${snap(storeA)}\nstream=${snap(storeB)}")
  }

  test("checkpoint makes re-run exactly-once (no duplicate ingestion)") {
    val root = tmpDir("stream2")
    val src = tmpDir("stream2-src")
    val ckpt = tmpDir("stream2-ckpt")
    val store = new TableStore(spark, root)
    val ing = new StreamingIngest(store)
    Files.writeString(Paths.get(src, "b1.json"),
      """{"id":"a","timestamp":"2024-01-01T10:00:00.000Z","v":1.0}""")
    ing.startJsonIngest("t", src, recSchema, ckpt).awaitTermination(60000)
    assert(store.read("t").count() == 1)
    // restart over the same checkpoint: the committed file is not re-read
    ing.startJsonIngest("t", src, recSchema, ckpt).awaitTermination(60000)
    assert(store.read("t").count() == 1)
    // new file after restart IS picked up
    Files.writeString(Paths.get(src, "b2.json"),
      """{"id":"c","timestamp":"2024-01-03T10:00:00.000Z","v":3.0}""")
    ing.startJsonIngest("t", src, recSchema, ckpt).awaitTermination(60000)
    assert(store.read("t").count() == 2)
  }

  test("commitBatch is idempotent: replaying the same batchId adds nothing") {
    import spark.implicits._
    val store = new TableStore(spark, tmpDir("idem"))
    store.ensureTable("t")
    val ing = new StreamingIngest(store)
    val dated = Seq(("a", java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 1.0))
      .toDF("id", "timestamp", "v")
      .withColumn("date", org.apache.spark.sql.functions.to_date(
        org.apache.spark.sql.functions.col("timestamp")))
    ing.commitBatch("t", "sA", 7L, dated)
    assert(store.read("t").count() == 1)
    // crash-replay simulation: the exact same batch commits again
    ing.commitBatch("t", "sA", 7L, dated)
    assert(store.read("t").count() == 1, "replayed batch must not duplicate rows")
    // a NEW batch id does append
    ing.commitBatch("t", "sA", 8L, dated)
    assert(store.read("t").count() == 2)
    // a DIFFERENT stream lineage reusing batchId 7 must append, not be
    // swallowed by lineage A's committed batch 7
    ing.commitBatch("t", "sB", 7L, dated)
    assert(store.read("t").count() == 3, "new lineage with recycled batchId must append")
  }

  test("deduped ingest: repeated ids within watermark land exactly once") {
    val root = tmpDir("sdd")
    val src = tmpDir("sdd-src")
    val store = new TableStore(spark, root)
    val ing = new StreamingIngest(store)
    Files.writeString(Paths.get(src, "b1.json"),
      """{"id":"dup","timestamp":"2024-01-01T10:00:00.000Z","v":1.0}
        |{"id":"dup","timestamp":"2024-01-01T10:00:01.000Z","v":2.0}
        |{"id":"other","timestamp":"2024-01-01T10:00:02.000Z","v":3.0}""".stripMargin)
    ing.startDedupedJsonIngest("t", src, recSchema, tmpDir("sdd-ckpt"))
      .awaitTermination(60000)
    assert(store.read("t").count() == 2) // dup collapsed, other kept
    // CDC parity: the surviving records produce INSERT events
    val cdc = ing.cdcLog("t").collect()
    assert(cdc.length == 2 && cdc.forall(_.getAs[String]("op") == "INSERT"))
  }

  test("deduped ingest: state survives a restart (dup after restart still dropped)") {
    val root = tmpDir("sddr")
    val src = tmpDir("sddr-src")
    val ckpt = tmpDir("sddr-ckpt")
    val store = new TableStore(spark, root)
    val ing = new StreamingIngest(store)
    Files.writeString(Paths.get(src, "b1.json"),
      """{"id":"k","timestamp":"2024-01-01T10:00:00.000Z","v":1.0}""")
    ing.startDedupedJsonIngest("t", src, recSchema, ckpt).awaitTermination(60000)
    assert(store.read("t").count() == 1)
    // RESTART over the same checkpoint, then re-send the same id within
    // the watermark horizon — the restored dedup state must drop it
    Files.writeString(Paths.get(src, "b2.json"),
      """{"id":"k","timestamp":"2024-01-01T10:30:00.000Z","v":2.0}
        |{"id":"k2","timestamp":"2024-01-01T10:31:00.000Z","v":3.0}""".stripMargin)
    ing.startDedupedJsonIngest("t", src, recSchema, ckpt).awaitTermination(60000)
    val vs = store.read("t").collect().map(_.getAs[Double]("v")).sorted.toSeq
    assert(vs == Seq(1.0, 3.0), s"dedup state lost across restart: $vs")
  }

  test("content-deduped ingest: identical content lands once across distinct ids") {
    val root = tmpDir("scd")
    val src = tmpDir("scd-src")
    val store = new TableStore(spark, root)
    val ing = new StreamingIngest(store)
    // same content under three different ids + one distinct doc
    Files.writeString(Paths.get(src, "b1.json"),
      """{"id":"a","timestamp":"2024-01-01T10:00:00.000Z","v":7.0}
        |{"id":"b","timestamp":"2024-01-01T10:00:01.000Z","v":7.0}
        |{"id":"c","timestamp":"2024-01-01T10:00:02.000Z","v":7.0}
        |{"id":"d","timestamp":"2024-01-01T10:00:03.000Z","v":9.0}""".stripMargin)
    ing.startContentDedupedJsonIngest("t", src, recSchema, tmpDir("scd-ckpt"),
      contentCols = Seq("v"))
      .awaitTermination(60000)
    val vs = store.read("t").collect().map(_.getAs[Double]("v")).sorted.toSeq
    assert(vs == Seq(7.0, 9.0), s"got $vs") // content-dup collapsed, ids ignored
  }

  test("sessionize: gap-based sessions with custom state") {
    import spark.implicits._
    def ev(u: Long, t: String, v: Double) =
      Sessionize.Event(u, Timestamp.valueOf(t), "x", v)
    val events = Seq(
      ev(1, "2024-01-01 10:00:00", 1), ev(1, "2024-01-01 10:10:00", 2),
      ev(1, "2024-01-01 12:00:00", 3), // > 30min gap → new session
      ev(2, "2024-01-01 09:00:00", 5)).toDS()
    val sessions = Sessionize.sessionize(events).collect()
    // closed sessions only (append mode): user1's first session
    assert(sessions.length == 1)
    val s0 = sessions.head
    assert(s0.user_id == 1 && s0.events == 2 && s0.total == 3.0)
  }

  test("sessionize: one hot user's large SHUFFLED batch yields the sorted-order sessions") {
    import spark.implicits._
    // 5 well-separated sessions of 40 events each, delivered in a fixed
    // shuffled order inside ONE batch — the interval-merge fold must
    // produce exactly the sessions an ordered delivery would, without
    // ever materializing the 200-event slice (it buffers live session
    // INTERVALS, one per session, not raw events)
    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val ordered = for (s <- 0 until 5; i <- 0 until 40) yield
      Sessionize.Event(7L, new Timestamp(
        base + s * 2 * Sessionize.GapMs + i * 1000L), "x", 1.0)
    val shuffled = new scala.util.Random(42).shuffle(ordered)
    val sessions = Sessionize.sessionize(spark.createDataset(shuffled).repartition(1))
      .collect().sortBy(_.startTs.getTime)
    // append mode: the 4 closed sessions emit, the 5th stays open
    assert(sessions.length == 4, s"got ${sessions.length} sessions")
    sessions.zipWithIndex.foreach { case (s, i) =>
      assert(s.events == 40 && s.total == 40.0, s"session $i: $s")
      assert(s.startTs.getTime == base + i * 2 * Sessionize.GapMs)
      assert(s.endTs.getTime == base + i * 2 * Sessionize.GapMs + 39 * 1000L)
    }
  }

  test("sessionize: idle user's trailing session flushes on event-time timeout") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ev(u: Long, t: String, v: Double) =
      Sessionize.Event(u, Timestamp.valueOf(t), "x", v)
    val ms = MemoryStream[Sessionize.Event]
    val sessions = Sessionize.sessionize(
      ms.toDS().withWatermark("ts", "1 minute"))
    val q = sessions.writeStream.format("memory").queryName("sess_to")
      .outputMode("append").start()
    try {
      // user 1 sends two events then goes idle
      ms.addData(ev(1, "2024-01-01 10:00:00", 1), ev(1, "2024-01-01 10:10:00", 2))
      q.processAllAvailable()
      assert(spark.table("sess_to").count() == 0) // session still open
      // another user's much-later event advances the watermark far past
      // user 1's gap horizon → user 1's open session must time out
      ms.addData(ev(2, "2024-01-01 14:00:00", 9))
      q.processAllAvailable()
      ms.addData(ev(2, "2024-01-01 14:00:01", 1)) // extra batch to fire timeouts
      q.processAllAvailable()
      val flushed = spark.table("sess_to").as[Sessionize.SessionOut].collect()
        .filter(_.user_id == 1)
      assert(flushed.length == 1, s"trailing session not flushed: ${flushed.toSeq}")
      assert(flushed.head.events == 2 && flushed.head.total == 3.0)
    } finally q.stop()
  }

  test("windowed streaming aggregation over memory-rate source shape (batch-check)") {
    // windowedCounts is a streaming transform; validate its plan shape on
    // a batch frame (same expressions compile for both)
    val events = graft.core.Tables.load(spark, Sf0001, "events")
    val out = new StreamingIngest(new TableStore(spark, tmpDir("w")))
      .windowedCounts(events, "1 hour", "1 hour")
    assert(out.columns.toSet == Set("window", "event_type", "n", "total"))
    assert(out.count() > 0)
  }
}
