package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import graft.catalog.TableStore
import graft.ingest.DynRecord
import graft.mutate.Mutations

class CdcConsumerSpec extends SparkSpec {

  private def rec(id: String, v: Int) =
    DynRecord(id, Timestamp.valueOf("2024-01-01 00:00:00"), Map("v" -> v))

  test("consumer groups track independent persisted cursors") {
    val store = new TableStore(spark, tmpDir("cdc"))
    store.write("t", Seq(rec("a", 1), rec("b", 2), rec("c", 3)))
    store.flush("t")
    val mut = new Mutations(store)
    mut.deleteById("t", "a")
    mut.updateById("t", rec("b", 20))

    val g1 = new CdcConsumer(store, "t", "g1")
    val first = g1.poll().collect()
    assert(first.map(_.getAs[String]("op")).sorted.toSeq == Seq("DELETE", "UPDATE"))
    g1.commit()
    assert(g1.poll().count() == 0, "committed events must not re-deliver")

    // NO sleep: emitted_at is strictly-increasing micros, so an event in
    // the same wall-clock millisecond as the committed cursor must still
    // be delivered
    mut.deleteById("t", "c")
    val next = g1.poll().collect()
    assert(next.length == 1 && next.head.getAs[String]("op") == "DELETE"
      && next.head.getAs[String]("id") == "c")

    // an independent group sees the full history
    val g2 = new CdcConsumer(store, "t", "g2")
    assert(g2.poll().count() == 3)

    // uncommitted polls re-deliver (at-least-once)
    assert(g2.poll().count() == 3)

    // cursor survives a consumer restart
    g1.commit()
    val g1b = new CdcConsumer(store, "t", "g1")
    assert(g1b.committed() == g1.committed() && g1b.committed() > 0)
    assert(g1b.poll().count() == 0)
  }

  test("CdcTransport seam: rebinding reroutes every producer, no call-site edits") {
    // the reference's subscription-manager seam: a deployment with a
    // kafka client binds its transport here and mutations/ingest
    // publish through it untouched. A recording binding proves the
    // call sites read the seam (and the file log stays silent).
    val store = new TableStore(spark, tmpDir("cdcseam"))
    store.write("t", Seq(rec("a", 1), rec("b", 2), rec("c", 3)))
    store.flush("t")
    val seen = scala.collection.mutable.ArrayBuffer[(String, String, String)]()
    val recording = new CdcTransport {
      def publish(s: TableStore, table: String, op: String,
          rows: Seq[(String, Timestamp)], batchId: Long): Unit =
        rows.foreach { case (id, _) => seen += ((table, op, id)) }
      def publishFrame(s: TableStore, table: String, op: String,
          rows: org.apache.spark.sql.DataFrame, batchId: Long): Unit =
        rows.collect().foreach(r => seen += ((table, op, r.getString(0))))
      def publishBatch(s: TableStore, table: String, sliceKey: String,
          events: org.apache.spark.sql.DataFrame): Unit =
        events.collect().foreach(r =>
          seen += ((table, r.getString(0), r.getString(1))))
    }
    CdcTransport.bind(store, recording)
    try {
      val mut = new Mutations(store)
      mut.deleteById("t", "a")
      mut.updateById("t", rec("b", 20))
      mut.deleteWhere("t", org.apache.spark.sql.functions.col("id") === "c")
      assert(seen.toSet === Set(
        ("t", "DELETE", "a"), ("t", "UPDATE", "b"), ("t", "DELETE", "c")))
      // nothing leaked into the file log past the rebound seam
      assert(CdcLog.read(store, "t").count() == 0,
        "a producer bypassed the bound CdcTransport")
    } finally CdcTransport.unbind(store)
    // unbound, the store falls back to the default file binding
    new Mutations(store).deleteById("t", "b")
    val events = CdcLog.read(store, "t").collect()
    assert(events.length == 1 && events.head.getAs[String]("id") == "b")
  }

  test("CdcTransport bindings are per store: two stores in one JVM route independently") {
    // the r16 verdict's deployment-shaped seam: a JVM hosting two
    // stores must be able to bind different transports — a
    // process-global binding cannot (rebinding for one store would
    // hijack the other's events).
    val storeA = new TableStore(spark, tmpDir("cdcA"))
    val storeB = new TableStore(spark, tmpDir("cdcB"))
    Seq(storeA, storeB).foreach { st =>
      st.write("t", Seq(rec("a", 1))); st.flush("t")
    }
    val seenA = scala.collection.mutable.ArrayBuffer[String]()
    val recording = new CdcTransport {
      def publish(s: TableStore, table: String, op: String,
          rows: Seq[(String, Timestamp)], batchId: Long): Unit =
        rows.foreach { case (id, _) => seenA += s"$op:$id" }
      def publishFrame(s: TableStore, table: String, op: String,
          rows: org.apache.spark.sql.DataFrame, batchId: Long): Unit = ()
      def publishBatch(s: TableStore, table: String, sliceKey: String,
          events: org.apache.spark.sql.DataFrame): Unit = ()
    }
    CdcTransport.bind(storeA, recording)
    try {
      new Mutations(storeA).deleteById("t", "a")
      new Mutations(storeB).deleteById("t", "a")
      // A went to its binding; B stayed on the default file log
      assert(seenA.toSeq == Seq("DELETE:a"))
      assert(CdcLog.read(storeA, "t").count() == 0)
      assert(CdcLog.read(storeB, "t").count() == 1)
    } finally CdcTransport.unbind(storeA)
  }

  test("retention drops slices all groups committed past; lagging cursors stay valid") {
    val store = new TableStore(spark, tmpDir("cdcret"))
    store.write("t", Seq(rec("a", 1)))
    store.flush("t")
    val mut = new Mutations(store)
    mut.deleteById("t", "a") // slice 1 (DELETE)

    val fast = new CdcConsumer(store, "t", "fast")
    val slow = new CdcConsumer(store, "t", "slow")
    assert(fast.poll().count() == 1); fast.commit()
    assert(slow.poll().count() == 1) // polled, never committed

    // slow's cursor is 0 → committed low-water is 0 → nothing droppable
    assert(CdcLog.applyRetention(store, "t") == 0)
    assert(slow.poll().count() == 1, "uncommitted events must survive retention")

    slow.commit()
    store.write("t", Seq(rec("b", 2)))
    store.flush("t")
    mut.deleteById("t", "b") // slice 2, past both cursors
    // both groups committed past slice 1 only → exactly slice 1 dropped
    assert(CdcLog.applyRetention(store, "t") == 1)
    // lagging-but-valid cursors: both groups still see the uncommitted slice
    assert(fast.poll().count() == 1 && slow.poll().count() == 1)
    fast.commit(); slow.commit()
    assert(CdcLog.applyRetention(store, "t") == 1, "fully-committed slice trims")
    assert(fast.poll().count() == 0 && slow.poll().count() == 0)
  }

  test("retention racing an in-flight poll: poll returns survivors, never throws") {
    val store = new TableStore(spark, tmpDir("cdcrace"))
    store.write("t", Seq(rec("a", 1)))
    store.flush("t")
    val mut = new Mutations(store)
    mut.deleteById("t", "a") // slice 1
    mut.updateById("t", rec("a", 2)) // slice 2

    val g = new CdcConsumer(store, "t", "g")
    // poll() snapshots eagerly: the DataFrame a caller holds must stay
    // fully consumable even if retention drops every slice before the
    // caller gets around to collecting it
    val inFlight = g.poll()
    val future = System.currentTimeMillis() * 1000L + 3600L * 1000000L
    assert(CdcLog.applyRetention(store, "t", maxAgeMicros = Some(0L),
      nowMicros = future) == 2, "both slices age-trimmed under the poll")
    val rows = inFlight.collect() // files are gone; snapshot must not care
    assert(rows.length == 2, "pre-retention poll delivers the full snapshot")
    // the mark poll() recorded came from the same snapshot → commit is
    // consistent with what was delivered
    g.commit()
    assert(g.poll().count() == 0)

    // and a FRESH read after the trim sees the empty log, not an error
    assert(CdcLog.read(store, "t").count() == 0)
  }

  test("two concurrent first-contact consumers for one group both construct") {
    val store = new TableStore(spark, tmpDir("cdcreg"))
    store.write("t", Seq(rec("a", 1)))
    store.flush("t")
    new Mutations(store).deleteById("t", "a")

    // race many first-contacts for the SAME fresh group: the loser of
    // the exists→create race must proceed, not throw
    // FileAlreadyExistsException out of the constructor
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    try {
      val barrier = new java.util.concurrent.CyclicBarrier(8)
      val futures = (1 to 8).map { _ =>
        pool.submit(new java.util.concurrent.Callable[CdcConsumer] {
          def call(): CdcConsumer = {
            barrier.await()
            new CdcConsumer(store, "t", "fresh")
          }
        })
      }
      val consumers = futures.map(_.get()) // .get() rethrows any failure
      assert(consumers.forall(_.committed() == 0L))
    } finally pool.shutdown()
    // the registered group participates in retention low-water as usual
    assert(CdcLog.groups(store, "t").contains("fresh"))
    assert(CdcLog.applyRetention(store, "t") == 0,
      "uncommitted fresh group holds the low-water at 0")
  }

  test("age-based retention trims past an uncommitted group (lossy, opt-in)") {
    val store = new TableStore(spark, tmpDir("cdcage"))
    store.write("t", Seq(rec("a", 1)))
    store.flush("t")
    new Mutations(store).deleteById("t", "a")
    val g = new CdcConsumer(store, "t", "g")
    assert(g.poll().count() == 1) // never committed

    // with no age cutoff the uncommitted slice is retained
    assert(CdcLog.applyRetention(store, "t") == 0)
    // an age cutoff in the future (maxAge=0 as of "now"+1h) trims it
    val future = System.currentTimeMillis() * 1000L + 3600L * 1000000L
    assert(CdcLog.applyRetention(store, "t", maxAgeMicros = Some(0L),
      nowMicros = future) == 1)
    // the group's cursor stays usable: poll returns what survived
    assert(g.poll().count() == 0)
  }
}
