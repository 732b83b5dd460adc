package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.catalog.TableStore

/** Reusable contract suite for [[CdcTransport]] bindings — the three
  * transport laws from the seam's scaladoc, extracted so any FUTURE
  * binding (Kafka, Redis Streams — deployment-blocked here, see
  * COVERAGE.md) inherits the exact checks the file binding passes
  * today. Mix into a `SparkSpec` and provide the binding plus a way to
  * read its published events back as [[CdcLog.Schema]]-shaped rows.
  *
  * Laws (what [[CdcConsumer]] cursor correctness rests on):
  *  1. SHARED EMISSION CLOCK — `publish`/`publishFrame` stamp
  *     `emitted_at` from the one strictly-increasing clock
  *     ([[CdcLog.nextEmittedAt]]); a binding growing a second clock
  *     re-opens the cursor-straddle hole, observable as a later
  *     publish sorting before an earlier one.
  *  2. REPLAY IDEMPOTENCE — `publishBatch` re-published under the same
  *     `sliceKey` replaces, never duplicates (Structured Streaming
  *     replays micro-batches after failure).
  *  3. FRAME COMPLETENESS — `publishFrame` delivers every row of a
  *     distributed victim frame under ONE emission stamp (bulk events
  *     must not be re-stamped per row, or a consumer cursor could
  *     split a single logical mutation).
  */
trait CdcTransportContract { this: SparkSpec =>

  /** Display name of the binding under test. */
  def transportName: String

  /** The binding under test, for a given store. */
  def transportFor(store: TableStore): CdcTransport

  /** Read back everything the binding published for (store, table),
    * [[CdcLog.Schema]]-shaped. For a broker-backed binding this is the
    * broker consumer; for the file binding it is [[CdcLog.read]]. */
  def readBack(store: TableStore, table: String): DataFrame

  private def freshStore(tag: String): TableStore =
    new TableStore(spark, tmpDir(tag))

  private val T0 = Timestamp.valueOf("2024-01-01 00:00:00")

  test(s"$transportName law 1: publishes stamp one strictly-increasing emission clock") {
    val store = freshStore("cdclaw1")
    val t = transportFor(store)
    t.publish(store, "t", "DELETE", Seq("a" -> T0))
    // an interleaved publish from the engine's OWN producer path must
    // land on the same clock — a binding-private clock would let this
    // sort after the binding's next publish
    CdcLog.append(store, "t", "UPDATE", Seq("b" -> T0))
    import spark.implicits._
    t.publishFrame(store, "t", "DELETE",
      Seq(("c", T0), ("d", T0)).toDF("id", "timestamp"))
    t.publish(store, "t", "UPDATE", Seq("e" -> T0))
    val rows = readBack(store, "t")
      .orderBy(col("emitted_at"), col("id")).collect()
    assert(rows.map(_.getAs[String]("id")).toSeq ==
      Seq("a", "b", "c", "d", "e"),
      "emission order must follow publish order across producers — one clock")
    val stamps = rows.map(_.getAs[Timestamp]("emitted_at").getTime)
    assert(stamps.distinct.length >= 4,
      "distinct publishes must carry distinct (strictly-increasing) stamps")
    assert(stamps.sameElements(stamps.sorted), "stamps must be monotone")
  }

  test(s"$transportName law 2: publishBatch is replay-idempotent on sliceKey") {
    val store = freshStore("cdclaw2")
    val t = transportFor(store)
    import spark.implicits._
    def batch(ids: String*): DataFrame = {
      val now = CdcLog.nextEmittedAt()
      ids.map(id => ("INSERT", id, T0, 7L, now))
        .toDF("op", "id", "timestamp", "batch_id", "emitted_at")
    }
    t.publishBatch(store, "t", "s1-b7", batch("a", "b"))
    t.publishBatch(store, "t", "s1-b7", batch("a", "b")) // replay: replace
    t.publishBatch(store, "t", "s1-b8", batch("c"))
    val got = readBack(store, "t").select("id").as[String].collect().sorted
    assert(got.toSeq == Seq("a", "b", "c"),
      s"replayed slice must replace, never duplicate (got ${got.mkString(",")})")
  }

  test(s"$transportName law 3: publishFrame delivers a distributed frame completely, one stamp") {
    val store = freshStore("cdclaw3")
    val t = transportFor(store)
    import spark.implicits._
    val victims = (0 until 100).map(i => (s"v$i", T0))
      .toDF("id", "timestamp").repartition(8) // genuinely multi-partition
    t.publishFrame(store, "t", "DELETE", victims)
    val rows = readBack(store, "t").collect()
    assert(rows.length == 100, "every victim row must be published")
    assert(rows.map(_.getAs[Timestamp]("emitted_at")).distinct.length == 1,
      "one bulk mutation = one emission stamp")
    assert(rows.forall(_.getAs[String]("op") == "DELETE"))
  }
}

/** The file binding instantiates the contract — the laws any future
  * broker binding must also pass. */
class FileCdcTransportContractSpec extends SparkSpec with CdcTransportContract {
  def transportName: String = "FileCdcTransport"
  def transportFor(store: TableStore): CdcTransport = FileCdcTransport
  def readBack(store: TableStore, table: String): DataFrame =
    CdcLog.read(store, table)
}
