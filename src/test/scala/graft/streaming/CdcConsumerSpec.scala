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
}
