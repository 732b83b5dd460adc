package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.core.Tables

/** Sequence packing ([[Packing.sequencePacking]]): the distributed
  * two-phase prefix sum must equal the sequential definition exactly,
  * and the plan must never put a corpus-sized frame through a
  * single-partition window. */
class PackingSpec extends SparkSpec {
  import spark.implicits._

  test("spans equal the sequential concat-and-split computation") {
    val docs = Tables.load(spark, Sf0001, "documents")
    val budget = 64L
    val got = Packing.sequencePacking(docs, budget)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    // sequential reference: one pass in doc_id order
    val counts = docs
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long"))
      .as[(Long, Long)].collect().sortBy(_._1)
    var off = 0L
    val want = counts.map { case (id, n) =>
      val row = (id, n, off, off / budget, (off + n - 1) / budget)
      off += n
      row
    }
    assert(got.toSeq === want.toSeq)
  }

  test("documents straddle cuts: some spans cross a sequence boundary") {
    val docs = Tables.load(spark, Sf0001, "documents")
    val spans = Packing.sequencePacking(docs, 64L)
    // budget 64 < typical doc length ⇒ straddles must exist, and every
    // span is well-formed
    assert(spans.filter(col("last_seq") > col("first_seq")).count() > 0)
    assert(spans.filter(col("last_seq") < col("first_seq")).count() === 0)
    assert(spans.filter(col("start_off") < 0).count() === 0)
  }

  test("total packed length is the corpus token total") {
    val docs = Tables.load(spark, Sf0001, "documents")
    val spans = Packing.sequencePacking(docs, 2048L)
    val total = docs.select(sum(size(split(col("text"), " ")).cast("long")))
      .as[Long].head()
    val end = spans.agg(max(col("start_off") + col("n_tokens"))).as[Long].head()
    assert(end === total)
  }

  test("no corpus-sized single-partition window in the plan") {
    val docs = Tables.load(spark, Sf0001, "documents")
    val plan = Packing.sequencePacking(docs, 2048L)
      .queryExecution.executedPlan.toString
    // the corpus window partitions by pid; the only SinglePartition
    // exchanges feed the tiny per-bucket-totals window and the
    // final presentation sort — assert the corpus window is the
    // partitioned one
    assert(plan.contains("hashpartitioning(pid"))
    // the bucket id must be the deterministic arithmetic bucket, never
    // spark_partition_id over a range exchange (per-subtree boundary
    // sampling — see the Packing scaladoc for the measured failure)
    assert(!plan.contains("SPARK_PARTITION_ID"))
    assert(!plan.contains("REPARTITION_BY_COL"))
  }
}
