package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, SemanticDedup}

/** Pins the oracle-export contracts the r14 no_oracle→oracle
  * conversion leans on (SparkEntry.oracleExports): the exported frame
  * must be EXACTLY the frame the query derives internally, or the
  * driver oracle validates the wrong input. Each export rides a
  * determinism argument — these specs make that argument executable. */
class OracleExportsSpec extends SparkSpec {

  test("every oracleExports entry names a real query and yields rows") {
    SparkEntry.oracleExports.foreach { case (ename, (qname, fn)) =>
      assert(SparkEntry.queries.contains(qname),
        s"export $ename references unknown query $qname")
      assert(SparkEntry.oracleSql.contains(qname),
        s"export $ename's query $qname has no oracle to consume it")
      assert(SparkEntry.oracleSql(qname).contains(s"__EXPORTS__/$ename"),
        s"$qname's oracle SQL never reads __EXPORTS__/$ename")
      assert(fn(spark, Sf0001).count() > 0, s"export $ename is empty")
    }
  }

  test("d03 signature export is the frame the query's pairs derive from") {
    // simhash() and the export share simhashSigFrame by construction;
    // pin the shared derivation against an inline recomputation so a
    // refactor that forks them fails here, not in the driver gate
    val docs = graft.core.Tables.load(spark, Sf0001, "documents")
    val exported = Dedup.simhashSigs(spark, Sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val inline = docs.select(col("doc_id"),
        graft.functions.LshFunctions.simhashSig(
          spark, split(col("text"), " ")).as("simhash"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exported === inline)
  }

  test("d15 centroid export equals a second training run (determinism)") {
    // kmeansCentroids must be deterministic for the export to carry
    // the SAME centroids the d15 query trained internally: two
    // independent trainings in the same JVM must agree bit-for-bit
    val a = SemanticDedup.trainedCentFrame(spark, Sf0001)
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1))).sortBy(_._1)
    val b = SemanticDedup.trainedCentFrame(spark, Sf0001)
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1))).sortBy(_._1)
    assert(a === b)
    assert(a.nonEmpty && a.head._2.nonEmpty)
  }

  test("d15b centroid export reads the persisted index's frozen geometry") {
    val cents = SemanticDedup.indexCentFrame(spark, Sf0001, 3)
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1))).sortBy(_._1)
    // a second call must see the SAME frozen centroids (ensure() is
    // idempotent — the export cannot retrain and drift from what the
    // d15b query probed under)
    val again = SemanticDedup.indexCentFrame(spark, Sf0001, 3)
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1))).sortBy(_._1)
    assert(cents === again)
    assert(cents.map(_._1).toSeq === cents.indices.map(_.toLong))
  }

  test("s02-s05 ANN exports: a second run reproduces the approx frame bit-for-bit") {
    // the export re-runs the approximate query (hash-derived planes,
    // seeded k-center training, frozen persisted quantizer) — the
    // recall the oracle recomputes from it is only the recall the
    // checked query measured if the two runs agree exactly
    import graft.operators.Similarity
    def sets(df: org.apache.spark.sql.DataFrame) = df
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    Seq[(String, () => org.apache.spark.sql.DataFrame)](
      ("s02", () => Similarity.annLsh(spark, Sf0001)),
      ("s03", () => Similarity.annIvf(spark, Sf0001)),
      ("s04", () => Similarity.annIvfPq(spark, Sf0001)),
      ("s05", () => Similarity.annIvfPqIndexed(spark, Sf0001))
    ).foreach { case (name, mk) =>
      val a = sets(mk()); val b = sets(mk())
      assert(a === b, s"$name approx frame not deterministic across runs")
      assert(a.nonEmpty)
    }
  }
}
