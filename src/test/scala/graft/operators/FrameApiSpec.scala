package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The operators as a LIBRARY: every pipeline op runs on arbitrary
  * user DataFrames carrying the canonical columns, not just the
  * benchmark tables the (SparkSession, dir) wrappers bind. */
class FrameApiSpec extends SparkSpec {

  private def docsDf(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("dedup ops accept arbitrary document frames") {
    val docs = docsDf(
      1L -> "the quick brown fox jumps over the lazy dog today",
      2L -> "the quick brown fox jumps over the lazy dog today", // exact dup of 1
      3L -> "the quick brown fox jumps over the lazy cat today", // near-dup of 1
      4L -> "completely different content with no overlap at all")
    val ex = Dedup.exact(docs).collect()
    assert(ex.length == 3) // 1+2 collapse
    assert(ex.map(_.getAs[Long]("n_copies")).sum == 4)
    val mh = Dedup.minhashLsh(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(mh.contains((1L, 2L)), s"exact dup pair missing from $mh")
    val sh = Dedup.simhash(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(sh.contains((1L, 2L)))
    val ng = Dedup.ngramJaccard(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ng.contains((1L, 2L)))
  }

  test("embedding ops accept arbitrary vector frames") {
    import spark.implicits._
    // clustered vectors: 0/1 nearly parallel, 2 orthogonal-ish
    val vecs = Seq(
      (0L, Seq(1.0, 0.0, 0.0, 0.1)),
      (1L, Seq(0.99, 0.05, 0.0, 0.1)),
      (2L, Seq(0.0, 1.0, 0.2, 0.0)),
      (3L, Seq(0.01, 0.98, 0.21, 0.0))).toDF("vec_id", "embedding")
    val near = Dedup.embeddingNearDup(vecs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(near.contains((0L, 1L)) && near.contains((2L, 3L)), s"got $near")
    val brute = Similarity.annBrute(vecs, vecs.filter(col("vec_id") === 0L), k = 2)
      .collect()
    assert(brute.head.getAs[Long]("neighbor_id") == 1L) // nearest to 0 is 1
  }

  test("text ops accept arbitrary document frames") {
    val docs = docsDf(
      10L -> "reach me at someone@example.org or 192.168.0.1 thanks",
      11L -> "no pii in this one")
    val pii = TextAnalysis.piiRedaction(docs).collect()
    assert(pii(0).getAs[Long]("n_emails") == 1 && pii(0).getAs[Long]("n_ips") == 1)
    assert(pii(1).getAs[Long]("n_emails") == 0)
    val decon = TextAnalysis.decontaminate(
      trainDocs = docsDf(1L -> "alpha beta gamma delta epsilon zeta"),
      benchmarkDocs = docsDf(99L -> "alpha beta gamma delta epsilon"))
      .collect()
    assert(decon.length == 1 && decon(0).getAs[Long]("n_shared") >= 1)
    val rep = TextAnalysis.repetition(docsDf(5L -> "x y x y x y x y")).collect()
    assert(rep(0).getAs[Double]("rep_ratio") > 0.5)
  }
}
