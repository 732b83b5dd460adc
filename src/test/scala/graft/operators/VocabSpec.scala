package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** t21 vocabulary coverage + t22 OOV quality ratio. The DuckDB oracle
  * pins cross-engine equality at sf0.01; these pin the operator
  * CONTRACTS on frames where the right answer is computable by hand. */
class VocabSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "a a a b b c"),   // a×3 b×2 c×1
    (2L, "a b d"),         // d×1
    (3L, "a")              // total: a×5 b×3 c×1 d×1 → 10 occurrences
  ).toDF("doc_id", "text")

  test("vocabulary ranks by count then term, coverage reaches 1.0") {
    val v = TextAnalysis.vocabulary(docs, k = 10).collect()
    assert(v.map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq ==
      Seq((1L, "a", 5L), (2L, "b", 3L), (3L, "c", 1L), (4L, "d", 1L)))
    // cumulative coverage: 5/10, 8/10, 9/10, 10/10
    assert(v.map(_.getDouble(3)).toSeq == Seq(0.5, 0.8, 0.9, 1.0))
  }

  test("vocabulary truncates to k with the same ordering prefix") {
    val v = TextAnalysis.vocabulary(docs, k = 2).collect()
    assert(v.map(_.getString(1)).toSeq == Seq("a", "b"))
    assert(v.last.getDouble(3) == 0.8)
  }

  test("oovRatio counts occurrences outside the top-v vocabulary") {
    // v=2 keeps {a, b}; doc 1 has 1 OOV of 6, doc 2 has 1 of 3, doc 3 none
    val o = TextAnalysis.oovRatio(docs, v = 2, maxOovE4 = 3000L).collect()
    assert(o.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq((1L, 6L, 1L), (2L, 3L, 1L), (3L, 1L, 0L)))
    // ratios 1/6→0.1667 (half-up), 1/3→0.3333, 0/1→0
    assert(o.map(_.getDouble(3)).toSeq == Seq(0.1667, 0.3333, 0.0))
    // keep gate at 0.30 E4: 10000·1 ≤ 3000·6 true; 10000·1 ≤ 3000·3 false
    assert(o.map(_.getBoolean(4)).toSeq == Seq(true, false, true))
  }

  test("the keep gate compares the raw rational, not the rounded display") {
    // 3 OOV of 10 tokens = exactly the 0.3 threshold → keep (≤ is inclusive)
    val d = Seq((1L, "a a a a a a a x x x")).toDF("doc_id", "text")
    val o = TextAnalysis.oovRatio(d, v = 1, maxOovE4 = 3000L).collect()
    assert(o.head.getLong(2) == 3L && o.head.getBoolean(4))
  }

  test("empty text is a zero-OOV single-token artifact, not a crash") {
    val d = Seq((1L, "")).toDF("doc_id", "text")
    val o = TextAnalysis.oovRatio(d, v = 1).collect()
    assert(o.head.getLong(1) == 1L) // split('',' ') = [""] on both engines
  }
}
