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

  test("bm25 ranks rarer-term and higher-tf docs above common-term docs") {
    val docs = docsDf(
      1L -> "spark spark spark engine engine runs fast",
      2L -> "spark engine runs fast on the cluster",
      3L -> "engine engine engine engine runs fine today",
      4L -> "nothing relevant in this document at all")
    val scored = TextAnalysis.bm25(docs, Seq("spark", "engine"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("bm25")).toMap
    assert(!scored.contains(4L), "doc without any query term must be excluded")
    // 'spark' (df 2) is rarer than 'engine' (df 3): doc 1 (tf_spark 3)
    // must outscore doc 2 (tf_spark 1); all matched scores positive
    assert(scored(1L) > scored(2L), s"got $scored")
    assert(scored.values.forall(_ > 0))
    val top = TextAnalysis.bm25TopK(docs, Seq("spark", "engine"), 2)
      .collect().map(_.getAs[Long]("doc_id"))
    assert(top.length == 2 && top.head == 1L, s"got ${top.toSeq}")
  }

  test("tf-idf keywords rank rare terms over ubiquitous ones") {
    val docs = docsDf(
      1L -> "common common common zebra common common",
      2L -> "common words fill this doc entirely now",
      3L -> "common words appear here too again today")
    val kw = TextAnalysis.keywords(docs, k = 2).collect()
      .groupBy(_.getAs[Long]("doc_id"))
    // 'zebra' (df 1) beats 'common' (df 3, idf ln(4/4)=0) despite tf 5
    assert(kw(1L).head.getAs[String]("term") == "zebra", s"got ${kw(1L).toSeq}")
    // a term in every doc scores exactly 0
    val common = TextAnalysis.keywords(docs, k = 10).collect()
      .filter(_.getAs[String]("term") == "common")
    assert(common.forall(_.getAs[Double]("tfidf") == 0.0))
    // ranks are 1..k with non-increasing scores
    kw.values.foreach { rows =>
      val sorted = rows.sortBy(_.getAs[Long]("rank"))
      assert(sorted.map(_.getAs[Long]("rank")).toSeq == (1L to sorted.length))
      val s = sorted.map(_.getAs[Double]("tfidf"))
      assert(s.zip(s.tail).forall { case (a, b) => a >= b })
    }
  }

  test("LM perplexity scores in-distribution text below gibberish") {
    // reference split: natural-ish english bigrams
    val ref = docsDf(
      1L -> "the cat sat on the mat and the dog sat on the rug",
      2L -> "the dog ran to the cat and sat on the mat again",
      3L -> "a cat and a dog sat on a mat near the door")
    val train = docsDf(
      10L -> "the cat sat on the mat",            // every bigram seen in ref
      11L -> "zqx vbn plk mno qwe rty")           // nothing seen
    val r = TextAnalysis.lmPerplexity(train, ref).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getDouble(2))).toMap
    assert(r(10L)._1 == 5 && r(11L)._1 == 5) // 6 tokens → 5 bigrams each
    assert(r(10L)._2 < r(11L)._2,
      s"in-distribution text must score lower nll: $r")
    // the unseen-everything doc scores exactly the smoothing floor:
    // every bigram gets ln(1/V)
    val vocab = ref.select(explode(split(col("text"), " "))).distinct().count()
    assert(math.abs(r(11L)._2 - math.log(vocab.toDouble)) < 5e-5)
    // a doc with <2 tokens has no bigrams and is absent, not NaN
    val short = TextAnalysis.lmPerplexity(docsDf(20L -> "solo"), ref).collect()
    assert(short.isEmpty)
  }

  test("substring dedup coverage counts shared 8-token windows only") {
    val span = "one two three four five six seven eight nine ten"
    val docs = docsDf(
      1L -> s"$span unique suffix alpha",
      2L -> s"different prefix beta $span",   // shares the span with 1
      3L -> "entirely unrelated words filling out this long document here",
      4L -> "short doc")                      // < 8 tokens: no windows
    val r = Dedup.substringDedup(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_windows"), r.getAs[Long]("n_dup_windows"))).toMap
    assert(!r.contains(4L), "doc with <8 tokens has no windows")
    // the 10-token shared span has 3 8-token windows, all shared
    assert(r(1L)._2 == 3 && r(2L)._2 == 3, s"got $r")
    assert(r(3L)._2 == 0)
    // intra-doc repetition does NOT count as duplication across docs
    val solo = Dedup.substringDedup(docsDf(
      9L -> s"$span $span",
      8L -> "completely different filler text with many distinct tokens here"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_dup_windows")).toMap
    assert(solo(9L) == 0, s"intra-doc repeats must not self-count: $solo")
  }
}
