package graft.operators

import graft.SparkSpec

/** Sanity specs for the training-pipeline operators. Full value-level
  * correctness is covered by the DuckDB oracle gate (SparkEntry); these
  * pin the cross-operator invariants the oracle can't express. */
class PipelineOpsSpec extends SparkSpec {

  test("minhash-LSH finds exactly the exact-jaccard pairs (recall 1.0 at τ=0.8)") {
    val lsh = Dedup.minhashLsh(spark, Sf001).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    val exact = Dedup.ngramJaccard(spark, Sf001).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(lsh == exact, "banded LSH (32×2) should not miss τ≥0.8 pairs")
    assert(exact.nonEmpty) // 25 planted near-dup pairs at sf0.01
  }

  test("simhash hamming pairs cover the planted near-dups") {
    val sim = Dedup.simhash(spark, Sf001).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    val planted = Dedup.ngramJaccard(spark, Sf001).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(planted.subsetOf(sim), s"missing: ${planted -- sim}")
  }

  test("ann LSH results are a subset of brute-force ordering universe") {
    val brute = Similarity.annBrute(spark, Sf001).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val lsh = Similarity.annLsh(spark, Sf001).collect()
    assert(lsh.nonEmpty)
    // every LSH row is a real vector pair with rank ≤ 10
    assert(lsh.forall(_.getAs[Long]("rank") <= 10))
    // recall sanity: at least 30% of true top-10 found by multi-probe LSH
    val hits = lsh.map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")))
      .count(brute.contains)
    assert(hits >= brute.size * 3 / 10, s"recall too low: $hits/${brute.size}")
  }

  test("ann IVF recall: k-means cells at nprobe 6/16 reach >=60% of true top-10") {
    val brute = Similarity.annBrute(spark, Sf001).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val ivf = Similarity.annIvf(spark, Sf001).collect()
    assert(ivf.nonEmpty)
    val hits = ivf.map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")))
      .count(brute.contains)
    assert(hits >= brute.size * 6 / 10, s"IVF recall too low: $hits/${brute.size}")
  }

  test("dedup exact groups every doc (no dups in corpus → n groups)") {
    val n = graft.core.Tables.load(spark, Sf001, "documents").count()
    val groups = Dedup.exact(spark, Sf001)
    assert(groups.count() == n)
    assert(groups.filter("n_copies > 1").count() == 0)
  }

  test("ngram candidate fan-out is df-capped (planted stop-shingle)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // 100 docs all sharing stop-shingle 999; docs 1 and 2 additionally
    // share 9 rare shingles (a true near-dup pair)
    val stop = 999L
    val docs = (1 to 100).map { i =>
      val own: Seq[Long] =
        if (i <= 2) (1L to 9L) :+ (1000L + i) // 9 shared + 1 unique
        else (0 until 10).map(j => 10000L + i * 100L + j)
      (i.toLong, own :+ stop)
    }.toDF("doc_id", "hs")
    val cands = Dedup.ngramCandidates(docs, dfCap = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // without the cap the stop-shingle alone emits 100·99/2 = 4950 pairs
    assert(cands == Set((1L, 2L)),
      s"expected only the planted pair, got ${cands.size} candidates")
  }

  test("embedding LSH near-dup equals the brute-force pair set (recall 1.0)") {
    import org.apache.spark.sql.functions._
    import graft.functions.VectorFunctions
    // independent all-pairs reference, built here so the shipped query
    // never needs a cross join
    val e = graft.core.Tables.load(spark, Sf001, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("norm", VectorFunctions.norm(spark, col("v")))
    val a = e.select(col("vec_id").as("vec_a"), col("v").as("va"), col("norm").as("na"))
    val b = e.select(col("vec_id").as("vec_b"), col("v").as("vb"), col("norm").as("nb"))
    val brute = a.crossJoin(b).filter(col("vec_a") < col("vec_b"))
      .withColumn("cosine", VectorFunctions.dot(spark, col("va"), col("vb")) / (col("na") * col("nb")))
      .filter(col("cosine") >= 0.45)
      .select(col("vec_a"), col("vec_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.embeddingNearDup(spark, Sf001).collect()
      .map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b"))).toSet
    assert(lsh == brute,
      s"missed=${(brute -- lsh).take(5)} extra=${(lsh -- brute).take(5)} " +
        s"(${lsh.size} vs ${brute.size})")
    assert(brute.nonEmpty, "corpus has no near-dup pairs — test is vacuous")
  }
}
