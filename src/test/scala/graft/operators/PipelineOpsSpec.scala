package graft.operators

import graft.SparkSpec

/** Sanity specs for the training-pipeline operators. Full value-level
  * correctness is covered by the DuckDB oracle gate (SparkEntry); these
  * pin the cross-operator invariants the oracle can't express. */
class PipelineOpsSpec extends SparkSpec {

  test("segment dedup (t26): first global occurrence survives, dup/kept arithmetic exact") {
    val s2 = spark
    import s2.implicits._
    def seg(c: Char) = (1 to 10).map(i => s"$c$i").mkString(" ")
    val a = seg('a'); val b = seg('b'); val c = seg('c')
    val docs = Seq(
      (1L, s"$a $b"),      // both segments first occurrences
      (2L, s"$a $c"),      // segment A duplicates doc 1's
      (3L, s"$a $b"),      // verbatim copy of doc 1: everything dup
      (4L, "x1 x2 x3"))    // one partial 3-token segment
      .toDF("doc_id", "text")
    val got = TextAnalysis.segmentDedup(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got === Array(
      (1L, 2L, 0L, 20L), (2L, 2L, 1L, 10L),
      (3L, 2L, 2L, 0L), (4L, 1L, 0L, 3L)))
    // intra-doc repetition: the second occurrence INSIDE one doc is a
    // dup too (position packs doc_id and offset into one ordered long)
    val rep = Seq((7L, s"$a $a")).toDF("doc_id", "text")
    val r = TextAnalysis.segmentDedup(rep).collect().head
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) === ((2L, 1L, 10L)))
    // d11's plan shape: one window keyed on the segment hash, never a
    // corpus-sized single-partition window
    val plan = TextAnalysis.segmentDedup(docs)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SPARK_PARTITION_ID"))
  }

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
    // recall floor for the 8-table × 6-bit multi-probe family; actual
    // measured recall at sf0.01 prints below for floor calibration
    val hits = lsh.map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")))
      .count(brute.contains)
    info(s"ann-lsh recall: $hits/${brute.size}")
    assert(hits >= brute.size * 8 / 10, s"recall too low: $hits/${brute.size}")
  }

  test("ann IVF recall: k-means cells at nprobe 12/32 reach >=80% of true top-10") {
    val brute = Similarity.annBrute(spark, Sf001).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val ivf = Similarity.annIvf(spark, Sf001).collect()
    assert(ivf.nonEmpty)
    val hits = ivf.map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")))
      .count(brute.contains)
    info(s"ann-ivf recall: $hits/${brute.size}") // measured 46/50 at calibration
    assert(hits >= brute.size * 8 / 10, s"IVF recall too low: $hits/${brute.size}")
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

  test("pii redaction: augmented docs lose their email/ip, clean docs untouched") {
    import org.apache.spark.sql.functions._
    val out = TextAnalysis.piiRedaction(spark, Sf001)
    val rows = out.collect()
    val aug = rows.filter(_.getAs[Long]("doc_id") % 7 == 0)
    val clean = rows.filter(_.getAs[Long]("doc_id") % 7 != 0)
    assert(aug.nonEmpty && aug.forall(r =>
      r.getAs[Long]("n_emails") == 1 && r.getAs[Long]("n_ips") == 1), "augmented docs must match exactly once each")
    assert(clean.forall(r => r.getAs[Long]("n_emails") == 0))
    // the redacted fingerprint of a clean doc equals md5 of its raw text
    val raw = graft.core.Tables.load(spark, Sf001, "documents")
      .filter(col("doc_id") % 7 =!= 0)
      .select(col("doc_id"), md5(col("text").cast("binary")).as("fp")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("fp")).toMap
    clean.foreach(r =>
      assert(r.getAs[String]("redacted_fp") == raw(r.getAs[Long]("doc_id"))))
  }

  test("decontamination probes the corpus against a BROADCAST benchmark set") {
    val df = TextAnalysis.decontaminate(spark, Sf001)
    val rows = df.collect()
    assert(rows.forall(_.getAs[Long]("n_shared") >= 1))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"benchmark set must broadcast (corpus side streams):\n$plan")
  }

  test("repetition ratio is 0 for all-distinct 3-grams and high for loops") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // planted frame through the same expressions the query uses
    val docs = Seq(
      (1L, "a b c d e f g"), // all distinct 3-grams → 0
      (2L, Seq.fill(50)("spam ham").mkString(" ")) // 2 distinct / 98 grams
    ).toDF("doc_id", "text")
    val out = docs
      .select(col("doc_id"), graft.functions.TextFunctions.tokens(col("text")).as("w"))
      .select(col("doc_id"),
        greatest(size(col("w")) - 2, lit(0)).cast("long").as("n_grams"),
        size(graft.functions.LshFunctions.hashedShingles(spark, col("w"), 3))
          .cast("long").as("n_distinct"))
      .withColumn("rep_ratio",
        round(lit(1.0) - col("n_distinct").cast("double") / col("n_grams").cast("double"), 4))
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("rep_ratio")).toMap
    assert(out(1L) == 0.0)
    assert(out(2L) > 0.9, s"looping text must score high, got ${out(2L)}")
    // and the corpus query returns sane bounds
    val corpus = TextAnalysis.repetition(spark, Sf001).collect()
    assert(corpus.nonEmpty && corpus.forall { r =>
      val x = r.getAs[Double]("rep_ratio"); x >= 0.0 && x < 1.0
    })
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

  test("production-τ embedding near-dup EQUALS the brute all-pairs set on the planted corpus") {
    import org.apache.spark.sql.functions._
    import graft.functions.VectorFunctions
    // the synthetic corpus's max pair cosine is 0.51 (measured), so
    // τ=0.8 pairs must be PLANTED — the SHIPPED d06 corpus
    // (Dedup.plantedProductionCorpus, mirrored in the DuckDB oracle)
    // re-enters 20 vectors under id+10⁶ with a deterministic per-dim
    // perturbation (cosine ≈ 0.99). The production family must return
    // exactly the brute τ=0.8 result set: the 20 planted pairs plus
    // any perturbed-vs-other hits
    val corpus = Dedup.plantedProductionCorpus(
      graft.core.Tables.load(spark, Sf001, "embeddings"))
    val e = corpus
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("norm", VectorFunctions.norm(spark, col("v")))
    val a = e.select(col("vec_id").as("vec_a"), col("v").as("va"), col("norm").as("na"))
    val b = e.select(col("vec_id").as("vec_b"), col("v").as("vb"), col("norm").as("nb"))
    val brute = a.crossJoin(b).filter(col("vec_a") < col("vec_b"))
      .withColumn("cosine", VectorFunctions.dot(spark, col("va"), col("vb")) / (col("na") * col("nb")))
      .filter(col("cosine") >= Dedup.ProductionEmbTau)
      .select(col("vec_a"), col("vec_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(brute.size >= 20, s"planting failed: ${brute.size} brute pairs")
    val hi = Dedup.embeddingNearDup(corpus, Dedup.ProductionEmbTau).collect()
      .map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b"))).toSet
    assert(hi == brute,
      s"missed=${(brute -- hi).take(5)} extra=${(hi -- brute).take(5)} " +
        s"(${hi.size} vs ${brute.size})")
  }

  test("probed production signatures cut the candidate keep-rate >=5x vs the 6-bit sweep") {
    import org.apache.spark.sql.functions._
    import graft.functions.VectorFunctions
    val e = graft.core.Tables.load(spark, Sf001, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("norm", VectorFunctions.norm(spark, col("v")))
    val n = e.count()
    val allPairs = n * (n - 1) / 2.0
    // distinct candidate PAIRS per family (the raw bucket stream counts
    // a pair once per colliding table/probe; the verify cost driver is
    // the distinct pair set each family forwards to the screen/verify)
    val sweep = // measured ~0.63: the documented τ=0.45 tail
      Dedup.embCandidates(e, 6).distinct().count() / allPairs
    val prod = // multi-probed production family at its derived depth
      Dedup.embCandidatesProbed(e, Dedup.adaptiveEmbBits(n)).distinct().count() / allPairs
    info(f"keep-rate: 6-bit sweep=$sweep%.3f probed-production=$prod%.3f")
    assert(prod * 5 <= sweep,
      f"production family keeps $prod%.3f of pairs vs sweep $sweep%.3f — no cut")
    assert(prod <= 0.15, f"production keep-rate $prod%.3f not subquadratic-ish")
  }

  test("adaptive production bits: 16-bit floor at test SF, +1 per doubling, capped") {
    assert(Dedup.adaptiveEmbBits(1) == 16)
    assert(Dedup.adaptiveEmbBits(520) == 16)
    assert(Dedup.adaptiveEmbBits(32768) == 16)   // ⌈log₂ 32768⌉+1 = 16
    assert(Dedup.adaptiveEmbBits(32769) == 17)
    assert(Dedup.adaptiveEmbBits(200000) == 19)  // the sf10 scaling point
    assert(Dedup.adaptiveEmbBits(1L << 40) == 26) // depth cap
    // monotone: a bigger corpus never gets a shallower family
    val probes = Seq(1L, 100L, 32768L, 32769L, 50000L, 200000L, 1L << 30)
    assert(probes.map(Dedup.adaptiveEmbBits) == probes.map(Dedup.adaptiveEmbBits).sorted)
  }

  test("multi-probe boundary recall: pairs AT tau=0.8 in the 19-bit regime found >=90%") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // 500 deterministic pairs at cosine EXACTLY 0.8 (w = 0.8u + 0.6u⊥),
    // probed at the DEEP depth the 200k-vector sf10 corpus derives
    // (adaptiveEmbBits(200000) = 19) — the regime where the r7
    // un-probed 64-table family found a boundary pair w.p. ≈ 0.73 (the
    // disclosed decay). Single-bit 0→1 probes across 32 tables lift the
    // per-table collision from p^19 to p^19 + 19·p^18(1−p), predicted
    // family recall ≈ 0.92; this pins the measured floor. Deterministic
    // corpus (seeded PRNG), so the measurement is reproducible.
    val dim = 64
    val rnd = new scala.util.Random(42)
    def unit(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(_ / n)
    }
    val rows = (0 until 500).flatMap { i =>
      val u = unit(Array.fill(dim)(rnd.nextGaussian()))
      val r = Array.fill(dim)(rnd.nextGaussian())
      val proj = r.zip(u).map { case (a, b) => a * b }.sum
      val perp = unit(r.zipWithIndex.map { case (x, d) => x - proj * u(d) })
      val w = u.zipWithIndex.map { case (x, d) => 0.8 * x + 0.6 * perp(d) }
      Seq((i.toLong * 2, u.toSeq), (i.toLong * 2 + 1, w.toSeq))
    }
    val e = rows.toDF("vec_id", "v")
      .withColumn("norm", graft.functions.VectorFunctions.norm(spark, col("v")))
      .localCheckpoint(true)
    val cand = Dedup.embCandidatesProbed(e, 19)
      .select(col("vec_a"), col("vec_b")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val found = (0 until 500).count(i => cand.contains((i.toLong * 2, i.toLong * 2 + 1)))
    info(s"boundary recall at 19 bits: $found/500")
    assert(found >= 450, s"boundary recall ${found / 500.0} < 0.9 at the 19-bit regime")
  }

  test("deep-regime production dedup finds planted near-dups above the bit floor") {
    import org.apache.spark.sql.functions._
    // 40k hash-derived vectors → adaptiveEmbBits = 17 (ABOVE the 16-bit
    // floor: exercises the depth-growth machinery end-to-end, where the
    // old family's sf10 gap lived). Planted: 20 perturbed re-entries at
    // cosine ≈ 0.99 (collision probability ≥ 0.999 at any depth ≤ 26).
    // No brute cross-join here (40k² pairs): false positives are
    // impossible by construction (the exact-cosine verify bounds every
    // reported pair), so the planted-recall assertion is the live half;
    // floor-regime set-EQUALITY vs brute is pinned by the spec above.
    val n = 40000
    val base = spark.range(n).select(col("id").as("vec_id"),
      expr("transform(sequence(0, 63), d -> " +
        "cast(xxhash64(id * 64 + d) as double) / 9.223372036854776e18)")
        .as("embedding"))
    val corpus = Dedup.plantedProductionCorpus(base)
    val hi = Dedup.embeddingNearDup(corpus, Dedup.ProductionEmbTau).collect()
    val got = hi.map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b"))).toSet
    val planted = (0 until 20).map(i => (i.toLong, i.toLong + 1000000L)).toSet
    assert(planted.subsetOf(got), s"missed planted: ${(planted -- got).take(5)}")
    assert(hi.forall(_.getAs[Double]("cosine") >= 0.8))
  }

  test("production-τ near-dup stays EXACT vs brute on a mid-size hash corpus") {
    import org.apache.spark.sql.functions._
    import graft.functions.VectorFunctions
    // 8,500 deterministic hash-derived vectors (floor-depth regime; the
    // above-floor machinery is exercised end-to-end by the 40k
    // deep-regime spec and at candidate level by the boundary-recall
    // spec). Planted: first 20 vectors re-entered perturbed
    // (cosine ≈ 0.99). Ambient 64-dim hash vectors concentrate at
    // |cosine| ≲ 0.75 over 36M pairs, so brute τ=0.8 = planted only.
    val n = 8500
    val base = spark.range(n).select(col("id").as("vec_id"),
      expr("transform(sequence(0, 63), d -> " +
        "cast(xxhash64(id * 64 + d) as double) / 9.223372036854776e18)")
        .as("embedding"))
    val corpus = Dedup.plantedProductionCorpus(base)
    val e = corpus.select(col("vec_id"), col("embedding").as("v"))
      .withColumn("norm", VectorFunctions.norm(spark, col("v")))
      .localCheckpoint(true)
    val brute = e.select(col("vec_id").as("vec_a"), col("v").as("va"), col("norm").as("na"))
      .crossJoin(e.select(col("vec_id").as("vec_b"), col("v").as("vb"), col("norm").as("nb")))
      .filter(col("vec_a") < col("vec_b"))
      .withColumn("cosine",
        VectorFunctions.dot(spark, col("va"), col("vb")) / (col("na") * col("nb")))
      .filter(col("cosine") >= Dedup.ProductionEmbTau)
      .select(col("vec_a"), col("vec_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(brute.size >= 20, s"planting failed: ${brute.size} brute pairs")
    val lsh = Dedup.embeddingNearDup(corpus, Dedup.ProductionEmbTau).collect()
      .map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b"))).toSet
    assert(lsh == brute,
      s"missed=${(brute -- lsh).take(5)} extra=${(lsh -- brute).take(5)} " +
        s"(${lsh.size} vs ${brute.size})")
  }

  test("simhash result EQUALS the brute hamming<=5 pair set (not just covers it)") {
    import org.apache.spark.sql.functions._
    // independent oracle: signatures via the same kernel, then brute
    // all-pairs hamming. The 8-block LSH is recall-exact up to hamming
    // 7 (pigeonhole: ≤7 flips leave ≥1 of 8 blocks intact), so for the
    // shipped ≤5 radius the operator must return EXACTLY this set — a
    // radius or block-layout regression shows as a set diff, not a
    // row-count coincidence
    val sigs = graft.core.Tables.load(spark, Sf001, "documents")
      .select(col("doc_id"), graft.functions.LshFunctions.simhashSig(
        spark, graft.functions.TextFunctions.tokens(col("text"))).as("sig"))
      .localCheckpoint(true)
    val brute = sigs.select(col("doc_id").as("doc_a"), col("sig").as("sig_a"))
      .crossJoin(sigs.select(col("doc_id").as("doc_b"), col("sig").as("sig_b")))
      .filter(col("doc_a") < col("doc_b"))
      .withColumn("hamming",
        bit_count(col("sig_a").bitwiseXOR(col("sig_b"))).cast("long"))
      .filter(col("hamming") <= 5)
      .collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"), r.getAs[Long]("hamming")))
      .toSet
    assert(brute.nonEmpty, "no hamming<=5 pairs at sf0.01 — test is vacuous")
    val got = Dedup.simhash(spark, Sf001).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"), r.getAs[Long]("hamming")))
      .toSet
    assert(got == brute,
      s"missed=${(brute -- got).take(5)} extra=${(got -- brute).take(5)} " +
        s"(${got.size} vs ${brute.size})")
  }

  test("incremental hot bucket links delta to bucket-min: linear work, connected result") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // a mega-bucket: 60 corpus + 20 delta docs with IDENTICAL text
    // (every band collides; combined width 80 > MaxBucket=64), plus
    // unrelated singletons on both sides
    val text = "alpha beta gamma delta epsilon zeta eta theta"
    val corpusDocs = ((100L until 160L).map(i => (i, text)) ++
      Seq((900L, "solo corpus doc about nothing shared at all here")))
      .toDF("doc_id", "text")
    val deltaDocs = ((200L until 220L).map(i => (i, text)) ++
      Seq((901L, "another unrelated delta document with its own words")))
      .toDF("doc_id", "text")
    val path = tmpDir("sigidx-hot")
    graft.index.SignatureIndex.build(corpusDocs, path)
    val pairs = Dedup.incrementalPairs(deltaDocs, path).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    // each delta member links to the bucket min (100) ONLY — 20 pairs,
    // not 20×60 fan-out, and no delta×delta pairs inside the hot bucket
    val expected = (200L until 220L).map(d => (100L, d)).toSet
    assert(pairs == expected,
      s"missed=${(expected -- pairs).take(5)} extra=${(pairs -- expected).take(5)}")
    // connectivity: the links keep every delta doc in the corpus
    // cluster for downstream component extraction
    val clusters = Dedup.clustersFromPairs(
      pairs.toSeq.toDF("doc_a", "doc_b")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id")).toMap
    assert((200L until 220L).forall(clusters(_) == 100L))
  }

  test("incremental near-dup equals the batch pair set restricted to the delta") {
    import org.apache.spark.sql.functions._
    val docs = graft.core.Tables.load(spark, Sf001, "documents")
    val isDelta = col("doc_id") % 3 === 0
    val path = tmpDir("sigidx")
    graft.index.SignatureIndex.build(docs.filter(!isDelta), path)
    val incr = Dedup.incrementalPairs(docs.filter(isDelta), path).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    val full = Dedup.minhashLsh(docs).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    val expected = full.filter { case (a, b) => a % 3 == 0 || b % 3 == 0 }
    assert(incr == expected,
      s"missed=${(expected -- incr).take(5)} extra=${(incr -- expected).take(5)}")
    assert(expected.nonEmpty, "no pair touches the delta — test is vacuous")
    assert((full -- expected).nonEmpty,
      "every pair touches the delta — restriction untested")
  }

  test("signature-index append: a second batch sees the first as corpus") {
    import org.apache.spark.sql.functions._
    val docs = graft.core.Tables.load(spark, Sf001, "documents")
    val old = docs.filter(col("doc_id") % 3 =!= 0)
    val batch1 = docs.filter(col("doc_id") % 3 === 0 && col("doc_id") % 2 === 0)
    val batch2 = docs.filter(col("doc_id") % 3 === 0 && col("doc_id") % 2 =!= 0)
    val path = tmpDir("sigidx-append")
    graft.index.SignatureIndex.build(old, path)
    val p1 = Dedup.incrementalPairs(batch1, path).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    graft.index.SignatureIndex.append(batch1, path)
    val p2 = Dedup.incrementalPairs(batch2, path).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    // two-batch ingest covers every pair the one-shot batch job finds,
    // except pairs entirely inside the untouched original corpus
    val full = Dedup.minhashLsh(docs).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    val expected = full.filter { case (a, b) => a % 3 == 0 || b % 3 == 0 }
    assert((p1 ++ p2) == expected,
      s"missed=${(expected -- p1 -- p2).take(5)} extra=${((p1 ++ p2) -- expected).take(5)}")
  }

  test("cluster extraction: pointer jumping resolves chains and separates components") {
    import spark.implicits._
    // a 9-node chain (the shape capped mega-buckets emit) plus a
    // separate triangle and an isolated pair
    val chain = (1L to 8L).map(i => (i, i + 1))
    val tri = Seq((20L, 21L), (21L, 22L), (20L, 22L))
    val iso = Seq((30L, 31L))
    val pairs = (chain ++ tri ++ iso).toDF("doc_a", "doc_b")
    val out = Dedup.clustersFromPairs(pairs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id")).toMap
    assert((1L to 9L).forall(out(_) == 1L), s"chain: $out")
    assert(Seq(20L, 21L, 22L).forall(out(_) == 20L))
    assert(Seq(30L, 31L).forall(out(_) == 30L))
    assert(out.size == 14)
  }

  test("d09 plan: embedding scan pruned, slim cluster frames, broadcast verify sides") {
    import org.apache.spark.sql.functions._
    // (a) the scan the d06/d09 pipeline reads: `label` never leaves
    // parquet — the normalization plan selects (vec_id, embedding) and
    // pruning must reach the scan through the planted-corpus union
    val src = Dedup.plantedProductionCorpus(
      graft.core.Tables.load(spark, Sf001, "embeddings"))
    val normed = Dedup.embNormedPlan(src)
    normed.collect()
    val scanLines = normed.queryExecution.executedPlan.toString
      .linesIterator.filter(l => l.contains("ReadSchema")).toSeq
    assert(scanLines.nonEmpty &&
      scanLines.forall(l => l.contains("vec_id") && !l.contains("label")),
      s"embedding scan not pruned to (vec_id, embedding):\n${scanLines.mkString("\n")}")
    // (b) the cluster result is exactly two long columns — the shape
    // every CC round self-joins; anything wider would ride each round's
    // shuffle at corpus scale
    val out = Dedup.embDedupClusters(spark, Sf001)
    assert(out.schema.fields.map(f => (f.name, f.dataType.typeName)).toSeq ==
      Seq(("vec_id", "long"), ("cluster_id", "long")))
    // (c) production verify path at test SF: the sketch/vector side
    // tables broadcast, so the candidate stream reaches the exact-cosine
    // verify through hash joins, never a shuffle of candidates
    val nd = Dedup.embeddingNearDup(src, Dedup.ProductionEmbTau)
    nd.collect()
    val ndPlan = nd.queryExecution.executedPlan.toString
    assert(ndPlan.contains("BroadcastHashJoin"),
      s"verify sides not broadcast at test SF:\n$ndPlan")
  }

  test("embedding clusters mirror union-find over the production-τ pair graph") {
    val corpus = Dedup.plantedProductionCorpus(
      graft.core.Tables.load(spark, Sf001, "embeddings"))
    val pairs = Dedup.embeddingNearDup(corpus, Dedup.ProductionEmbTau).collect()
      .map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b")))
    assert(pairs.nonEmpty)
    val clusters = Dedup.embDedupClusters(corpus).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("cluster_id")).toMap
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = pairs.flatMap(p => Seq(p._1, p._2)).distinct
    val expected = nodes.map { n =>
      val root = find(n)
      n -> nodes.filter(m => find(m) == root).min
    }.toMap
    assert(clusters == expected)
  }

  test("dedup survivors: min of every cluster kept, other members dropped, rest untouched") {
    val docs = graft.core.Tables.load(spark, Sf001, "documents")
    val all = docs.select("doc_id").collect().map(_.getLong(0)).toSet
    val clusters = Dedup.dedupClusters(spark, Sf001).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("cluster_id")))
    val dropped = clusters.filter { case (d, c) => d != c }.map(_._1).toSet
    assert(dropped.nonEmpty, "no doc dropped — survivor test is vacuous")
    val survivors = Dedup.dedupSurvivors(spark, Sf001).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    assert(survivors == all -- dropped)
    // every dropped doc's cluster representative survives
    val repOf = clusters.toMap
    assert(dropped.forall(d => survivors.contains(repOf(d))))
  }

  test("dedup clusters: every near-dup pair lands in one cluster, minima are survivors") {
    val pairs = Dedup.minhashLsh(spark, Sf001).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
    assert(pairs.nonEmpty)
    val clusters = Dedup.dedupClusters(spark, Sf001).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id")).toMap
    // reference union-find over the same pairs
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = pairs.flatMap(p => Seq(p._1, p._2)).distinct
    val expected = nodes.map { n =>
      // component id = min member, reachable by chasing parents
      val root = find(n)
      n -> nodes.filter(m => find(m) == root).min
    }.toMap
    assert(clusters == expected)
  }

  test("bm25 matching set equals docs containing any query term, all scores positive") {
    import org.apache.spark.sql.functions._
    val docs = graft.core.Tables.load(spark, Sf001, "documents")
    val w = split(col("text"), " ")
    val expected = docs
      .filter(array_contains(w, "spark") || array_contains(w, "window") ||
        array_contains(w, "dup"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val got = TextAnalysis.bm25Search(spark, Sf001).collect()
    assert(got.map(_.getAs[Long]("doc_id")).toSet == expected)
    // Lucene idf form is positive for any df, so every matched doc
    // scores > 0 even for terms in more than half the corpus
    assert(got.forall(_.getAs[Double]("bm25") > 0))
  }

  test("multi-query BM25 agrees with the single-query form per query") {
    import org.apache.spark.sql.functions._
    val docs = graft.core.Tables.load(spark, Sf001, "documents")
    // query 1 of the t12 binding = terms (spark, window); the same
    // formula over the same corpus stats must give bit-identical
    // rounded scores in both forms (2-term sums commute in IEEE)
    val single = TextAnalysis.bm25(docs, Seq("spark", "window")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("bm25")).toMap
    val multi = TextAnalysis.bm25MultiSearch(spark, Sf001).collect()
      .filter(_.getAs[Long]("query_id") == 1L)
    assert(multi.nonEmpty && multi.length <= 10)
    multi.foreach { r =>
      val (id, sc) = (r.getAs[Long]("doc_id"), r.getAs[Double]("bm25"))
      assert(single.get(id).contains(sc), s"doc $id: multi=$sc single=${single.get(id)}")
    }
    // ranks descend in score with doc_id tie-break
    val scores = multi.sortBy(_.getAs[Long]("rank")).map(_.getAs[Double]("bm25"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
  }

  test("joint survivors = text survivors minus embedding-modality drops") {
    import org.apache.spark.sql.functions._
    val docs = graft.core.Tables.load(spark, Sf001, "documents")
    val textSurv = Dedup.dedupSurvivors(docs).collect().map(_.getLong(0)).toSet
    val embDrops = Dedup.embDedupClusters(
      Dedup.plantedDropCorpus(graft.core.Tables.load(spark, Sf001, "embeddings")))
      .filter(col("vec_id") =!= col("cluster_id"))
      .collect().map(_.getLong(0)).toSet
    val joint = Dedup.jointSurvivors(spark, Sf001).collect().map(_.getLong(0)).toSet
    assert(joint == textSurv -- embDrops)
    // the drop planting makes the embedding modality remove REAL docs:
    // the composition must be strictly smaller than the text-only set
    assert(joint.size < textSurv.size,
      "embedding modality should drop at least one real doc (non-vacuous)")
  }

  test("exact duplicates have full substring-dup coverage (ratio 1.0)") {
    import org.apache.spark.sql.functions._
    // the benchmark corpus has no exact text copies (d01: 500 groups /
    // 500 docs), so plant them: docs 0..19 re-entered verbatim under
    // fresh ids — every window of a copy lives in its twin, so coverage
    // must be exactly 1.0 on both sides of each planted pair
    val base = graft.core.Tables.load(spark, Sf001, "documents")
    val planted = base.filter(col("doc_id") < 20)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
    val docs = base.select(col("doc_id"), col("text")).unionByName(planted)
    val cov = Dedup.substringDedup(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("dup_ratio")).toMap
    val plantedIds = (0L until 20L).flatMap(i => Seq(i, i + 1000000L))
    val withWindows = plantedIds.filter(cov.contains)
    assert(withWindows.nonEmpty, "planted dups should have >=8 tokens")
    val broken = withWindows.filter(id => cov(id) != 1.0)
    assert(broken.isEmpty, s"exact dups with partial coverage: $broken")
    // un-planted docs keep whatever coverage the original corpus gives —
    // none of them may reach 1.0 via the planting itself
    assert(cov.size >= 500)
  }

  test("recallChecked: green on the real LSH path, gate flips on a degraded approx set") {
    import org.apache.spark.sql.functions._
    val real = Similarity.recallChecked(spark, Sf001,
      Similarity.annLsh(spark, Sf001)).collect()
    assert(real.length == 5 && real.forall(_.getAs[Long]("above_floor") == 1L),
      "the shipping LSH path must clear the mean-recall floor")
    // a regressed ANN (here: garbage neighbors for most queries) must
    // flip the gate to 0 — this is exactly what the driver oracle pins
    // to literal 1, so the regression fails a CORRECTNESS row
    val s2 = spark
    import s2.implicits._
    val junk = (0L until 5L).flatMap(q => (900L to 909L).map(n => (q, n)))
      .toDF("query_id", "neighbor_id")
    val bad = Similarity.recallChecked(spark, Sf001, junk).collect()
    assert(bad.forall(_.getAs[Long]("above_floor") == 0L),
      "a collapsed approx set must fail the mean-recall gate")
    // per-query recall is a real recomputation, not a constant: the
    // junk set scores ~0 everywhere
    assert(bad.forall(_.getAs[Double]("recall") <= 0.1))
  }
}
