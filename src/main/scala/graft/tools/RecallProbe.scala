package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deep-regime recall probe — measures the two decay regimes the r8
  * record disclosed by formula only, on corpora larger than any test
  * SF:
  *
  *  - `emb <n> <pairs>`: END-TO-END boundary recall of the production
  *    embedding near-dup family (probes + rider screen + sketch screen
  *    + exact verify) at the signature depth `n` vectors select —
  *    ≥ 2M vectors runs the 22-bit regime the
  *    [[graft.operators.Dedup.adaptiveEmbTables]] policy exists for.
  *    `pairs` partner vectors are planted at cosine 0.8005 — ON the
  *    τ=0.8 decision boundary for LSH geometry (bit agreement
  *    p(0.8005) ≈ p(0.8)) but a hair above the verify threshold, so
  *    the measurement isolates FAMILY recall from FP ties at the
  *    exact-cosine filter.
  *  - `ivf <n> <queries>`: s03 IVF-Flat recall vs the exact brute
  *    top-10 at corpus sizes past the 1024-cell cap's comfort zone
  *    (the r8 record extrapolated decay onset ~16M; this measures the
  *    curve at 4M+ instead of trusting the formula).
  *
  * Synthesis is deterministic (hash-derived components, no RNG): base
  * vectors are i.i.d.-uniform-ish per (id, dim, seed); a planted
  * partner for base u is v = τ·û + √(1−τ²)·ŵ with w the hash-derived
  * r Gram-Schmidt-orthogonalized against u — cosine(u, v) = τ to
  * ~1e-15. Corpora are cached as float parquet under tmpdir (the
  * probe is re-runnable without re-synthesis).
  *
  * Prints ONE JSON line per run; the scaling record carries the
  * result next to the timing ladder. Run via
  * `sbt "runMain graft.tools.RecallProbe emb 2000000 500"`. */
object RecallProbe {

  private val Dims = 64
  private val PlantTau = 0.8005

  /** Deterministic uniform-ish component in [-1, 1) from (id, dim,
    * seed). */
  private def comp(id: org.apache.spark.sql.Column,
      d: org.apache.spark.sql.Column, seed: Int) =
    pmod(xxhash64(id, d, lit(seed)), lit(1000000L)).cast("double") / 500000.0 - 1.0

  /** `n` base vectors (vec_id 0..n-1) as float arrays. */
  private def baseVectors(s: SparkSession, n: Long): DataFrame =
    s.range(n).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(Dims - 1)),
        d => comp(col("id"), d, 1).cast("float")).as("embedding"))

  /** Partner vectors at cosine [[PlantTau]] to bases 0..pairs-1, under
    * vec_id + n. Gram–Schmidt in DOUBLE, emitted as float — the float
    * rounding moves the realized cosine by ≤1e-7, still firmly on the
    * boundary (p moves by ~4e-8). */
  private def plantedPartners(s: SparkSession, n: Long, pairs: Int): DataFrame = {
    import graft.functions.VectorFunctions
    val sqrtTail = math.sqrt(1.0 - PlantTau * PlantTau)
    val u = transform(sequence(lit(0), lit(Dims - 1)), d => comp(col("id"), d, 1))
    val r = transform(sequence(lit(0), lit(Dims - 1)), d => comp(col("id"), d, 2))
    s.range(pairs.toLong)
      .select(col("id"), u.as("u"), r.as("r"))
      .withColumn("ru", VectorFunctions.dot(s, col("r"), col("u")))
      .withColumn("uu", VectorFunctions.dot(s, col("u"), col("u")))
      .withColumn("w", zip_with(col("r"), col("u"),
        (x, y) => x - col("ru") / col("uu") * y))
      .withColumn("wn", sqrt(VectorFunctions.dot(s, col("w"), col("w"))))
      .withColumn("un", sqrt(col("uu")))
      .select((col("id") + n).as("vec_id"),
        zip_with(col("u"), col("w"),
          (x, y) => (lit(PlantTau) * x / col("un")
            + lit(sqrtTail) * y / col("wn")).cast("float")).as("embedding"))
  }

  private def cached(s: SparkSession, path: String, df: => DataFrame): DataFrame = {
    val done = new java.io.File(path, "_DONE")
    if (!done.exists()) {
      df.repartition(64).write.mode("overwrite").parquet(path)
      done.createNewFile()
      ()
    }
    s.read.parquet(path)
  }

  def main(args: Array[String]): Unit = {
    val mode = args(0)
    val n = args(1).toLong
    val extra = if (args.length > 2) args(2).toInt else 500
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.GraftSession.builder("graft-recallprobe", cpus)
      .master(s"local[$cpus]").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val tmp = System.getProperty("java.io.tmpdir")

    mode match {
      case "emb" =>
        val pairs = extra
        val corpus = cached(spark, s"$tmp/graft_recall_emb_${n}_$pairs",
          baseVectors(spark, n).unionByName(plantedPartners(spark, n, pairs)))
        val bits = graft.operators.Dedup.adaptiveEmbBits(n + pairs)
        val tables = graft.operators.Dedup.adaptiveEmbTables(bits)
        val t0 = System.nanoTime()
        val found = graft.operators.Dedup
          .embeddingNearDup(corpus, graft.operators.Dedup.ProductionEmbTau)
          // planted pairs are (i, i+n); ambient coincidences (distinct
          // hash vectors at cosine ≥ 0.8) don't count toward recall
          .filter(col("vec_b") === col("vec_a") + n && col("vec_a") < pairs)
          .count()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"""{"probe":"emb_deep","n":${n + pairs},"bits":$bits,"tables":$tables,"planted":$pairs,"found":$found,"recall":${found.toDouble / pairs}%.4f,"sec":$sec%.1f}""")
      case "pqappend" =>
        // s05's APPEND path over ≥3 generations: per-generation append
        // cost (must be delta-proportional) and recall drift at the
        // FROZEN quantizers, then a fresh rebuild on the full corpus
        // for the staleness comparison. Two regimes per generation
        // size: stationary batches (same hash-uniform distribution as
        // the build corpus — ids continue the sequence) and DRIFTED
        // batches (a deterministic +0.45·cos(d/4) component bias), the
        // case the PqIndex.ensure re-train threshold exists for.
        val gens = if (args.length > 2) args(2).toInt else 3
        val drift = args.length > 3 && args(3) == "drift"
        val batch = n / 10
        val nq = 100
        import graft.operators.Similarity
        def batchVecs(g: Int): DataFrame = {
          val base = spark.range(n + (g - 1) * batch, n + g * batch)
            .select(col("id").as("vec_id"),
              transform(sequence(lit(0), lit(Dims - 1)),
                d => comp(col("id"), d, 1)).as("u"))
          if (!drift) base.select(col("vec_id"),
            expr("transform(u, x -> cast(x as float))").as("embedding"))
          else base.select(col("vec_id"),
            expr("transform(u, (x, d) -> cast(x + 0.45 * cos(d / 4.0) as float))")
              .as("embedding"))
        }
        val corpus0 = cached(spark, s"$tmp/graft_pqappend_$n", baseVectors(spark, n))
        val path = s"$tmp/graft_pqappend_idx_${n}_$drift-${System.nanoTime()}"
        val tb0 = System.nanoTime()
        graft.index.PqIndex.build(corpus0, path)
        val buildSec = (System.nanoTime() - tb0) / 1e9
        val queries = corpus0.filter(col("vec_id") < nq).localCheckpoint(true)
        var full = corpus0
        val genStats = (1 to gens).map { g =>
          val b = batchVecs(g).localCheckpoint(true)
          val ta = System.nanoTime()
          graft.index.PqIndex.append(b, path)
          val appendSec = (System.nanoTime() - ta) / 1e9
          full = full.unionByName(b).localCheckpoint(true)
          val approx = graft.index.PqIndex.query(spark, path, queries, 10)
          val exact = Similarity.annBrute(full, queries, 10)
          val r = Similarity.recallOf(exact, approx)
          f""""gen$g":{"append_sec":$appendSec%.2f,"recall":$r%.3f}"""
        }
        // staleness comparison: fresh quantizers on the full corpus
        val path2 = s"$path-fresh"
        graft.index.PqIndex.build(full, path2)
        val approxF = graft.index.PqIndex.query(spark, path2, queries, 10)
        val exactF = Similarity.annBrute(full, queries, 10)
        val rF = Similarity.recallOf(exactF, approxF)
        println(f"""{"probe":"pq_append","n":$n,"batch":$batch,"gens":$gens,"drift":$drift,"build_sec":$buildSec%.2f,${genStats.mkString(",")},"fresh_rebuild_recall":$rF%.3f}""")
      case "embappend" =>
        // EmbSignatureIndex's APPEND path: per-generation append cost
        // (delta-proportional — the counts re-merge is the only
        // corpus-width term) and end-to-end boundary recall of a
        // planted probe batch against the appended index vs a fresh
        // rebuild at the same total. The planes are hash-derived (no
        // trained state), so unlike PQ the drift axis here is DEPTH:
        // ensure() rebuilds when adaptiveEmbBits outgrows the recorded
        // depth, and this probe records recall on both sides of that
        // policy.
        val gens = if (args.length > 2) args(2).toInt else 3
        val batch = n / 10
        val pairs = 500
        val corpus0 = cached(spark, s"$tmp/graft_embappend_$n", baseVectors(spark, n))
        val path = s"$tmp/graft_embappend_idx_$n-${System.nanoTime()}"
        val tb0 = System.nanoTime()
        graft.index.EmbSignatureIndex.build(corpus0, path)
        val buildSec = (System.nanoTime() - tb0) / 1e9
        var full = corpus0
        val genStats = (1 to gens).map { g =>
          val b = spark.range(n + (g - 1) * batch, n + g * batch)
            .select(col("id").as("vec_id"),
              transform(sequence(lit(0), lit(Dims - 1)),
                d => comp(col("id"), d, 1).cast("float")).as("embedding"))
            .localCheckpoint(true)
          val ta = System.nanoTime()
          graft.index.EmbSignatureIndex.append(b, path)
          val appendSec = (System.nanoTime() - ta) / 1e9
          full = full.unionByName(b).localCheckpoint(true)
          f""""gen$g":{"append_sec":$appendSec%.2f}"""
        }
        // boundary-recall probe: partners of base ids 0..pairs-1 played
        // as the query delta against the appended index...
        val delta = plantedPartners(spark, n, pairs).localCheckpoint(true)
        val t0 = System.nanoTime()
        val found = graft.operators.Dedup.incrementalEmbPairs(delta, path)
          .filter(col("vec_b") === col("vec_a") + n && col("vec_a") < pairs)
          .count()
        val probeSec = (System.nanoTime() - t0) / 1e9
        // ...vs a fresh rebuild on the full corpus (depth re-derived)
        val path2 = s"$path-fresh"
        graft.index.EmbSignatureIndex.build(full, path2)
        val found2 = graft.operators.Dedup.incrementalEmbPairs(delta, path2)
          .filter(col("vec_b") === col("vec_a") + n && col("vec_a") < pairs)
          .count()
        val bitsA = graft.index.EmbSignatureIndex.meta(spark, path)._1
        val bitsF = graft.index.EmbSignatureIndex.meta(spark, path2)._1
        println(f"""{"probe":"emb_append","n":$n,"batch":$batch,"gens":$gens,"build_sec":$buildSec%.2f,${genStats.mkString(",")},"probe_sec":$probeSec%.2f,"bits_appended":$bitsA,"recall_appended":${found.toDouble / pairs}%.3f,"bits_fresh":$bitsF,"recall_fresh":${found2.toDouble / pairs}%.3f}""")
      case "semdedup" =>
        // d15 at depth: the two-level cell growth exercised on a corpus
        // past the coarse cap (subPerCellFor(2M+, 1024) ≥ 4). Planted
        // partners at cosine 0.8005 ≥ τ=0.7 ARE semantic duplicates;
        // cell-scoped recall = planted pairs co-located and dropped-one,
        // and the keep policy is checked on every recovered pair.
        val pairs = extra
        // optional 4th arg pins a single-level cell count — the
        // "what would the old 1024 cap cost here" comparison row
        val capCells = if (args.length > 3) args(3).toInt else 0
        val corpus = cached(spark, s"$tmp/graft_recall_emb_${n}_$pairs",
          baseVectors(spark, n).unionByName(plantedPartners(spark, n, pairs)))
        val t0 = System.nanoTime()
        val res = graft.operators.SemanticDedup.semanticDedup(corpus, cells = capCells)
          .filter(col("vec_id") < pairs || (col("vec_id") >= n && col("vec_id") < n + pairs))
          .localCheckpoint(true)
        val sec = (System.nanoTime() - t0) / 1e9
        val rows = res.collect()
          .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getLong(3))).toMap
        val planted = (0 until pairs).map(i => (i.toLong, i + n))
        val coLoc = planted.filter { case (a, b) => rows(a)._1 == rows(b)._1 }
        val dropOne = coLoc.count { case (a, b) => rows(a)._3 == 1L ^ rows(b)._3 == 1L }
        // keep policy at depth: the dropped member is the
        // (centroid_sim, id)-greater one (4-dp ties skipped, the spec's
        // rounding-envelope argument)
        val violations = coLoc.count { case (a, b) =>
          val (_, ca, da) = rows(a)
          val (_, cb, db) = rows(b)
          math.abs(ca - cb) > 2e-4 && (
            if (ca > cb) !(da == 1L && db == 0L)
            else !(db == 1L && da == 0L))
        }
        println(f"""{"probe":"semdedup_deep","n":${n + pairs},"planted":$pairs,"colocated":${coLoc.size},"drop_one":$dropOne,"policy_violations":$violations,"cell_recall":${coLoc.size.toDouble / pairs}%.4f,"sec":$sec%.1f}""")
      case "semdedupincr" =>
        // d15b at depth: the INCREMENTAL path in the two-level regime
        // (the suite ladder tops out at 200k vectors — single-level).
        // Build the index on the corpus minus a 1/30 delta (timed as
        // the one-off), then time probe() and append() of the delta —
        // the steady per-batch cost the cadence argues — and check the
        // keep policy on every planted pair STRADDLING the split (the
        // retroactive-flip machinery's at-depth exercise).
        val pairs = extra
        val corpus = cached(spark, s"$tmp/graft_recall_emb_${n}_$pairs",
          baseVectors(spark, n).unionByName(plantedPartners(spark, n, pairs)))
        val isDelta = pmod(col("vec_id"), lit(30)) === 0
        val idxPath = s"$tmp/graft_semincr_${n}_$pairs"
        new org.apache.hadoop.fs.Path(idxPath)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
          .delete(new org.apache.hadoop.fs.Path(idxPath), true)
        val t0 = System.nanoTime()
        graft.index.SemDedupIndex.build(corpus.filter(!isDelta), idxPath)
        val buildSec = (System.nanoTime() - t0) / 1e9
        val delta = corpus.filter(isDelta)
        val t1 = System.nanoTime()
        val probed = graft.index.SemDedupIndex.probe(delta, idxPath).count()
        val probeSec = (System.nanoTime() - t1) / 1e9
        val t2 = System.nanoTime()
        graft.index.SemDedupIndex.append(delta, idxPath).count()
        val appendSec = (System.nanoTime() - t2) / 1e9
        // policy check over the planted window of the maintained view
        val rows = graft.index.SemDedupIndex.decisions(spark, idxPath)
          .filter(col("vec_id") < pairs || (col("vec_id") >= n && col("vec_id") < n + pairs))
          .collect()
          .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getLong(3))).toMap
        val planted = (0 until pairs).map(i => (i.toLong, i + n))
        val straddling = planted.count { case (a, b) =>
          (a % 30 == 0) ^ (b % 30 == 0) }
        val coLoc = planted.filter { case (a, b) => rows(a)._1 == rows(b)._1 }
        val dropOne = coLoc.count { case (a, b) => rows(a)._3 == 1L ^ rows(b)._3 == 1L }
        val violations = coLoc.count { case (a, b) =>
          val (_, ca, da) = rows(a)
          val (_, cb, db) = rows(b)
          math.abs(ca - cb) > 2e-4 && (
            if (ca > cb) !(da == 1L && db == 0L)
            else !(db == 1L && da == 0L))
        }
        println(f"""{"probe":"semdedup_incr","n":${n + pairs},"delta":${(n + pairs) / 30},"planted":$pairs,"straddling":$straddling,"colocated":${coLoc.size},"drop_one":$dropOne,"policy_violations":$violations,"probe_rows":$probed,"build_sec":$buildSec%.1f,"probe_sec":$probeSec%.1f,"append_sec":$appendSec%.1f}""")
      case "ivf" =>
        val q = extra
        val corpus = cached(spark, s"$tmp/graft_recall_ivf_$n",
          baseVectors(spark, n))
        val queries = corpus.filter(col("vec_id") < q)
        val t0 = System.nanoTime()
        val approx = graft.operators.Similarity.annIvf(corpus, queries, 10)
          .localCheckpoint(true)
        val sec = (System.nanoTime() - t0) / 1e9
        val exact = graft.operators.Similarity.annBrute(corpus, queries, 10)
        val r = graft.operators.Similarity.recallOf(exact, approx)
        println(f"""{"probe":"ivf_deep","n":$n,"queries":$q,"recall":$r%.4f,"ivf_sec":$sec%.1f}""")
      case other => sys.error(s"unknown mode $other (emb|ivf)")
    }
    spark.stop()
  }
}
