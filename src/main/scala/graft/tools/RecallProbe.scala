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
