package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.Tables

/** Approximate-nearest-neighbor search over the `embeddings` table.
  *
  *  - [[annBrute]]: exact top-k by cosine — the correctness baseline.
  *    Queries are broadcast (few rows), so the fact side streams through
  *    one codegen'd stage: scan → dot product → per-query top-k heap
  *    (TakeOrdered-like via window + filter).
  *  - [[annLsh]]: random-hyperplane LSH — the 100 TB path. Each vector
  *    hashes to a signature bucket; candidates are probed only within the
  *    query's bucket (multi-probe over bit flips). Hyperplanes are
  *    hash-derived (deterministic, no RNG) and evaluated through the
  *    fused [[graft.functions.HyperplaneSigs]] kernel.
  */
object Similarity {

  private val K = 10
  private val NumQueries = 5
  // Few planes + multi-probe: recall comes from probing all 1-bit flips,
  // so bucket count ~2^Planes is sized to the corpus (at real scale this
  // is a config; 64 buckets suits the test SFs).
  private val Planes = 6

  import graft.functions.VectorFunctions

  private[graft] def withNorm(s: SparkSession, df: DataFrame): DataFrame =
    df.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("norm", VectorFunctions.norm(s, col("v")))

  // Frame-parametric forms (the library API): `corpus` and `queries`
  // are any DataFrames carrying (`vec_id`, `embedding`); the
  // (SparkSession, dir) overloads bind the driver-contract benchmark
  // table with its first `NumQueries` vectors as queries.

  /** Exact brute-force top-k cosine of `queries` against `corpus`.
    * `excludeSelf` drops corpus rows whose vec_id equals the query's —
    * correct when queries ⊆ corpus (the wrappers); pass false for a
    * DISJOINT query set whose id space may coincide with the corpus's,
    * where the filter would silently drop true nearest neighbors. */
  def annBrute(corpus: DataFrame, queries: DataFrame, k: Int,
      excludeSelf: Boolean = true): DataFrame = {
    val s = corpus.sparkSession
    val e = withNorm(s, corpus)
    val q = withNorm(s, queries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("norm").as("qn"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    e.join(broadcast(q),
        if (excludeSelf) col("vec_id") =!= col("query_id") else lit(true))
      .withColumn("cosine", VectorFunctions.dot(s, col("v"), col("qv")) / (col("norm") * col("qn")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"),
        round(col("cosine"), 2).as("cosine"))
      .orderBy(col("query_id"), col("rank"))
  }

  def annBrute(s: SparkSession, dir: String): DataFrame = {
    val all = Tables.load(s, dir, "embeddings")
    annBrute(all, all.filter(col("vec_id") < NumQueries), K)
  }

  /** Seed for the query-ANN hyperplane family (shared kernel with the
    * dedup path: [[graft.functions.HyperplaneSigs]] — one fused
    * codegen'd multiply-add loop against the process-cached plane
    * matrix; the previous zip_with/aggregate composition ran
    * interpreted higher-order lambdas per plane per row). */
  private val SigSeed = 1L

  // Calibrated at sf0.01 against the exact top-10: recall per scanned
  // fraction improves with FINER cells at constant nProbe/cells — the
  // r3 config (16 cells, probe 6 = 0.38 of the corpus) measured 62%
  // recall; (32, 12) probes the same 0.38 fraction and measures 92%
  // (finer cells put each true neighbor's cell higher in the query's
  // centroid ranking). Floor pinned ≥80% in PipelineOpsSpec.
  private val Cells = 32
  private val NProbe = 12
  private val KmIters = 10

  /** IVF sizing as a function of corpus size. A FIXED cell count does
    * not survive corpus growth: 32 cells over 2k vectors puts ~62
    * vectors in a cell and the bench's recall field measured the decay
    * (0.92 at 500 rows → 0.74 at 2k → 0.60 at 20k with the fixed
    * config). Sizing sweep (recall at 3/8 probe fraction, 2k corpus):
    * √n cells 0.74, 2√n 0.78, 4√n 0.82, 256 0.92 — recall climbs with
    * FINER cells at constant scanned fraction (the r3 calibration,
    * reconfirmed at this scale), so cells = 4√n with probe count 3/8
    * of cells. This holds scanned fraction stable while per-cell
    * population shrinks as far as the training budget allows. The cap
    * (1024, up from the r7 256 whose per-cell width was regrowing by
    * the 200k-vector point) bounds driver-side Lloyd to
    * ~10 iters × 16k sample × 1024 cells × 64 dims ≈ 10 GFLOP,
    * parallelized across cores ([[parChunks]]); at cluster scale the
    * cap is a config and assignment stays distributed either way. */
  private val MaxCells = 1024
  private[graft] def ivfConfig(n: Long): (Int, Int) = {
    val cells = math.min(MaxCells,
      math.max(Cells, 4 * math.ceil(math.sqrt(math.max(1L, n).toDouble)).toInt))
    (cells, probeFor(cells))
  }
  private[graft] def probeFor(cells: Int): Int = math.max(NProbe, cells * 3 / 8)

  /** Fixed chunk-count for the driver-side training loops. */
  private val ParChunkN =
    math.max(1, math.min(Runtime.getRuntime.availableProcessors, 32))

  /** Long-lived daemon pool for the training loops: the k-center seeding
    * calls [[parChunks]] once per picked centroid (up to [[MaxCells]]
    * times per build), so thread-per-call churn would dominate the
    * actual arithmetic at small cell counts — measured ~2 s of pure
    * Thread construction per IVF build at the 180-cell config. */
  private lazy val trainPool = java.util.concurrent.Executors.newFixedThreadPool(
    ParChunkN,
    (r: Runnable) => { val t = new Thread(r, "graft-ivf-train"); t.setDaemon(true); t })

  /** Run `work(chunk, lo, hi)` over [[ParChunkN]] disjoint chunks of
    * [0, n) on the shared pool — the training loops are pure
    * array-crunching, so plain threads beat any Spark round trip. The
    * chunk index lets callers keep per-chunk partials in a FIXED-order
    * array: merging in index order keeps float accumulation
    * deterministic regardless of thread finish order. Small inputs run
    * inline (one chunk): below ~8k elements the submit/join overhead
    * exceeds the loop itself — UNLESS `force` is set, for loops whose
    * per-element work is O(cells·dim) rather than O(dim) (the Lloyd
    * assignment passes: a 2.8k-sample × 180-cell × 64-dim round is
    * ~33 MFLOP, far past the submit overhead even though n is small). */
  private def parChunks(n: Int, force: Boolean = false)(
      work: (Int, Int, Int) => Unit): Unit =
    if (n < 8192 && !force) work(0, 0, n)
    else {
      val chunk = (n + ParChunkN - 1) / ParChunkN
      val futs = (0 until ParChunkN).flatMap { t =>
        val lo = t * chunk; val hi = math.min(n, lo + chunk)
        if (lo >= hi) None
        else Some(trainPool.submit(new Runnable { def run(): Unit = work(t, lo, hi) }))
      }
      futs.foreach(_.get())
    }

  /** Deterministic spherical k-means over a hash-sampled subset —
    * IVF centroid training. The sample is the `KmSampleN` vectors with
    * the smallest `xxhash64(vec_id)` (TakeOrdered heap, no full sort; at
    * 100 TB this reads a bounded sample to the driver — standard
    * centroid training, ~0.5 MB here). Init is farthest-first traversal
    * (deterministic 2-approx k-center seeding — no RNG anywhere), then
    * `KmIters` Lloyd rounds with cosine assignment and re-normalized
    * mean centroids. Returns unit-norm centroids. */
  /** ≥16 sample points per centroid keeps Lloyd stable as cells grow
    * while bounding driver-side training (10 iters × sample × cells
    * dot products) to ~1 s at the 256-cell cap. */
  private[graft] def centroidSampleN(cells: Int): Int =
    math.max(1024, 16 * cells)

  /** The first `n` rows of the deterministic hash-order sample, unit
    * normalized. BOTH quantizer trainings (coarse centroids, PQ
    * codebooks) draw prefixes of this same ordering, so the IVF-PQ
    * build collects ONE shared sample and slices it — one TakeOrdered
    * job instead of two, bit-identical samples on each side. */
  private[graft] def trainSample(e: DataFrame, n: Int): Array[Array[Double]] =
    e.filter(col("norm") > 0)
      .orderBy(xxhash64(col("vec_id")), col("vec_id"))
      .limit(n)
      .select(col("v"), col("norm"))
      .collect()
      .map { r =>
        val nr = r.getDouble(1)
        r.getSeq[Double](0).toArray.map(_ / nr)
      }

  private[graft] def kmeansCentroids(s: SparkSession, e: DataFrame,
      cells: Int = Cells): Array[Array[Double]] =
    kmeansCentroidsFrom(trainSample(e, centroidSampleN(cells)), cells)

  private[graft] def kmeansCentroidsFrom(sample: Array[Array[Double]],
      cells: Int): Array[Array[Double]] = {
    require(sample.nonEmpty, "no non-zero vectors to train IVF centroids on")
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s0 = 0.0; var i = 0
      while (i < a.length && i < b.length) { s0 += a(i) * b(i); i += 1 }
      s0
    }
    val k = math.min(cells, sample.length)
    // farthest-first: next centroid = sample point minimizing its max
    // cosine to the chosen set. Incremental form — a running best-dot
    // per sample point, updated once per new centroid — is
    // O(k·sample·dim); the naive rescan of the chosen set per pick is
    // O(k²·sample·dim) and measured ~2 s of driver time at 179 cells
    val cents = scala.collection.mutable.ArrayBuffer[Array[Double]](sample(0))
    val bestDot = sample.map(dot(_, sample(0)))
    while (cents.size < k) {
      var pick = 0
      var i = 1
      while (i < sample.length) {
        if (bestDot(i) < bestDot(pick)) pick = i
        i += 1
      }
      val c = sample(pick)
      cents += c
      // the O(sample·dim) running-best update is the k-center hot loop —
      // chunks are disjoint index ranges, so the parallel writes race on
      // nothing
      parChunks(sample.length) { (_, lo, hi) =>
        var j = lo
        while (j < hi) {
          val d = dot(sample(j), c)
          if (d > bestDot(j)) bestDot(j) = d
          j += 1
        }
      }
    }
    var cur = cents.toArray
    val dim = sample(0).length
    for (_ <- 0 until KmIters) {
      // assignment is O(sample·cells·dim) per round — the training cost
      // the raised cell cap buys back by running chunks on every core,
      // each with private accumulators merged after the join (force:
      // the per-element work is cells×dim, not dim — see parChunks)
      val partials = new Array[(Array[Array[Double]], Array[Int])](ParChunkN)
      parChunks(sample.length, force = true) { (t, lo, hi) =>
        val sums = Array.fill(k)(new Array[Double](dim))
        val counts = new Array[Int](k)
        var si = lo
        while (si < hi) {
          val v = sample(si)
          var best = 0; var bd = dot(cur(0), v); var c = 1
          while (c < k) {
            val d = dot(cur(c), v)
            if (d > bd) { best = c; bd = d }
            c += 1
          }
          counts(best) += 1
          var i = 0
          while (i < v.length) { sums(best)(i) += v(i); i += 1 }
          si += 1
        }
        partials(t) = (sums, counts)
      }
      val sums = Array.fill(k)(new Array[Double](dim))
      val counts = new Array[Int](k)
      partials.foreach {
        case null => ()
        case (ps, pc) =>
          var c = 0
          while (c < k) {
            counts(c) += pc(c)
            var i = 0
            while (i < dim) { sums(c)(i) += ps(c)(i); i += 1 }
            c += 1
          }
      }
      cur = cur.zipWithIndex.map { case (old, c) =>
        if (counts(c) == 0) old // empty cell keeps its centroid
        else {
          val m = sums(c)
          val n = math.sqrt(dot(m, m))
          if (n > 0) m.map(_ / n) else old
        }
      }
    }
    cur
  }

  /** Tiny (cell, cv, cn) centroid frame for broadcast joins. */
  private[graft] def centFrame(s: SparkSession, cents: Array[Array[Double]]): DataFrame = {
    import s.implicits._
    cents.zipWithIndex
      .map { case (c, i) => (i.toLong, c) }.toSeq
      .toDF("cell", "cv")
      .withColumn("cn", lit(1.0))
      .select(col("cell"), col("cv").cast("array<double>").as("cv"), col("cn"))
  }

  /** Each query's `nProbe` nearest cells (query vectors ride along). */
  private def ivfProbes(s: SparkSession, q: DataFrame, cent: DataFrame,
      nProbe: Int): DataFrame = {
    val wProbe = Window.partitionBy(col("query_id")).orderBy(col("csim").desc, col("cell"))
    q.crossJoin(broadcast(cent))
      .withColumn("csim", VectorFunctions.dot(s, col("qv"), col("cv")) / (col("qn") * col("cn")))
      .withColumn("pr", row_number().over(wProbe))
      .filter(col("pr") <= nProbe)
      // csim = dot(q/‖q‖, cell centroid): the exact coarse term the
      // IVFADC scorer adds back to the residual ADC
      .select(col("query_id"), col("qv"), col("qn"), col("cell"), col("csim"))
  }

  /** IVF-Flat ANN: vectors are assigned to the nearest of `Cells`
    * k-means centroids (inverted file); a query probes only its
    * `NProbe` nearest cells. Assignment is a broadcast of the tiny
    * centroid set against the fact side — one codegen'd pass, no
    * shuffle of vectors; the probe join shuffles only candidates. */
  def annIvf(corpus: DataFrame, queries: DataFrame, k: Int,
      excludeSelf: Boolean = true,
      cells: Int = 0, nProbe: Int = 0): DataFrame = {
    val s = corpus.sparkSession
    val e = withNorm(s, corpus)
    // each parameter independently: an explicit value (> 0) is honored,
    // only the missing one is sized — nProbe from the EFFECTIVE cell
    // count, cells from the corpus ([[ivfConfig]])
    val cCells = if (cells > 0) cells else ivfConfig(corpus.count())._1
    val cProbe = if (nProbe > 0) nProbe else probeFor(cCells)
    val cents = kmeansCentroids(s, e, cCells)
    val cent = centFrame(s, cents)
    // inverted file as a PROJECTION (no crossJoin->max_by aggregate, no
    // corpus-sized attach join): see [[graft.functions.NearestCentroid]]
    val indexed = e.withColumn("cell",
      VectorFunctions.nearestCell(s, col("v"), cents))
    val q = withNorm(s, queries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("norm").as("qn"))
    val probes = ivfProbes(s, q, cent, cProbe)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    indexed.join(broadcast(probes), Seq("cell"))
      .filter(if (excludeSelf) col("vec_id") =!= col("query_id") else lit(true))
      .withColumn("cosine", VectorFunctions.dot(s, col("v"), col("qv")) / (col("norm") * col("qn")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"),
        round(col("cosine"), 2).as("cosine"))
      .orderBy(col("query_id"), col("rank"))
  }

  def annIvf(s: SparkSession, dir: String): DataFrame = {
    val all = Tables.load(s, dir, "embeddings")
    annIvf(all, all.filter(col("vec_id") < NumQueries), K)
  }

  /** Deterministic plain-L2 k-means — the PQ-codebook sibling of the
    * spherical [[kmeansCentroids]]: farthest-first (k-center) seeding,
    * then [[KmIters]] Lloyd rounds with MEAN updates (subspace slices
    * are not unit vectors, so no re-normalization). Chunked on the
    * shared training pool; per-chunk partials merge in index order so
    * accumulation stays deterministic. */
  private def l2Kmeans(pts: Array[Array[Double]], k: Int): Array[Array[Double]] = {
    def d2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    if (pts.isEmpty || pts(0).length == 0) return Array(Array.emptyDoubleArray)
    val kk = math.min(k, pts.length)
    val dim = pts(0).length
    val cents = scala.collection.mutable.ArrayBuffer[Array[Double]](pts(0))
    val bestD = pts.map(d2(_, pts(0)))
    while (cents.size < kk) {
      var pick = 0
      var i = 1
      while (i < pts.length) {
        if (bestD(i) > bestD(pick)) pick = i
        i += 1
      }
      val c = pts(pick)
      cents += c
      parChunks(pts.length) { (_, lo, hi) =>
        var j = lo
        while (j < hi) {
          val d = d2(pts(j), c)
          if (d < bestD(j)) bestD(j) = d
          j += 1
        }
      }
    }
    var cur = cents.toArray
    for (_ <- 0 until KmIters) {
      val partials = new Array[(Array[Array[Double]], Array[Int])](ParChunkN)
      parChunks(pts.length) { (t, lo, hi) =>
        val sums = Array.fill(kk)(new Array[Double](dim))
        val counts = new Array[Int](kk)
        var si = lo
        while (si < hi) {
          val v = pts(si)
          var bi = 0
          var bd = d2(v, cur(0))
          var c = 1
          while (c < kk) {
            val d = d2(v, cur(c))
            if (d < bd) { bd = d; bi = c }
            c += 1
          }
          counts(bi) += 1
          var i = 0
          while (i < dim) { sums(bi)(i) += v(i); i += 1 }
          si += 1
        }
        partials(t) = (sums, counts)
      }
      val sums = Array.fill(kk)(new Array[Double](dim))
      val counts = new Array[Int](kk)
      partials.foreach {
        case null => ()
        case (ps, pc) =>
          var c = 0
          while (c < kk) {
            counts(c) += pc(c)
            var i = 0
            while (i < dim) { sums(c)(i) += ps(c)(i); i += 1 }
            c += 1
          }
      }
      cur = cur.zipWithIndex.map { case (old, c) =>
        if (counts(c) == 0) old else sums(c).map(_ / counts(c))
      }
    }
    cur
  }

  /** Residual PQ codebooks (IVFADC): each sample unit vector is
    * assigned driver-side to its nearest cell centroid, and per
    * subspace an L2 k-means runs on the RESIDUAL slices u − c. The
    * raw-vector form (pass `cents = Array(zeros)`) measured mean
    * |cosine−ADC| ≈ 0.055 on the synthesized corpus — enough noise to
    * bury cosine-0.8 neighbors under tens of thousands of candidates
    * (recall 0.26 at 200k vectors); residual spread is a fraction of
    * the sphere's, which is the whole point of the IVFADC coupling. */
  private[graft] def pqCodebooks(s: SparkSession, e: DataFrame,
      cents: Array[Array[Double]]): Array[Array[Array[Double]]] =
    pqCodebooksFrom(trainSample(e, PqSampleN), cents)

  /** PQ codebook sample depth: ≥16 points per codeword. */
  private[graft] val PqSampleN = 16 * graft.functions.PqKernel.Ks

  private[graft] def pqCodebooksFrom(sample: Array[Array[Double]],
      cents: Array[Array[Double]]): Array[Array[Array[Double]]] = {
    import graft.functions.PqKernel
    require(sample.nonEmpty, "no non-zero vectors to train PQ codebooks on")
    val dim = sample(0).length
    val residuals = new Array[Array[Double]](sample.length)
    // force: per-element work is cells×dim (nearest-cell assignment)
    parChunks(sample.length, force = true) { (_, lo, hi) =>
      var i = lo
      while (i < hi) {
        val u = sample(i)
        var bi = 0
        var bd = Double.MinValue
        var c = 0
        while (c < cents.length) {
          val cv = cents(c)
          var d = 0.0
          var j = 0
          while (j < dim && j < cv.length) { d += u(j) * cv(j); j += 1 }
          if (d > bd) { bd = d; bi = c }
          c += 1
        }
        val cv = cents(bi)
        residuals(i) = Array.tabulate(dim)(j =>
          u(j) - (if (j < cv.length) cv(j) else 0.0))
        i += 1
      }
    }
    val w = PqKernel.width(dim)
    // the M per-subspace trainings are independent — run them
    // concurrently on the global EC (guide §2.6 applied driver-side;
    // the inner l2Kmeans chunk loops stay inline at this sample size,
    // so there is no pool nesting). Results land in a fixed
    // subspace-indexed array: deterministic regardless of finish order.
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    val subs = (0 until PqKernel.M).map { m =>
      Future {
        val lo = m * w
        val hi = math.min(lo + w, dim)
        if (lo >= hi) Array(Array.emptyDoubleArray)
        else l2Kmeans(residuals.map(v => java.util.Arrays.copyOfRange(v, lo, hi)),
          PqKernel.Ks)
      }
    }
    subs.map(Await.result(_, scala.concurrent.duration.Duration.Inf)).toArray
  }

  /** ADC shortlist floor per query, ×k. The DEFAULT depth is
    * max(10·k, 5·√n): on a corpus with real neighbor structure the
    * floor is plenty (recall 1.0 at the 500-vector gate corpus with
    * factor 10), but the synthesized ladder corpus is ISOTROPIC — its
    * true top-10 sit at cosine 0.40–0.47 with 250–320 candidates
    * within 0.10, so compressed-domain ranking must resolve ~0.001
    * gaps and the shortlist has to out-depth the near-tie count.
    * Depth sweeps put the needed R at ≈200 @ 2k vectors, ≈800 @ 20k,
    * ≈2000 @ 200k (recall 0.82/0.84/0.88) — √n growth, which 5·√n
    * tracks at every measured point while staying a vanishing corpus
    * fraction (158k at 10⁹ vectors, vs 10M for a fixed-fraction
    * rule). The exact re-rank makes depth a pure recall/IO knob —
    * results are true cosines for whatever the shortlist surfaces —
    * and `rerank` overrides the default for serving configs that
    * know their corpus geometry (fixed 10·k is right for semantic
    * corpora with real neighbor gaps). */
  private[graft] val RerankFactor = 10

  /** IVF-PQ ANN — the memory-bound 100 TB path (Jégou et al., TPAMI
    * 2011). The probe-join input is an 8-BYTE packed code per vector
    * ([[graft.functions.PqKernel]]: 8 subspaces × 256 centroids packed
    * into one long), not the raw ~512-byte vector — the candidate
    * scan's byte volume drops ~64×, approximate scoring is 8
    * byte-indexed lookups against a per-query ADC table, and raw
    * vectors are touched ONLY to exactly re-rank each query's
    * [[RerankFactor]]·k ADC survivors (two bounded broadcasts: the
    * shortlist ids against the corpus, the query vectors against the
    * survivors). Codes quantize the RESIDUAL u − cellCentroid and the
    * scorer adds back the exact coarse term dot(q, centroid) — the
    * IVFADC coupling, which is what holds recall at depth (raw-vector
    * codes measured 0.26 recall at 200k synthesized vectors; see
    * [[pqCodebooks]]). At cluster scale the codes frame is the thing a
    * serving tier would pin in memory: n×16 B instead of n×(8+4·dim) B. */
  def annIvfPq(corpus: DataFrame, queries: DataFrame, k: Int,
      excludeSelf: Boolean = true,
      cells: Int = 0, nProbe: Int = 0, rerank: Int = 0): DataFrame = {
    val s = corpus.sparkSession
    import graft.functions.PqFunctions
    // train + encode + re-rank reuse; n observed on the checkpoint job
    // (one barrier) instead of a second scan of the source
    val (e, n) = graft.core.Caching.checkpointCounted(withNorm(s, corpus))
    val cCells = if (cells > 0) cells else ivfConfig(n)._1
    val cProbe = if (nProbe > 0) nProbe else probeFor(cCells)
    val cRerank = if (rerank > 0) rerank else defaultRerank(k, n)
    // ONE shared TakeOrdered sample collect serves both quantizer
    // trainings: the coarse-centroid and codebook samples are prefixes
    // of the same deterministic hash order, so slicing reproduces each
    // side bit-for-bit while halving the driver-side sample jobs
    val shared = trainSample(e, math.max(centroidSampleN(cCells), PqSampleN))
    val cents = kmeansCentroidsFrom(shared.take(centroidSampleN(cCells)), cCells)
    // codebooks quantize the RESIDUAL u − cellCentroid (IVFADC); the
    // exact coarse term dot(q, centroid) is the probe's csim
    val cb = pqCodebooksFrom(shared.take(PqSampleN), cents)
    // the slim code frame: the ONLY corpus-sized input to the probe
    // join. Assignment and residual encoding are two PROJECTIONS over
    // the corpus row — no aggregate, no join, no shuffle in the build
    val codes = e
      .withColumn("cell", VectorFunctions.nearestCell(s, col("v"), cents))
      .select(col("vec_id"), col("cell"),
        PqFunctions.pqEncodeRes(s, col("v"), col("cell"), cents, cb).as("codes"))
    pqSearch(codes, e, queries, k, cents, cb, cProbe, cRerank, excludeSelf)
  }

  /** Default ADC shortlist depth — see [[RerankFactor]]. */
  private[graft] def defaultRerank(k: Int, n: Long): Int =
    math.max(RerankFactor * k,
      5 * math.ceil(math.sqrt(math.max(1L, n).toDouble)).toInt)

  /** The IVF-PQ query tail, shared verbatim by the batch path
    * ([[annIvfPq]]) and the persisted index
    * ([[graft.index.PqIndex.query]]) — same plan over whatever codes /
    * vecs frames the caller supplies, so the indexed path reproduces
    * the batch path by construction. `vecs` carries (vec_id, v, norm)
    * and is touched only for the bounded re-rank. */
  private[graft] def pqSearch(codes: DataFrame, vecs: DataFrame,
      queries: DataFrame, k: Int, cents: Array[Array[Double]],
      cb: Array[Array[Array[Double]]], nProbe: Int, rerank: Int,
      excludeSelf: Boolean): DataFrame = {
    val s = codes.sparkSession
    import graft.functions.PqFunctions
    val cent = centFrame(s, cents)
    val q = withNorm(s, queries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("norm").as("qn"))
    // the 16 KB ADC table broadcasts ONCE per query, not per probed cell
    val probes = ivfProbes(s, q, cent, nProbe)
      .select(col("query_id"), col("cell"), col("csim"))
    val luts = q.select(col("query_id"), PqFunctions.pqLut(s, col("qv"), cb).as("lut"))
    val wAdc = Window.partitionBy(col("query_id")).orderBy(col("adc").desc, col("vec_id"))
    val shortlist = codes.join(broadcast(probes), Seq("cell"))
      .filter(if (excludeSelf) col("vec_id") =!= col("query_id") else lit(true))
      .join(broadcast(luts), Seq("query_id"))
      .withColumn("adc",
        col("csim") + PqFunctions.pqAdc(s, col("codes"), col("lut")))
      .withColumn("ar", row_number().over(wAdc))
      .filter(col("ar") <= rerank)
      .select(col("query_id"), col("vec_id"))
    // exact re-rank of the bounded shortlist: the vector frame streams
    // once and keeps only ≤ queries·rerank ids — never a corpus shuffle
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    vecs.join(broadcast(shortlist), "vec_id")
      .join(broadcast(q), "query_id")
      .withColumn("cosine", VectorFunctions.dot(s, col("v"), col("qv")) / (col("norm") * col("qn")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"),
        round(col("cosine"), 2).as("cosine"))
      .orderBy(col("query_id"), col("rank"))
  }

  def annIvfPq(s: SparkSession, dir: String): DataFrame = {
    val all = Tables.load(s, dir, "embeddings")
    annIvfPq(all, all.filter(col("vec_id") < NumQueries), K)
  }

  /** s05: the persisted-index serving path — first call per corpus
    * builds [[graft.index.PqIndex]] under a content-fingerprint-keyed
    * cache path (amortized across queries like t14's postings index);
    * every call after that touches the 16 B/vector codes (cell
    * partitions pruned by the probe set) plus bounded vector fetches. */
  def annIvfPqIndexed(s: SparkSession, dir: String): DataFrame = {
    val all = Tables.load(s, dir, "embeddings")
    val path = graft.index.IndexCache.pathFor(s, s"$dir/embeddings.parquet", "pqidx")
    // the cache path is content-fingerprinted: any corpus change lands
    // at a NEW path, so a ready index at THIS path cannot have drifted
    // — ensure() (and its corpus count + meta read) only runs cold.
    // The library ensure() keeps its drift policy for append-style
    // paths whose location is stable across ingests.
    if (!graft.index.PqIndex.ready(s, path))
      graft.index.PqIndex.ensure(all, path, all.count())
    graft.index.PqIndex.query(s, path, all.filter(col("vec_id") < NumQueries), K)
  }

  /** Independent signature tables for query-ANN: recall comes from the
    * OR over tables (1−(1−p^bits)^tables), the standard LSH knob — one
    * table with deeper multi-probe flattens toward a scan; more tables
    * keep per-bucket candidate lists tight while recall climbs. The
    * same family (6 bits, hash-derived planes) as the d05 near-dup
    * path, which measures recall 1.0 at its threshold. */
  private val AnnTables = 8

  /** LSH-bucketed ANN: each vector lands in one bucket per signature
    * table; a query probes its bucket and every 1-bit flip in EVERY
    * table (probes are broadcast with the queries — the corpus side
    * streams through one equi-join, no shuffle of vectors).
    *
    * Payload discipline — the load-bearing shape at scale: the bucket
    * join and the multi-table dedup run over SLIM (id, tbl, sig) rows
    * only. An earlier formulation carried the full vectors (v, qv,
    * norms — ~1 KB/row at 64 dims) through the dedup shuffle, which
    * measured 40× cost per 10× corpus at the 200k-vector scaling point
    * (spill-bound); deduping 16-byte id pairs and re-attaching vectors
    * once per DISTINCT candidate makes the shuffled bytes ∝ candidate
    * count, not candidate count × vector width. Each candidate then
    * pays its dot product exactly once: query vectors re-attach by
    * broadcast (queries are few), corpus vectors by an id equi-join. */
  def annLsh(corpus: DataFrame, queries: DataFrame, k: Int,
      excludeSelf: Boolean = true): DataFrame = {
    val s = corpus.sparkSession
    def sigs(df: DataFrame, idAs: String): DataFrame =
      df.select(col("vec_id").as(idAs),
        posexplode(graft.functions.LshFunctions.lshSigs(
          s, col("v"), SigSeed, Planes, AnnTables)).as(Seq("tbl", "sig")))
    // sigs + scoring reuse; the bcast-bound count rides the ckpt job
    val (e, nE) = graft.core.Caching.checkpointCounted(withNorm(s, corpus))
    val q = withNorm(s, queries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("norm").as("qn"))
    val flips: Seq[Long] = 0L +: (0 until Planes).map(b => 1L << b)
    val probes = sigs(withNorm(s, queries), "query_id")
      .select(col("query_id"), col("tbl"),
        explode(array(flips.map(m => col("sig").bitwiseXOR(lit(m))): _*)).as("sig"))
    val cand = sigs(e, "vec_id")
      .join(broadcast(probes), Seq("tbl", "sig"))
      .filter(if (excludeSelf) col("vec_id") =!= col("query_id") else lit(true))
      .select(col("query_id"), col("vec_id"))
      .dropDuplicates("query_id", "vec_id") // multi-table collisions: score once
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    cand
      // corpus vectors re-attach once per distinct candidate; under the
      // byte budget the vector table broadcasts, so the small-corpus
      // path pays no shuffle for the attach (the r7 slim-dedup rewrite
      // cost ~2× at sf0.1 through exactly this join) while the sf10
      // shape — shuffle equi-join — is unchanged
      .join(Dedup.bcastIf(540, nE)(e), "vec_id")
      .join(broadcast(q), "query_id")
      .withColumn("cosine", VectorFunctions.dot(s, col("v"), col("qv")) / (col("norm") * col("qn")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"),
        round(col("cosine"), 2).as("cosine"))
      .orderBy(col("query_id"), col("rank"))
  }

  def annLsh(s: SparkSession, dir: String): DataFrame = {
    val all = Tables.load(s, dir, "embeddings")
    annLsh(all, all.filter(col("vec_id") < NumQueries), K)
  }

  /** The recall floor every approximate path must clear, pinned
    * in-suite (PipelineOpsSpec) and — as of r17 — in the driver gate
    * itself via [[recallChecked]]. Measured recalls across the
    * sf0.001–sf10 ladder sit at 0.82–0.96 (SCALING json `recall_*`
    * fields), so 0.80 is a true floor, not a tuned pass line. */
  private[graft] val RecallFloor = 0.8

  /** Bound-assertion form of an approximate ANN result (the r16
    * verdict's conversion recipe): per query, the recall of `approx`
    * against the exact brute top-k, plus a 0/1 gate asserting the
    * MEAN recall clears [[RecallFloor]] — the mean, not per query,
    * because the pinned contract (PipelineOpsSpec, the BENCH/SCALING
    * `recall_*` fields) is the mean; individual queries legitimately
    * dip (measured 0.7 on one sf0.01 LSH query inside a 0.82 mean).
    * The gate is micro-averaged in INTEGER arithmetic
    * (Σhits·5 ≥ Σexact·4 ⇔ mean ≥ 0.8 when every query has the same
    * k) so no float boundary can flip it between engines. All frames
    * are top-k-sized; the gate row joins back by broadcast cross —
    * no driver collect. The driver oracle re-derives per-query recall
    * in SQL from the exported approx neighbor sets against ITS OWN
    * brute top-k and pins the gate to literal 1, so a recall
    * regression (or a buggy engine-side recall computation) fails the
    * CORRECTNESS row instead of surfacing only as a bench footnote. */
  def recallChecked(s: SparkSession, dir: String, approx: DataFrame): DataFrame = {
    val exact = annBrute(s, dir).select(col("query_id"), col("neighbor_id"))
    val hits = exact
      .join(approx.select(col("query_id"), col("neighbor_id")),
        Seq("query_id", "neighbor_id"))
      .groupBy(col("query_id")).agg(count(lit(1)).as("n_hit"))
    val per = exact.groupBy(col("query_id")).agg(count(lit(1)).as("n_exact"))
      .join(hits, Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"), col("n_exact"))
    val gate = per.agg(
      when(sum(col("n_hit")) * 5 >= sum(col("n_exact")) * 4, 1L)
        .otherwise(0L).as("above_floor"))
    per.crossJoin(broadcast(gate))
      .select(col("query_id"),
        round(col("n_hit") / col("n_exact"), 2).as("recall"),
        col("above_floor"))
      .orderBy(col("query_id"))
  }

  // The driver-contract checked forms of s02–s05 (the raw top-k frames
  // remain the library API; these wrap them in the recall gate the
  // oracle can re-derive).
  def annLshChecked(s: SparkSession, dir: String): DataFrame =
    recallChecked(s, dir, annLsh(s, dir))
  def annIvfChecked(s: SparkSession, dir: String): DataFrame =
    recallChecked(s, dir, annIvf(s, dir))
  def annIvfPqChecked(s: SparkSession, dir: String): DataFrame =
    recallChecked(s, dir, annIvfPq(s, dir))
  def annIvfPqIndexedChecked(s: SparkSession, dir: String): DataFrame =
    recallChecked(s, dir, annIvfPqIndexed(s, dir))

  /** Mean per-query recall of `approx` against the exact brute-force
    * top-k over the same dir — the round-over-round regression metric
    * the bench records next to each ANN timing (a one-time spec pin
    * can't catch drift; a recall field in BENCH/SCALING json can).
    * Both result sets are top-k per query (≤ NumQueries·K rows), so
    * the collect is bounded regardless of corpus size. */
  def recallVsBrute(s: SparkSession, dir: String, approx: DataFrame): Double =
    recallOf(annBrute(s, dir), approx)

  /** Mean per-query recall of `approx` against an exact top-k frame —
    * both are top-k per query (≤ queries·k rows), so the collect is
    * bounded regardless of corpus size. */
  def recallOf(exact0: DataFrame, approx: DataFrame): Double = {
    def sets(df: DataFrame): Map[Long, Set[Long]] = df.collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")))
      .groupBy(_._1).map { case (q, rs) => q -> rs.map(_._2).toSet }
    val exact = sets(exact0)
    val got = sets(approx)
    if (exact.isEmpty) 0.0
    else exact.map { case (q, ex) =>
      if (ex.isEmpty) 1.0
      else (got.getOrElse(q, Set.empty[Long]) & ex).size.toDouble / ex.size
    }.sum / exact.size
  }
}
