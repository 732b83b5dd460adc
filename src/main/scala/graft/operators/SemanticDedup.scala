package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.VectorFunctions

/** SemDeDup — semantic deduplication by k-means-cell-scoped cosine
  * pruning (Abbas et al., "SemDeDup: Data-efficient learning at
  * web-scale through semantic deduplication", arXiv:2303.09540). The
  * embedding-space complement of the near-dup family: d05/d06 find
  * NEAR-COPIES (high τ, any pair, LSH-bucketed); SemDeDup removes
  * SEMANTIC redundancy (lower τ) while deliberately scoping the pair
  * search to k-means cells — the cell structure IS the algorithm, not
  * an approximation of all-pairs, because cross-cell pairs are by
  * construction not the redundancy the method targets.
  *
  * Algorithm, as published: (1) k-means the corpus embeddings;
  * (2) within each cell, find pairs with cosine ≥ τ; (3) from each
  * duplicate relation keep the example with the LOWEST similarity to
  * its cell centroid (the paper's best-performing keep policy — it
  * biases the kept set away from cluster cores, preserving diversity).
  * Our pairwise spelling is deterministic: x is dropped iff some
  * same-cell neighbor y (cosine ≥ τ) precedes it in
  * (centroid_sim, vec_id) order — so each duplicate group keeps
  * exactly its minimal member under that order, plus any member whose
  * only ≥τ neighbors rank above it.
  *
  * Scale shape: centroid training reuses the IVF machinery
  * ([[Similarity.kmeansCentroids]] — bounded sample, deterministic);
  * assignment is a codegen projection (no join); the within-cell
  * self-join shuffles the corpus ONCE keyed by cell, with the build
  * side hash-built under [[Dedup.bcastOrHashIf]]'s per-partition byte
  * budget (never a sort of the pair stream). Pair volume is
  * Θ(Σ cell²) = Θ(n²/cells), so the CELL COUNT MUST GROW ∝ n — the
  * paper runs 50k clusters for LAION. Up to the coarse cap
  * ([[Similarity.ivfConfig]]'s 1024) a single k-means level suffices;
  * past it, single-level Lloyd is the binding cost (driver training is
  * Θ(sample·cells·dim) per iteration, quadratic in cells at
  * sample ∝ cells), so cells grow TWO-LEVEL: the coarse level stays at
  * the cap, and each coarse cell splits into `subPerCell =
  * ⌈(n/[[DeepCellWidth]])/coarse⌉` sub-cells trained per-cell on a
  * hash-deterministic sample (Θ(sample·subPerCell·dim) total — linear
  * in total cells). Assignment stays a projection: one coarse argmax
  * (codegen [[graft.functions.NearestCentroid]]) plus one argmax over
  * the coarse cell's slice of the flat sub-centroid matrix
  * ([[graft.functions.NearestSubCentroid]]). The keep policy's
  * centroid_sim is measured against the SUB-cell centroid — the cell
  * that scopes the pair search is the cluster the policy ranks
  * within, exactly as published. */
object SemanticDedup {

  /** The paper tunes ε per corpus; 0.7 suits the synthetic corpus's
    * planted-duplicate structure (production τ=0.8 pairs remain
    * in-range, ambient isotropic pairs stay far below). */
  val DefaultTau = 0.7

  /** Target MEAN cell width once the coarse cap binds: pair volume is
    * Θ(n·width) at constant width, so this is the knob that keeps the
    * method linear at any corpus size (512 ⇒ ~131k candidate dots per
    * cell — the LAION paper's cells are wider because its per-cell
    * pairwise runs on GPUs; ours is a CPU hash-join budget). */
  val DeepCellWidth = 512L

  /** Sub-cells per coarse cell for a corpus of `n` vectors: 1 until
    * the coarse cap binds (n ≤ DeepCellWidth·coarse ≈ 524k at the
    * 1024 cap), then grows so total cells ≈ n / DeepCellWidth. */
  private[graft] def subPerCellFor(n: Long, coarse: Int): Int = {
    val target = (n + DeepCellWidth - 1) / DeepCellWidth
    math.max(1, math.ceil(target.toDouble / coarse).toInt)
  }

  /** Per-vector semantic-dedup decision frame:
    * (vec_id, cell, centroid_sim, is_dup). `is_dup = 1` marks vectors
    * the policy drops; survivors are `is_dup = 0`. An explicit
    * `cells` pins a single-level layout (test/tuning hook); the
    * default sizes coarse cells via [[Similarity.ivfConfig]] and grows
    * sub-cells past the cap. */
  def semanticDedup(corpus: DataFrame, tau: Double = DefaultTau,
      cells: Int = 0): DataFrame = {
    val n = corpus.count()
    val coarse = if (cells > 0) cells else Similarity.ivfConfig(n)._1
    val sub = if (cells > 0) 1 else subPerCellFor(n, coarse)
    semanticDedupCells(corpus, tau, coarse, sub, n)
  }

  /** [[semanticDedup]] with the two-level layout explicit (the spec
    * exercises the deep path at test scale with a small coarse count
    * and subPerCell > 1). */
  private[graft] def semanticDedupCells(corpus: DataFrame, tau: Double,
      coarse: Int, subPerCell: Int, n: Long): DataFrame = {
    val s = corpus.sparkSession
    val e = Similarity.withNorm(s, corpus)
    val cents = Similarity.kmeansCentroids(s, e, coarse)
    val subCents =
      if (subPerCell <= 1) null
      else trainSubCentroids(s, e, cents, subPerCell)
    semanticDedupWithCents(e, tau, cents, subCents, subPerCell, n)
  }

  /** [[semanticDedupCells]] under FROZEN centroids — the shared spine
    * of the batch path and [[graft.index.SemDedupIndex]]'s build and
    * incremental-equivalence contract (a maintained index must equal
    * THIS over corpus ∪ deltas: only the training step sees different
    * data between the two paths). `e` already carries
    * (vec_id, v, norm). */
  private[graft] def semanticDedupWithCents(e: DataFrame, tau: Double,
      cents: Array[Array[Double]], subCents: Array[Array[Double]],
      subPerCell: Int, n: Long): DataFrame = {
    val indexed = assignFrame(e, cents, subCents, subPerCell)
    decisionsFrame(indexed, dropsFrame(indexed, tau, n), n)
  }

  /** (cell, vec_id, v, norm, csim) under frozen one- or two-level
    * centroids; csim is always against the cell that scopes the pair
    * search. Codegen projections + one tiny broadcast join — the
    * corpus never shuffles here. */
  private[graft] def assignFrame(e: DataFrame,
      cents: Array[Array[Double]], subCents: Array[Array[Double]],
      subPerCell: Int): DataFrame = {
    val s = e.sparkSession
    if (subPerCell <= 1) {
      val cent = Similarity.centFrame(s, cents)
      e.withColumn("cell", VectorFunctions.nearestCell(s, col("v"), cents))
        .join(broadcast(cent.select(col("cell"), col("cv"))), Seq("cell"))
        .withColumn("csim",
          VectorFunctions.dot(s, col("v"), col("cv")) / col("norm"))
        .select(col("cell"), col("vec_id"), col("v"), col("norm"), col("csim"))
    } else {
      val subFrame = Similarity.centFrame(s, subCents)
      e.withColumn("c0", VectorFunctions.nearestCell(s, col("v"), cents))
        .withColumn("cell", VectorFunctions.nearestSubCell(
          s, col("v"), col("c0"), subCents, subPerCell))
        .join(broadcast(subFrame.select(col("cell"), col("cv"))), Seq("cell"))
        .withColumn("csim",
          VectorFunctions.dot(s, col("v"), col("cv")) / col("norm"))
        .select(col("cell"), col("vec_id"), col("v"), col("norm"), col("csim"))
    }
  }

  /** Bytes per assigned-member row (cell + v + norm + csim + id) —
    * the hash-build budget unit for the within-cell joins. */
  private[graft] val MemberRowBytes = 8L + 64 * 8 + 8 + 8 + 8

  /** The same-cell ≥τ drop set over an assigned frame: each pair
    * drops its (csim, id)-greater member. */
  private[graft] def dropsFrame(indexed: DataFrame, tau: Double,
      n: Long): DataFrame = {
    val s = indexed.sparkSession
    val a = indexed.select(col("cell"), col("vec_id").as("id_a"),
      col("v").as("va"), col("norm").as("na"), col("csim").as("ca"))
    val b = indexed.select(col("cell"), col("vec_id").as("id_b"),
      col("v").as("vb"), col("norm").as("nb"), col("csim").as("cb"))
    val pairs = a
      .join(Dedup.bcastOrHashIf(MemberRowBytes, n, Seq("cell"))(b), Seq("cell"))
      .filter(col("id_a") < col("id_b"))
      .filter(VectorFunctions.dot(s, col("va"), col("vb"))
        / (col("na") * col("nb")) >= tau)
    pairs.select(dupSide.as("vec_id")).distinct()
  }

  /** The (csim, id)-greater side of a scored pair — the member each
    * ≥τ relation drops. Shared by the batch drop set and the index's
    * incremental probe so the keep policy cannot diverge. */
  private[graft] def dupSide: org.apache.spark.sql.Column =
    when(col("ca") > col("cb") ||
         (col("ca") === col("cb") && col("id_a") > col("id_b")),
      col("id_a")).otherwise(col("id_b"))

  /** Decision frame from an assigned frame + drop set. The drop set
    * broadcasts in the common case; past the budget it hash-builds on
    * the join key ([[Dedup.bcastOrHashIf]]) — a corpus-sized drop set
    * must exchange, but the corpus side must never SORT (the PLANS.md
    * SMJ audit's contract for every decision join). */
  private[graft] def decisionsFrame(indexed: DataFrame, dropped: DataFrame,
      n: Long): DataFrame =
    indexed
      .select(col("vec_id"), col("cell"), round(col("csim"), 4).as("centroid_sim"))
      .join(Dedup.bcastOrHashIf(16, n, Seq("vec_id"))(
          dropped.withColumn("is_dup", lit(1L))),
        Seq("vec_id"), "left")
      .withColumn("is_dup", coalesce(col("is_dup"), lit(0L)))
      .orderBy(col("vec_id"))

  private def ddot(x: Array[Double], y: Array[Double]): Double = {
    var s0 = 0.0; var i = 0
    while (i < x.length && i < y.length) { s0 += x(i) * y(i); i += 1 }
    s0
  }

  /** Flat sub-centroid matrix (row `c·subPerCell + j` = sub-centroid j
    * of coarse cell c) trained per coarse cell on a hash-deterministic
    * sample: one bounded collect (≤32 points per target sub-cell,
    * capped at 256k rows), driver-side assignment to coarse cells,
    * then a tiny k-center + Lloyd per cell — Θ(sample·subPerCell·dim)
    * total, LINEAR in total cells where single-level training is
    * quadratic. A cell whose sample is thinner than its sub count pads
    * with the coarse centroid (duplicate rows are harmless: argmax
    * ties resolve to the lowest index). */
  private[graft] def trainSubCentroids(s: SparkSession, e: DataFrame,
      coarse: Array[Array[Double]], subPerCell: Int): Array[Array[Double]] = {
    val k = coarse.length
    val sampleN = math.min(32L * k * subPerCell, 262144L).toInt
    // materialize the sort-limit executor-side first: a bare
    // collect() on TakeOrdered ships every partition's top-N prefix
    // to the driver (30 partitions × 131k rows blew
    // spark.driver.maxResultSize at the 2M probe); the checkpoint
    // funnels through a shuffle and the collect is sample-sized
    val sample: Array[Array[Double]] = e
      .filter(col("norm") > 0)
      .orderBy(xxhash64(col("vec_id")), col("vec_id"))
      .limit(sampleN)
      .select(col("v"), col("norm"))
      .localCheckpoint(true)
      .collect()
      .map { r =>
        val nn = r.getDouble(1)
        r.getSeq[Double](0).toArray.map(_ / nn)
      }
    val byCell = Array.fill(k)(scala.collection.mutable.ArrayBuffer[Array[Double]]())
    sample.foreach { v =>
      var best = 0; var bd = Double.MinValue; var c = 0
      while (c < k) {
        val d = ddot(v, coarse(c)); if (d > bd) { bd = d; best = c }; c += 1
      }
      byCell(best) += v
    }
    val flat = new Array[Array[Double]](k * subPerCell)
    var c = 0
    while (c < k) {
      val cs = subKmeans(byCell(c).toArray, subPerCell, coarse(c))
      var j = 0
      while (j < subPerCell) { flat(c * subPerCell + j) = cs(j); j += 1 }
      c += 1
    }
    flat
  }

  /** Tiny deterministic k-means over one cell's sample: k-center
    * seeding (max-dot farthest-first, the [[Similarity
    * .kmeansCentroids]] construction) + 5 Lloyd rounds; short cells
    * pad with `fallback`. */
  private def subKmeans(sample: Array[Array[Double]], k: Int,
      fallback: Array[Double]): Array[Array[Double]] = {
    if (sample.isEmpty) return Array.fill(k)(fallback)
    val kk = math.min(k, sample.length)
    val cents = scala.collection.mutable.ArrayBuffer[Array[Double]](sample(0))
    val bestDot = sample.map(ddot(_, sample(0)))
    while (cents.size < kk) {
      var pick = 0; var i = 1
      while (i < sample.length) {
        if (bestDot(i) < bestDot(pick)) pick = i
        i += 1
      }
      val cnew = sample(pick)
      cents += cnew
      var j = 0
      while (j < sample.length) {
        val d = ddot(sample(j), cnew)
        if (d > bestDot(j)) bestDot(j) = d
        j += 1
      }
    }
    var cur = cents.toArray
    val dim = sample(0).length
    for (_ <- 0 until 5) {
      val sums = Array.fill(kk)(new Array[Double](dim))
      val counts = new Array[Int](kk)
      sample.foreach { v =>
        var best = 0; var bd = ddot(cur(0), v); var c = 1
        while (c < kk) {
          val d = ddot(cur(c), v); if (d > bd) { bd = d; best = c }; c += 1
        }
        counts(best) += 1
        var i = 0
        while (i < dim) { sums(best)(i) += v(i); i += 1 }
      }
      cur = cur.zipWithIndex.map { case (old, c) =>
        if (counts(c) == 0) old
        else {
          val m = sums(c)
          val nn = math.sqrt(ddot(m, m))
          if (nn > 0) m.map(_ / nn) else old
        }
      }
    }
    cur ++ Array.fill(k - kk)(fallback)
  }

  /** Driver binding over [[Dedup.plantedProductionCorpus]] (the d06
    * convention) so the decision frame is non-trivially populated at
    * test SFs — the isotropic base corpus has no ≥τ semantic pairs. */
  def semanticDedup(s: SparkSession, dir: String): DataFrame =
    semanticDedup(Dedup.plantedProductionCorpus(
      Tables.load(s, dir, "embeddings")))

  /** Incremental SemDeDup decisions for a 1-in-`mod` delta against the
    * persisted index (d15b — the d07/d13 cadence shape for semantic
    * dedup): the corpus is assigned, paired, and decided ONCE into
    * [[graft.index.SemDedupIndex]]; each batch assigns only the delta
    * under the frozen centroids and compares it against its touched
    * cells' members. Returns the batch's decision updates: the delta's
    * decision rows plus any corpus member the delta RETROACTIVELY
    * drops (a delta vector ranking below a corpus keeper in
    * (centroid_sim, id) order drops the keeper — the published policy
    * is order-based, not arrival-based, so maintenance must be able to
    * flip corpus decisions, exactly like d14's label takeover). */
  /** Build-if-absent for d15b's persisted index — the one-time
    * train+assign+pair pass over the corpus slice, exposed separately
    * so the scaling harness times it as its own build-phase row. */
  private[graft] def ensureSemDedupIndexMod(s: SparkSession, dir: String,
      mod: Int): String = {
    val e = Dedup.plantedProductionCorpus(Tables.load(s, dir, "embeddings"))
    val idxPath = graft.index.IndexCache.pathFor(
      s, s"$dir/embeddings.parquet", s"semdedup-mod=$mod")
    // content-fingerprinted path: a ready index cannot have drifted, so
    // the warm call skips ensure()'s per-call corpus count (the library
    // ensure keeps its staleness policy for stable-location paths)
    if (!graft.index.SemDedupIndex.ready(s, idxPath))
      graft.index.SemDedupIndex.ensure(
        e.filter(col("vec_id") % mod =!= 0), idxPath)
    idxPath
  }

  def semanticDedupIncrementalMod(s: SparkSession, dir: String,
      mod: Int): DataFrame = {
    val e = Dedup.plantedProductionCorpus(Tables.load(s, dir, "embeddings"))
    val idxPath = ensureSemDedupIndexMod(s, dir, mod)
    graft.index.SemDedupIndex.probe(e.filter(col("vec_id") % mod === 0), idxPath)
  }

  /** The trained centroid frame (cell, cv) of the d15 batch layout
    * over the driver corpus — the export the d15 DuckDB oracle
    * consumes ([[graft.Verify]] writes it; the oracle re-derives
    * assignment, within-cell pairing and the (centroid_sim, id) keep
    * policy in SQL against it). Recomputation here is bit-identical
    * to the centroids the d15 query trains internally:
    * [[Similarity.kmeansCentroids]] is deterministic (hash-ordered
    * sample, farthest-first seeding, fixed-order chunk merge) and
    * runs on the same frame in the same JVM. Single-level layouts
    * only — d15's oracle validity bound keeps the corpus below the
    * two-level regime, where the SQL's flat argmax would diverge
    * from the hierarchical assignment. */
  private[graft] def trainedCentFrame(s: SparkSession, dir: String): DataFrame = {
    val e = Similarity.withNorm(s,
      Dedup.plantedProductionCorpus(Tables.load(s, dir, "embeddings")))
    val n = e.count()
    val coarse = Similarity.ivfConfig(n)._1
    require(subPerCellFor(n, coarse) == 1,
      s"d15 oracle export is single-level only (n=$n outgrew the " +
        "coarse cap; the validity bound should have omitted this oracle)")
    Similarity.centFrame(s, Similarity.kmeansCentroids(s, e, coarse))
      .select(col("cell"), col("cv"))
  }

  /** The persisted d15b index's FROZEN centroids as (cell, cv) —
    * ensure()s the index first (idempotent), so the export always
    * reflects exactly the geometry the d15b query probed under.
    * Same single-level restriction as [[trainedCentFrame]]. */
  private[graft] def indexCentFrame(s: SparkSession, dir: String,
      mod: Int): DataFrame = {
    val path = ensureSemDedupIndexMod(s, dir, mod)
    val (_, _, sub, _) = graft.index.SemDedupIndex.meta(s, path)
    require(sub == 1,
      s"d15b oracle export is single-level only (subPerCell=$sub; the " +
        "validity bound should have omitted this oracle)")
    s.read.parquet(s"$path/cents").filter(col("lvl") === 0)
      .select(col("idx").as("cell"), col("cv"))
  }
}
