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
  * Θ(Σ cell²) = Θ(n²/cells): with [[Similarity.ivfConfig]]'s
  * 4√n cell growth that is Θ(n^1.5)/8 up to the 1024-cell cap —
  * at larger corpora `cells` must grow ∝ n (the paper runs 50k
  * clusters for LAION; pass `cells` explicitly, or lift the cap the
  * way s03's scaladoc describes for two-level IVF). The per-cell
  * quadratic is the method's published cost model, not an
  * implementation shortcut.
  */
object SemanticDedup {

  /** The paper tunes ε per corpus; 0.7 suits the synthetic corpus's
    * planted-duplicate structure (production τ=0.8 pairs remain
    * in-range, ambient isotropic pairs stay far below). */
  val DefaultTau = 0.7

  /** Per-vector semantic-dedup decision frame:
    * (vec_id, cell, centroid_sim, is_dup). `is_dup = 1` marks vectors
    * the policy drops; survivors are `is_dup = 0`. */
  def semanticDedup(corpus: DataFrame, tau: Double = DefaultTau,
      cells: Int = 0): DataFrame = {
    val s = corpus.sparkSession
    val e = Similarity.withNorm(s, corpus)
    val n = corpus.count()
    val cCells = if (cells > 0) cells else Similarity.ivfConfig(n)._1
    val cents = Similarity.kmeansCentroids(s, e, cCells)
    val cent = Similarity.centFrame(s, cents)
    // assignment is a projection; csim via one broadcast join against
    // the tiny unit-norm centroid frame
    val indexed = e
      .withColumn("cell", VectorFunctions.nearestCell(s, col("v"), cents))
      .join(broadcast(cent.select(col("cell"), col("cv"))), Seq("cell"))
      .withColumn("csim", VectorFunctions.dot(s, col("v"), col("cv")) / col("norm"))
      .select(col("cell"), col("vec_id"), col("v"), col("norm"), col("csim"))
    val rowBytes = 8L + 64 * 8 + 8 + 8 + 8 // cell + v + norm + csim + id
    val a = indexed.select(col("cell"), col("vec_id").as("id_a"),
      col("v").as("va"), col("norm").as("na"), col("csim").as("ca"))
    val b = indexed.select(col("cell"), col("vec_id").as("id_b"),
      col("v").as("vb"), col("norm").as("nb"), col("csim").as("cb"))
    val pairs = a
      .join(Dedup.bcastOrHashIf(rowBytes, n, Seq("cell"))(b), Seq("cell"))
      .filter(col("id_a") < col("id_b"))
      .filter(VectorFunctions.dot(s, col("va"), col("vb"))
        / (col("na") * col("nb")) >= tau)
    // each ≥τ pair drops its (csim, id)-greater member
    val dropped = pairs.select(
      when(col("ca") > col("cb") ||
           (col("ca") === col("cb") && col("id_a") > col("id_b")),
        col("id_a")).otherwise(col("id_b")).as("vec_id"))
      .distinct()
    indexed
      .select(col("vec_id"), col("cell"), round(col("csim"), 4).as("centroid_sim"))
      .join(Dedup.bcastIf(16, n)(dropped.withColumn("is_dup", lit(1L))),
        Seq("vec_id"), "left")
      .withColumn("is_dup", coalesce(col("is_dup"), lit(0L)))
      .orderBy(col("vec_id"))
  }

  /** Driver binding over [[Dedup.plantedProductionCorpus]] (the d06
    * convention) so the decision frame is non-trivially populated at
    * test SFs — the isotropic base corpus has no ≥τ semantic pairs. */
  def semanticDedup(s: SparkSession, dir: String): DataFrame =
    semanticDedup(Dedup.plantedProductionCorpus(
      Tables.load(s, dir, "embeddings")))
}
