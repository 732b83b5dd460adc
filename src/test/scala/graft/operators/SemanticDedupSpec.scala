package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.core.Tables

/** SemDeDup ([[SemanticDedup.semanticDedup]]): planted duplicates must
  * be recovered with one survivor per group under the
  * lowest-centroid-similarity keep policy, and the result must be
  * deterministic. */
class SemanticDedupSpec extends SparkSpec {
  import spark.implicits._

  test("planted duplicate pairs are recovered (≥90%), never both dropped") {
    val corpus = Dedup.plantedProductionCorpus(
      Tables.load(spark, Sf001, "embeddings"))
    val res = SemanticDedup.semanticDedup(corpus, tau = 0.7).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    val planted = (0 until 20).map(i => (i.toLong, i.toLong + 1000000L))
    val recovered = planted.count { case (a, b) => res(a) == 1L || res(b) == 1L }
    assert(recovered >= 18, s"recovered only $recovered/20 planted pairs")
    // the keep policy never drops a whole group: each planted pair
    // keeps at least one member unless a third ≥τ neighbor exists
    // (none do in the isotropic corpus)
    planted.foreach { case (a, b) =>
      assert(res(a) == 0L || res(b) == 0L, s"both of ($a,$b) dropped")
    }
  }

  test("keep policy selects the (centroid_sim, id)-minimal member of a tight group") {
    // two far-apart bundles; in bundle one, three near-identical
    // vectors (a fully connected ≥τ group) plus one loner
    def vec(base: Array[Double], eps: Double): Array[Double] =
      base.zipWithIndex.map { case (x, i) => x + eps * math.cos(i + 1) }
    val e1 = Array.tabulate(64)(i => if (i == 0) 10.0 else 0.1)
    val e2 = Array.tabulate(64)(i => if (i == 1) 10.0 else -0.1)
    val rows = Seq(
      (0L, vec(e1, 0.0)), (1L, vec(e1, 0.01)), (2L, vec(e1, 0.02)),
      (3L, vec(e2, 0.0)), (4L, vec(e2, 0.5)), (5L, vec(e2, 1.0)),
      (6L, vec(e1, 3.0)))
    val corpus = rows.toDF("vec_id", "embedding")
    val res = SemanticDedup.semanticDedup(corpus, tau = 0.999, cells = 2)
      .collect().map(r => (r.getLong(0), r.getDouble(2), r.getLong(3)))
    val dup = res.map(r => r._1 -> r._3).toMap
    // the tight {0,1,2} group keeps exactly one member — the
    // (centroid_sim, id)-minimal one — and everything else survives
    val group = res.filter(r => r._1 <= 2)
    val keeper = group.minBy(r => (r._2, r._1))._1
    group.foreach { case (id, _, d) =>
      assert(d === (if (id == keeper) 0L else 1L), s"vec $id wrong verdict")
    }
    Seq(3L, 4L, 5L, 6L).foreach(id => assert(dup(id) === 0L, s"vec $id dropped"))
  }

  test("deterministic across runs") {
    val corpus = Tables.load(spark, Sf0001, "embeddings")
    val a = SemanticDedup.semanticDedup(corpus).collect().toSeq
    val b = SemanticDedup.semanticDedup(corpus).collect().toSeq
    assert(a === b)
  }

  test("pair search is cell-scoped: no cartesian product in the plan") {
    val plan = SemanticDedup.semanticDedup(
      Tables.load(spark, Sf0001, "embeddings"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
  }

  test("cell growth: single-level until the coarse cap binds, then sub-cells ∝ n") {
    assert(SemanticDedup.subPerCellFor(2000L, 179) === 1)
    assert(SemanticDedup.subPerCellFor(500000L, 1024) === 1)
    // 2M vectors at width 512 → ~3907 target cells → 4 sub per coarse
    assert(SemanticDedup.subPerCellFor(2000000L, 1024) === 4)
    // one more decade → ~31 sub per coarse (total cells ≈ n/512 holds)
    assert(SemanticDedup.subPerCellFor(16000000L, 1024) === 31)
  }

  test("two-level decisions equal the per-cell brute policy at depth") {
    // the deep layout exercised at test scale: 8 coarse × 4 sub cells
    val corpus = Dedup.plantedProductionCorpus(
      Tables.load(spark, Sf0001, "embeddings"))
    val n = corpus.count()
    val res = SemanticDedup
      .semanticDedupCells(corpus, tau = 0.7, coarse = 8, subPerCell = 4, n = n)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    // two-level cell ids live in [0, coarse·sub)
    assert(res.forall(r => r._2 >= 0 && r._2 < 32))
    val vecs = corpus.collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      def d(x: Array[Double], y: Array[Double]) =
        x.zip(y).map { case (p, q) => p * q }.sum
      d(a, b) / math.sqrt(d(a, a) * d(b, b))
    }
    // drop-set envelope per the published policy, recomputed brute per
    // cell: x dropped iff some same-cell y at cosine ≥ τ precedes it
    // in (centroid_sim, id) order. The frame exposes csim ROUNDED to
    // 4 dp while the engine orders by the exact value, so pairs within
    // one rounding step of each other are order-ambiguous from the
    // outside — those stay flexible (the planted-pair XOR check below
    // still pins them behaviorally); everything beyond the step is
    // certain and must match.
    val byCell = res.groupBy(_._2)
    val certainDrop = scala.collection.mutable.Set[Long]()
    val maybeDrop = scala.collection.mutable.Set[Long]()
    byCell.values.foreach { members =>
      for (x <- members; y <- members if x._1 != y._1) {
        if (cos(vecs(x._1), vecs(y._1)) >= 0.7) {
          if (y._3 + 2e-4 < x._3) certainDrop += x._1
          else if (math.abs(y._3 - x._3) <= 2e-4) maybeDrop += x._1
        }
      }
    }
    val got = res.filter(_._4 == 1L).map(_._1).toSet
    assert(certainDrop.subsetOf(got),
      s"policy must drop ${certainDrop -- got}")
    assert(got.subsetOf(certainDrop ++ maybeDrop),
      s"policy dropped ${got -- certainDrop -- maybeDrop} with no preceding neighbor")
    // and the deep layout still recovers the planted pairs it co-locates
    val cellOf = res.map(r => r._1 -> r._2).toMap
    val coLocated = (0 until 20).map(i => (i.toLong, i + 1000000L))
      .filter { case (a, b) => cellOf(a) == cellOf(b) }
    assert(coLocated.size >= 16, s"only ${coLocated.size}/20 planted pairs co-located")
    coLocated.foreach { case (a, b) =>
      assert(got.contains(a) ^ got.contains(b),
        s"planted pair ($a,$b) should drop exactly one member")
    }
  }
}
