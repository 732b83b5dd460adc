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
}
