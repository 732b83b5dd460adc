package graft.approx

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Property tests for the sketch MERGE LAWS the engine relies on when it
  * splits sketch state across partitions/tables and unions it back
  * (SURVEY §5: "ScalaCheck property tests for … sketch merge laws").
  * Deterministic: generators are sampled from fixed seeds — no flaky
  * boundary draws. */
class SketchLawsSpec extends SparkSpec {

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private val corpusGen: Gen[List[Long]] =
    Gen.chooseNum(0, 400).flatMap(n => Gen.listOfN(n, Gen.chooseNum(-500L, 500L)))

  private def hllBin(xs: Seq[Long]): Array[Byte] = {
    import spark.implicits._
    (if (xs.isEmpty) Seq.empty[Long] else xs).toDF("x")
      .agg(Sketches.hllSketch(col("x")).as("s")).head().getAs[Array[Byte]]("s")
  }

  private def estimate(bins: Seq[Array[Byte]]): Long = {
    import spark.implicits._
    // hll_sketch_agg over ZERO rows yields a null sketch — an empty
    // slice contributes nothing to the union, and an all-empty merge
    // estimates 0 (not an NPE), keeping the laws total over n=0 draws
    val nonNull = bins.filter(_ != null)
    if (nonNull.isEmpty) 0L
    else nonNull.toDF("s")
      .agg(hll_sketch_estimate(hll_union_agg(col("s"), lit(false))).as("e"))
      .head().getLong(0)
  }

  test("HLL merge law: union of split sketches == sketch of the union (any split)") {
    // the law the distributed partial→final aggregation depends on:
    // merging per-slice sketches must equal sketching the whole.
    // Explicit deterministic sampling (the repo's ScalaCheck pattern —
    // DynamicSchemaSpec) keeps the Spark-job property bodies bounded.
    samples(Gen.zip(corpusGen, corpusGen), 20).foreach { case (a, b) =>
      assert(estimate(Seq(hllBin(a), hllBin(b))) == estimate(Seq(hllBin(a ++ b))),
        s"merge law broke for |a|=${a.size} |b|=${b.size}")
    }
  }

  test("HLL merge is commutative and idempotent on sketch state") {
    samples(Gen.zip(corpusGen, corpusGen), 10).foreach { case (a, b) =>
      val (sa, sb) = (hllBin(a), hllBin(b))
      assert(estimate(Seq(sa, sb)) == estimate(Seq(sb, sa)), "commutativity")
      // merging a sketch with itself adds nothing (set semantics)
      assert(estimate(Seq(sa, sa)) == estimate(Seq(sa)), "idempotence")
    }
  }

  test("CMS law: estimates never underestimate, merged counts add exactly") {
    import spark.implicits._
    samples(Gen.zip(corpusGen, corpusGen), 8).foreach { case (a, b) =>
      val all = a ++ b
      if (all.nonEmpty) {
        // one sketch over everything: point estimate ≥ true frequency
        val sketch = all.toDF("x")
          .agg(Sketches.countMin(col("x")).as("s")).head().getAs[Array[Byte]]("s")
        val cms = org.apache.spark.util.sketch.CountMinSketch.readFrom(
          new java.io.ByteArrayInputStream(sketch))
        val truth = all.groupBy(identity).view.mapValues(_.size.toLong).toMap
        truth.foreach { case (v, n) =>
          assert(cms.estimateCount(v) >= n, s"underestimate for $v")
        }
        // mergeInPlace of per-slice sketches == sketch of the union
        // (same width/depth/seed): total counts must be conserved
        val sliceA = a.toDF("x").agg(Sketches.countMin(col("x")).as("s"))
          .head().getAs[Array[Byte]]("s")
        val sliceB = b.toDF("x").agg(Sketches.countMin(col("x")).as("s"))
          .head().getAs[Array[Byte]]("s")
        val merged = org.apache.spark.util.sketch.CountMinSketch.readFrom(
          new java.io.ByteArrayInputStream(sliceA))
        merged.mergeInPlace(org.apache.spark.util.sketch.CountMinSketch.readFrom(
          new java.io.ByteArrayInputStream(sliceB)))
        assert(merged.totalCount() == all.size.toLong, "merged total count")
        truth.foreach { case (v, n) =>
          assert(merged.estimateCount(v) >= n, s"merged underestimate for $v")
        }
      }
    }
  }
}
