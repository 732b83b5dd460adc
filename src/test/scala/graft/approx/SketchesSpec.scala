package graft.approx

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SketchesSpec extends SparkSpec {

  test("approx distinct within reference error bound (p=12 → ~1.6%)") {
    import spark.implicits._
    val n = 50000
    val df = (1 to n).toDF("v")
    val est = df.agg(Sketches.approxDistinct(col("v")).as("e")).head().getLong(0)
    assert(math.abs(est - n).toDouble / n < 0.05, s"estimate $est for $n")
  }

  test("mergeable HLL registry: build per table, merged estimate ≈ union") {
    import spark.implicits._
    val reg = new SketchRegistry
    val a = (1 to 1000).toDF("v")
    val b = (500 to 1500).toDF("v") // overlap 500..1000
    reg.buildHll(a, "ta", "v")
    reg.buildHll(b, "tb", "v")
    val ea = reg.estimate(spark, "ta", "v").get
    val eb = reg.estimate(spark, "tb", "v").get
    val merged = reg.mergedEstimate(spark, Seq(("ta", "v"), ("tb", "v"))).get
    assert(math.abs(ea - 1000) < 60 && math.abs(eb - 1001) < 60)
    assert(math.abs(merged - 1500) < 90) // union cardinality, not sum
    assert(merged < ea + eb) // proves real merge, not addition (reference's MIN/MAX-sum bug class)
  }

  test("count-min sketch point estimate never underestimates") {
    import spark.implicits._
    val df = (Seq.fill(100)("hot") ++ (1 to 1000).map(i => s"cold$i")).toDF("v")
    val binRow = df.agg(Sketches.countMin(col("v")).as("s")).head()
    val bin = binRow.getAs[Array[Byte]]("s")
    val cms = org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(bin))
    assert(cms.estimateCount("hot") >= 100)
    assert(cms.estimateCount("cold1") >= 1)
    assert(cms.totalCount() == 1100)
  }

  test("a01/a02 bound-assertion gates: green on real sketches, high-cardinality stress holds") {
    // the r17 driver encoding: the queries emit a 0/1 within-3-sigma
    // gate the oracle pins to literal 1. Green path at the driver SF:
    val a01 = graft.operators.Approx.approxDistinct(spark, Sf001).collect()
    assert(a01.length == 5 && a01.forall(_.getAs[Long]("within_bound") == 1L))
    val a02 = graft.operators.Approx.hllMerge(spark, Sf001).head()
    assert(a02.getAs[Long]("within_bound") == 1L
      && a02.getAs[Long]("n_sketches") == 5L
      && a02.getAs[Long]("exact_users") == 150L)
    // the gate is a REAL 3-sigma check, not a tautology: at 500k
    // distinct values (where HLL error is fully expressed, unlike the
    // exact-mode driver cardinalities) the estimate still lands inside
    // 3*rsd = 4.875% -- and the arithmetic flags a synthetic estimate
    // planted just outside it
    import spark.implicits._
    val n = 500000
    val est = (1 to n).toDF("v")
      .agg(Sketches.approxDistinct(col("v")).as("e")).head().getLong(0)
    val bound = 3.0 * Sketches.rsdForPrecision(12)
    assert(math.abs(est - n).toDouble / n <= bound, s"estimate $est for $n")
    assert(math.abs((n * 1.06).toLong - n).toDouble / n > bound,
      "a 6% drift must fall outside the gate the oracle pins")
  }
}
