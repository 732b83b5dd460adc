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
}
