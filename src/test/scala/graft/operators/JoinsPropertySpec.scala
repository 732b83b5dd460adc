package graft.operators

import java.sql.Timestamp

import org.scalacheck.Gen

import graft.SparkSpec

/** Property tests: the composed asOf operator must agree with an
  * obviously-correct per-row reference implementation on randomized
  * inputs (keys, times, nulls, ties). */
class JoinsPropertySpec extends SparkSpec {

  private def ts(minute: Int) = new Timestamp(1704067200000L + minute * 60000L)

  test("asOf agrees with the naive per-row definition on random datasets") {
    import spark.implicits._
    val genLeft = Gen.listOfN(40, for {
      k <- Gen.oneOf("k1", "k2", "k3")
      t <- Gen.choose(0, 50)
    } yield (k, t))
    val genRight = Gen.listOfN(30, for {
      k <- Gen.oneOf("k1", "k2", "k4")
      t <- Gen.choose(0, 50)
      v <- Gen.choose(0, 999)
    } yield (k, t, v))

    (1 to 5).foreach { round =>
      val leftRows = Iterator.continually(genLeft.sample).flatten.next()
        .zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }
      val rightRaw = Iterator.continually(genRight.sample).flatten.next()
      // dedup right per (k, t): keep max v — mirrors the documented
      // requirement of a unique right row per (key, time)
      val rightRows = rightRaw.groupBy(r => (r._1, r._2))
        .map { case ((k, t), rs) => (k, t, rs.map(_._3).max) }.toSeq

      val left = leftRows.map { case (id, k, t) => (id, k, ts(t)) }.toDF("lid", "k", "lt")
      val right = rightRows.map { case (k, t, v) => (k, ts(t), v) }.toDF("k", "rt", "v")

      val got = Joins.asOf(left, right, "lt", "rt", Seq("k")).collect()
        .map(r => r.getAs[Long]("lid") -> Option(r.getAs[Any]("v"))).toMap

      // naive reference: for each left row, the right row with max rt <= lt
      val expected = leftRows.map { case (id, k, t) =>
        val candidates = rightRows.filter(r => r._1 == k && r._2 <= t)
        id -> (if (candidates.isEmpty) None
               else Some(candidates.maxBy(_._2)._3))
      }.toMap

      leftRows.foreach { case (id, k, t) =>
        assert(got(id).map(_.asInstanceOf[Int]) == expected(id),
          s"round $round: lid=$id k=$k t=$t got=${got(id)} expected=${expected(id)}")
      }
    }
  }

  test("HLL sketch merge is order-insensitive (commutative estimates)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val a = (1 to 800).toDF("v").agg(graft.approx.Sketches.hllSketch(col("v")).as("s")).head().getAs[Array[Byte]]("s")
    val b = (500 to 1200).toDF("v").agg(graft.approx.Sketches.hllSketch(col("v")).as("s")).head().getAs[Array[Byte]]("s")
    def est(bins: Seq[Array[Byte]]): Long =
      bins.toDF("s").agg(
        graft.approx.Sketches.hllEstimate(hll_union_agg(col("s"), lit(false))).as("e"))
        .head().getLong(0)
    assert(est(Seq(a, b)) == est(Seq(b, a)))
  }
}
