package graft.core

import org.scalacheck.Gen

import graft.SparkSpec

/** Property test for the ts-pushdown rewrite: for randomized raw nanos
  * values and literal micros — clustered around exact millisecond/
  * microsecond boundaries, where truncating division makes off-by-one
  * rewrites observable — the rewritten comparison must agree row-for-row
  * with direct evaluation of `trunc(ns/1000) <op> L` in Scala. */
class NanosTimePushdownSpec extends SparkSpec {

  test("rewritten ts comparisons agree with truncating-division semantics") {
    import spark.implicits._
    val genNanos: Gen[Long] = Gen.oneOf(
      Gen.choose(1L, 4_000_000_000_000_000_000L),              // broad range
      Gen.choose(1_700_000_000_000_000L, 1_700_000_100_000_000L).map(_ * 1000), // exact µs
      Gen.choose(1_700_000_000_000_000L, 1_700_000_100_000_000L).map(_ * 1000 + 999),
      Gen.choose(1_700_000_000_000_000L, 1_700_000_100_000_000L).map(_ * 1000 + 1))
    (1 to 3).foreach { round =>
      val nanos = Iterator.continually(Gen.listOfN(200, genNanos).sample).flatten.next()
      val df = nanos.toDF("ts")
      // same shape Tables.load produces over the nanos column
      df.createOrReplaceTempView("raw_events")
      spark.sql("SELECT timestamp_micros(ts div 1000) AS ts FROM raw_events")
        .createOrReplaceTempView("conv_events")
      val litMicrosGen = Gen.oneOf(
        Gen.oneOf(nanos).map(_ / 1000),           // boundaries present in data
        Gen.oneOf(nanos).map(_ / 1000 + 1),
        Gen.choose(1L, 4_000_000_000_000_000L))
      val micros = Iterator.continually(Gen.listOfN(6, litMicrosGen).sample).flatten.next()
      for (m <- micros; op <- Seq("<", "<=", ">", ">=", "=")) {
        // build the literal from micros via make-timestamp on the long
        val sql =
          s"SELECT count(*) AS n FROM conv_events WHERE ts $op timestamp_micros(${m}L)"
        val got = spark.sql(sql).head().getLong(0)
        val expect = nanos.count { ns =>
          val t = ns / 1000 // both positive here: trunc == floor
          op match {
            case "<" => t < m
            case "<=" => t <= m
            case ">" => t > m
            case ">=" => t >= m
            case "=" => t == m
          }
        }
        assert(got == expect, s"op=$op micros=$m got=$got expect=$expect")
      }
    }
  }
}
