package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

class JoinsSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asOf: latest right row at or before each left row, per key") {
    import spark.implicits._
    val left = Seq(
      (1L, "k1", ts("2024-01-01 10:00:00")),
      (2L, "k1", ts("2024-01-01 12:00:00")),
      (3L, "k2", ts("2024-01-01 09:00:00")), // before any right row
      (4L, "k2", ts("2024-01-01 11:00:00"))
    ).toDF("lid", "k", "lt")
    val right = Seq(
      ("k1", ts("2024-01-01 09:30:00"), "a"),
      ("k1", ts("2024-01-01 11:00:00"), "b"),
      ("k2", ts("2024-01-01 10:30:00"), "c")
    ).toDF("k", "rt", "tag")
    val out = Joins.asOf(left, right, "lt", "rt", Seq("k"))
      .orderBy("lid").collect()
    assert(out.map(r => (r.getAs[Long]("lid"), r.getAs[String]("tag"))).toSeq ==
      Seq((1L, "a"), (2L, "b"), (3L, null), (4L, "c")))
  }

  test("asOf: equality is inclusive (right row AT left time matches)") {
    import spark.implicits._
    val left = Seq((1L, "k", ts("2024-01-01 10:00:00"))).toDF("lid", "k", "lt")
    val right = Seq(("k", ts("2024-01-01 10:00:00"), "exact")).toDF("k", "rt", "tag")
    val out = Joins.asOf(left, right, "lt", "rt", Seq("k")).collect()
    assert(out.head.getAs[String]("tag") == "exact")
  }

  test("asOf: NULL fields of the matched row do not resurrect older values") {
    import spark.implicits._
    val left = Seq((1L, "k", ts("2024-01-01 12:00:00"))).toDF("lid", "k", "lt")
    val right = Seq(
      ("k", ts("2024-01-01 09:00:00"), Option(5), "x"),
      ("k", ts("2024-01-01 10:00:00"), None: Option[Int], "y")
    ).toDF("k", "rt", "a", "b")
    val out = Joins.asOf(left, right, "lt", "rt", Seq("k")).collect().head
    // matched row is t=10:00 → (a=null, b="y"); a=5 from t=09:00 must NOT leak
    assert(out.getAs[Any]("a") == null && out.getAs[String]("b") == "y")
  }

  test("asOf: rejects colliding payload column names") {
    import spark.implicits._
    val left = Seq((1L, "k", ts("2024-01-01 12:00:00"), "v")).toDF("lid", "k", "lt", "tag")
    val right = Seq(("k", ts("2024-01-01 09:00:00"), "w")).toDF("k", "rt", "tag")
    intercept[IllegalArgumentException] {
      Joins.asOf(left, right, "lt", "rt", Seq("k"))
    }
  }

  test("salted join matches plain join results and spreads hot keys") {
    import spark.implicits._
    val big = (1 to 10000).map(i => (if (i % 10 == 0) "hot" else s"k$i", i))
      .toDF("key", "v")
    val small = Seq(("hot", 1.0), ("k7", 2.0)).toDF("key", "w")
    val plain = big.join(small, "key").agg(
      org.apache.spark.sql.functions.sum("v"),
      org.apache.spark.sql.functions.count("*")).head()
    val salted = Joins.salted(big, small, "key", 8).agg(
      org.apache.spark.sql.functions.sum("v"),
      org.apache.spark.sql.functions.count("*")).head()
    assert(plain == salted)
  }
}
