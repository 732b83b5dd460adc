package graft

import org.apache.spark.sql.functions._

/** Pins the invariants SCALING.md claims for the synthesized scaling
  * corpora (sf1/sf10 = k similarity-preserved copies of the source):
  *
  *  - events keep their TIMESTAMPS under id-offset copies, so a
  *    time-window predicate selects the same fraction — k× the rows —
  *    at every scale (the property the b-suite's sf10 points lean on);
  *  - id namespaces stay disjoint across copies (event_id, user_id,
  *    doc_id), so COUNT DISTINCT and dedup results scale ~linearly
  *    instead of collapsing onto shared ids;
  *  - the sf10 step synthesizes its own events rather than inheriting
  *    the unscaled aux file copy (the round-8 regression this spec
  *    guards: the aux loop silently clobbering the synthesized table);
  *  - the embedding sign-flip transform is an isometry WITHIN a copy
  *    (within-copy cosines exact) while cross-copy vectors decorrelate.
  *
  * Runs at copies=2 on sf0.001 so the pin costs seconds, not the
  * ladder's minutes — the invariants are scale-free set algebra. */
class ScalingSynthesisSpec extends SparkSpec {

  private lazy val sf1Dir = {
    val d = tmpDir("graft_synth_sf1")
    ScalingBench.ensureSf1(spark, Sf0001, d, copies = 2)
    d
  }
  private lazy val sf10Dir = {
    val d = tmpDir("graft_synth_sf10")
    ScalingBench.ensureSf10(spark, sf1Dir, d, Sf0001, copies = 2)
    d
  }

  test("events synthesis: windows select k x the rows; id namespaces disjoint") {
    // encoding-agnostic ts view: the driver has shipped events.ts as
    // both TIMESTAMP(NANOS)→long (nanosAsLong) and native micros
    // timestamps; the window-fraction invariant is the same under either
    def tsLong(d: org.apache.spark.sql.DataFrame) =
      if (d.schema("ts").dataType == org.apache.spark.sql.types.LongType) d
      else d.withColumn("ts", unix_micros(col("ts").cast("timestamp")))
    val src = tsLong(spark.read.parquet(s"$Sf0001/events.parquet"))
    val sf1 = tsLong(spark.read.parquet(s"$sf1Dir/events.parquet"))
    assert(sf1.count() === 2 * src.count())
    // timestamps preserved: any time window holds exactly 2x the rows
    val (lo, hi) = {
      val r = src.agg(min("ts"), max("ts")).head()
      (r.getLong(0), r.getLong(1))
    }
    val mid = lo + (hi - lo) / 2
    val winSrc = src.filter(col("ts") >= lo && col("ts") < mid).count()
    val winSf1 = sf1.filter(col("ts") >= lo && col("ts") < mid).count()
    assert(winSf1 === 2 * winSrc)
    // id disjointness: no event_id or user_id collides across copies
    assert(sf1.select("event_id").distinct().count() === 2 * src.count())
    assert(sf1.select("user_id").distinct().count() ===
      2 * src.select("user_id").distinct().count())
  }

  test("sf10 events are synthesized, not the unscaled aux copy") {
    val sf1 = spark.read.parquet(s"$sf1Dir/events.parquet")
    val sf10 = spark.read.parquet(s"$sf10Dir/events.parquet")
    assert(sf10.count() === 2 * sf1.count())
    assert(sf10.select("event_id").distinct().count() === sf10.count())
    // other aux tables are still the unscaled file copies
    val nation = spark.read.parquet(s"$sf10Dir/nation.parquet")
    val srcNation = spark.read.parquet(s"$Sf0001/nation.parquet")
    assert(nation.count() === srcNation.count())
  }

  test("documents synthesis: doc_ids disjoint, within-copy jaccard preserved") {
    val src = spark.read.parquet(s"$Sf0001/documents.parquet")
    val sf1 = spark.read.parquet(s"$sf1Dir/documents.parquet")
    assert(sf1.count() === 2 * src.count())
    assert(sf1.select("doc_id").distinct().count() === 2 * src.count())
    // token bijection preserves SET-algebra similarity: the exact
    // word-set jaccard of any within-copy pair survives the rename.
    // Compare pair (a, b) in copy 0 vs the same pair in copy 1.
    val ids = src.select("doc_id").orderBy("doc_id").limit(2)
      .collect().map(_.getLong(0))
    def wordJaccard(d: org.apache.spark.sql.DataFrame, a: Long, b: Long): Double = {
      val row = d.filter(col("doc_id").isin(a, b))
        .agg(collect_list(array_distinct(split(col("text"), " "))).as("ws"))
        .select(
          (size(array_intersect(element_at(col("ws"), 1), element_at(col("ws"), 2)))
            .cast("double") /
           size(array_union(element_at(col("ws"), 1), element_at(col("ws"), 2))))
          .as("j"))
        .head()
      row.getDouble(0)
    }
    val off = 10000000L
    val j0 = wordJaccard(sf1, ids(0), ids(1))
    val j1 = wordJaccard(sf1, ids(0) + off, ids(1) + off)
    assert(math.abs(j0 - j1) < 1e-12)
  }

  test("embedding synthesis: within-copy cosines exact, cross-copy decorrelated") {
    import graft.functions.VectorFunctions
    val sf1 = spark.read.parquet(s"$sf1Dir/embeddings.parquet")
    val src = spark.read.parquet(s"$Sf0001/embeddings.parquet")
    assert(sf1.count() === 2 * src.count())
    val off = 10000000L
    def vec(id: Long) = sf1.filter(col("vec_id") === id)
      .select(col("embedding").cast("array<double>")).head().getSeq[Double](0)
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / math.sqrt(a.map(x => x * x).sum * b.map(x => x * x).sum)
    }
    val ids = src.select("vec_id").orderBy("vec_id").limit(2)
      .collect().map(_.getLong(0))
    val (a0, b0) = (vec(ids(0)), vec(ids(1)))
    val (a1, b1) = (vec(ids(0) + off), vec(ids(1) + off))
    // sign flip is a diagonal orthogonal transform: within-copy cosine
    // is bit-exact across copies
    assert(math.abs(cos(a0, b0) - cos(a1, b1)) < 1e-12)
    // cross-copy: same source vector under independent masks — cosine
    // falls to ambient noise (|cos| ~ N(0, 1/sqrt(dims)), far below tau)
    assert(math.abs(cos(a0, a1)) < 0.5)
  }
}
