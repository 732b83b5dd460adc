package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.Tables

/** The delegated-SQL operator surface of the reference, re-expressed as
  * declarative Spark plans.
  *
  * The reference passes every SELECT verbatim to DuckDB
  * (`internal/query/query.go:277-375`); the observed surface (SURVEY.md
  * §2.1) is projection/filter/joins/aggregation/window/sort-limit/set
  * ops/CTE/subquery plus scalar functions. Each method here is one of
  * those shapes as a Catalyst logical plan, so pushdown, pruning, partial
  * aggregation and join-strategy selection are all optimizer-driven.
  *
  * Scale conventions used throughout:
  *  - dimension tables (region/nation, and customer/supplier vs lineitem)
  *    are explicitly `broadcast()` where a 100 TB fact side would
  *    otherwise shuffle;
  *  - aggregates run partial→final (Spark default) — no collect-based
  *    merging like the reference coordinator (`aggregation_strategy.go`);
  *  - top-K is orderBy+limit which plans as TakeOrderedAndProject, the
  *    distributed heap merge the reference hand-wrote (#19).
  *
  * Doubles that cross the DuckDB-oracle hash compare are rounded on BOTH
  * sides (same literal SQL in `SparkEntry.oracleSql`).
  */
object Relational {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** TPC-H Q1 shape: full-scan partial/final aggregation with computed
    * measures. Reference shape: `docs/SOLUTION.md:429` aggregations. */
  def pricingSummary(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** Projection + conjunctive predicates; Catalyst pushes both into the
    * parquet scan (reference: hand pruning `file_pruning.go:159-255`,
    * `column_pruning.go:31-164`). */
  def filterProject(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_quantity") > 45 && col("l_returnflag") === "R")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"), col("l_extendedprice"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  /** 3-way join + group agg + top-K by computed measure (TPC-H Q3 shape,
    * reference multi-table JOIN `docs/SOLUTION.md:459`). */
  def joinAgg(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
    val o = t(s, dir, "orders")
    val l = t(s, dir, "lineitem")
    // customer scales with SF (not broadcastable at 100 TB) — shuffle
    // join on custkey; AQE turns it into a broadcast at small SF anyway.
    // orders⋈lineitem shuffles on the shared orderkey.
    o.join(c, o("o_custkey") === c("c_custkey"))
      .join(l, l("l_orderkey") === o("o_orderkey"))
      .groupBy(col("o_orderkey"), col("o_orderdate"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(10)

  }

  /** 6-way star join through region→nation→(customer,supplier)→orders→
    * lineitem (TPC-H Q5 shape): dims broadcast, facts shuffle once. */
  def starJoin(s: SparkSession, dir: String): DataFrame = {
    val r = t(s, dir, "region").filter(col("r_name") === "ASIA")
    val n = t(s, dir, "nation")
    val c = t(s, dir, "customer")
    val su = t(s, dir, "supplier")
    val o = t(s, dir, "orders")
    val l = t(s, dir, "lineitem")
    // Only region/nation are fixed-size (broadcast); customer/supplier
    // scale with SF and shuffle-join (AQE may still broadcast at low SF).
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(su, l("l_suppkey") === su("s_suppkey") &&
        c("c_nationkey") === su("s_nationkey"))
      .join(broadcast(n), su("s_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** ORDER BY … LIMIT n — plans as TakeOrderedAndProject (the reference's
    * topn_merge strategy, `aggregation_strategy.go:291-336`). */
  def topN(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(10)

  /** Window functions: ranking + running total per customer. */
  def windowFuncs(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
    t(s, dir, "orders")
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("run_total",
        round(sum(col("o_totalprice")).over(w.rowsBetween(Window.unboundedPreceding, 0)), 2))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("rn"), col("o_orderkey"), col("run_total"))
      .orderBy(col("o_custkey"), col("rn"))
  }

  /** COUNT(DISTINCT …) per group — expand+two-phase agg in Spark (exact;
    * the reference punts cross-node DISTINCT entirely, SURVEY.md §3.3). */
  def distinctAgg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_orderkey")).as("n_orders"),
        countDistinct(col("l_suppkey")).as("n_supp"))
      .orderBy(col("l_returnflag"))

  /** Time-bucketed aggregation (reference benchmark `benchmark.go:359-364`:
    * DATE_TRUNC('hour') + aggregates over events). */
  def timeBucket(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(date_trunc("hour", col("ts")).as("h"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total"))
      .orderBy(col("h"), col("event_type"))

  /** CTE shape: aggregate subquery joined back to a dimension. */
  def cteTopSpenders(s: SparkSession, dir: String): DataFrame = {
    val spent = t(s, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(round(sum(col("o_totalprice")), 2).as("spent"))
    t(s, dir, "customer")
      .join(spent, col("c_custkey") === col("o_custkey"))
      .select(col("c_custkey"), col("c_name"), col("spent"))
      .orderBy(col("spent").desc, col("c_custkey"))
      .limit(20)
  }

  /** Scalar subquery in predicate (uncorrelated). */
  def scalarSubquery(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val threshold = o.agg(avg(col("o_totalprice")).as("a"))
    o.join(broadcast(threshold))
      .filter(col("o_totalprice") > col("a") * 1.5)
      .select(col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(50)
  }

  /** Set operations: (customers without a big order) ∪ (suppliers' keys
    * ∩ customers' keys range) — exercises EXCEPT, UNION ALL, INTERSECT. */
  def setOps(s: SparkSession, dir: String): DataFrame = {
    val noBig = t(s, dir, "customer").select(col("c_custkey").as("key"))
      .except(t(s, dir, "orders").filter(col("o_totalprice") > 200000)
        .select(col("o_custkey").as("key")))
    val common = t(s, dir, "supplier").select(col("s_suppkey").as("key"))
      .intersect(t(s, dir, "customer").select(col("c_custkey").as("key")))
    noBig.unionAll(common).orderBy(col("key"))
  }

  /** Scalar function battery: string/case/arithmetic, all codegen'd. */
  def scalarFuncs(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part")
      .select(
        col("p_partkey"),
        upper(col("p_brand")).as("brand_u"),
        substring(col("p_name"), 1, 10).as("name10"),
        length(col("p_name")).cast("long").as("name_len"),
        when(col("p_size") > 25, "big").otherwise("small").as("size_class"),
        round(col("p_retailprice") * 1.1, 2).as("marked_up"))
      .orderBy(col("p_partkey"))
      .limit(100)

  /** GROUPING SETS / rollup with null-safe labels. */
  def groupingSets(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("qty"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
        coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
        col("n"), col("qty"))
      .orderBy(col("rf"), col("ls"))

  /** GROUP BY + HAVING. */
  def havingFilter(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_suppkey"))
      .agg(count(lit(1)).as("n"), round(sum(col("l_extendedprice")), 2).as("total"))
      .filter(col("n") > 100)
      .orderBy(col("n").desc, col("l_suppkey"))

  /** EXISTS → left-semi join (no row duplication, no shuffle of payload
    * columns beyond the key). */
  def existsSemi(s: SparkSession, dir: String): DataFrame = {
    val big = t(s, dir, "orders").filter(col("o_totalprice") > 400000)
    t(s, dir, "customer")
      .join(big, col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }

  /** NOT EXISTS → left-anti join. */
  def notExistsAnti(s: SparkSession, dir: String): DataFrame = {
    val err = t(s, dir, "events")
      .filter(col("event_type") === "error" && col("value") > 90)
    t(s, dir, "events")
      .select(col("user_id")).distinct()
      .join(err, Seq("user_id"), "left_anti")
      .orderBy(col("user_id"))
  }

  /** LIKE / BETWEEN / IN predicate shapes (reference sanitizer passes all
    * three through; `query_test.go:14-116`). */
  def likeInBetween(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part")
      .filter(col("p_name").like("%red%") &&
        col("p_size").between(10, 20) &&
        col("p_brand").isin("Brand#1", "Brand#7", "Brand#13"))
      .select(col("p_partkey"), col("p_name"), col("p_brand"), col("p_size"))
      .orderBy(col("p_partkey"))

  /** Ordered string aggregation per group. */
  def stringAgg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "supplier")
      .join(broadcast(t(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(array_join(sort_array(collect_list(col("s_name"))), ",").as("suppliers"))
      .orderBy(col("n_name"))

  /** AVG both as built-in and as the reference's sum/count decomposition
    * (`aggregation_strategy.go:128-198`) — in Spark both are the same
    * partial/final plan; kept to pin the semantics. */
  def avgDecompose(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(col("event_type"))
      .agg(
        round(sum(col("value")) / count(col("value")), 4).as("avg_manual"),
        round(avg(col("value")), 4).as("avg_builtin"))
      .orderBy(col("event_type"))

  /** Date-part extraction + monthly aggregates. */
  def dateParts(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy(
        year(col("o_orderdate")).cast("long").as("y"),
        month(col("o_orderdate")).cast("long").as("m"))
      .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("total"))
      .orderBy(col("y"), col("m"))

  /** JSON field extraction from a string column (reference payloads are
    * JSON Structs, `ingest.go:124-152`). */
  def jsonExtract(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .select(col("event_id"), get_json_object(col("props"), "$.k").cast("long").as("k"))
      .filter(col("k") > 50)
      .orderBy(col("event_id"))
      .limit(200)

  /** As-of (temporal) join: each purchase matched to the user's latest
    * click at or before it — composed via [[Joins.asOf]] (union + one
    * window pass; no range-join explosion). Right side deduped to one
    * row per (user, ts) so tie-breaking is deterministic for the oracle. */
  def asofJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    val clicks = ev.filter(col("event_type") === "click")
      .groupBy(col("user_id"), col("ts"))
      .agg(
        max(col("event_id")).as("click_id"),
        max_by(col("value"), col("event_id")).as("click_value"))
    val purch = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    Joins.asOf(purch, clicks, "ts", "ts", Seq("user_id"))
      .orderBy(col("event_id"))
  }

  /** Theta/range join: events self-correlated is too big; use part price
    * band join against a small derived band table (broadcast NL join). */
  def rangeJoin(s: SparkSession, dir: String): DataFrame = {
    val bands = s.range(0, 100).select(
      col("id").as("band"),
      (col("id") * 10.0).as("lo"),
      ((col("id") + 1) * 10.0).as("hi"))
    t(s, dir, "part")
      .join(broadcast(bands), col("p_retailprice") >= col("lo") && col("p_retailprice") < col("hi"))
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n"), round(avg(col("p_retailprice")), 2).as("avg_price"))
      .orderBy(col("band"))
  }
}
