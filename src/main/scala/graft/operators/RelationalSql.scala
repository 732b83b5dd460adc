package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.core.Tables

/** Second batch of relational shapes, expressed through the engine's SQL
  * path (`spark.sql` over registered views — the reference's actual
  * query surface, SURVEY.md §2.1). Each constant is the Spark-dialect
  * SQL; the DuckDB oracle in SparkEntry differs only where dialects
  * force it (noted inline). */
object RelationalSql {

  def q(sql: String): (SparkSession, String) => DataFrame =
    (s, dir) => { Tables.registerAll(s, dir); s.sql(sql) }

  /** Point lookup by key — the reference's `SELECT * FROM t WHERE id=…`
    * (README.md:169). Bloom/minmax row-group skipping serves this. */
  val pointLookup: String =
    """SELECT event_id, user_id, event_type, value FROM events
      |WHERE event_id = 4242""".stripMargin

  /** lag/lead/ntile/rank family over per-customer order history. */
  val windowNavigation: String =
    """SELECT o_custkey, o_orderkey,
      | CAST(rank() OVER w AS BIGINT) AS rnk,
      | CAST(dense_rank() OVER w AS BIGINT) AS drnk,
      | CAST(ntile(4) OVER w AS BIGINT) AS quartile,
      | round(lag(o_totalprice, 1) OVER w, 2) AS prev_price,
      | round(lead(o_totalprice, 1) OVER w, 2) AS next_price
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      |ORDER BY o_custkey, rnk LIMIT 500""".stripMargin

  /** Pivot via conditional aggregation (GROUP BY + CASE). */
  val conditionalPivot: String =
    """SELECT l_suppkey,
      | round(sum(CASE WHEN l_returnflag = 'A' THEN l_quantity ELSE 0 END), 2) AS qty_a,
      | round(sum(CASE WHEN l_returnflag = 'N' THEN l_quantity ELSE 0 END), 2) AS qty_n,
      | round(sum(CASE WHEN l_returnflag = 'R' THEN l_quantity ELSE 0 END), 2) AS qty_r
      |FROM lineitem GROUP BY l_suppkey ORDER BY l_suppkey LIMIT 100""".stripMargin

  /** Correlated scalar subquery in the predicate. */
  val correlatedSubquery: String =
    """SELECT c_custkey, c_name FROM customer c
      |WHERE c_acctbal > (SELECT avg(o_totalprice) * 0.05 FROM orders o
      |                   WHERE o_custkey = c.c_custkey)
      |ORDER BY c_custkey LIMIT 200""".stripMargin

  /** Date arithmetic: interval shift, month truncation, quarter. */
  val dateArithmetic: String =
    """SELECT o_orderkey,
      | o_orderdate + INTERVAL '30' DAY AS due,
      | CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
      | CAST(quarter(o_orderdate) AS BIGINT) AS q
      |FROM orders ORDER BY o_orderkey LIMIT 300""".stripMargin

  /** Math function battery. */
  val mathFuncs: String =
    """SELECT p_partkey,
      | round(abs(p_retailprice - 950.0), 6) AS a,
      | CAST(ceil(p_retailprice) AS BIGINT) AS c,
      | CAST(floor(p_retailprice) AS BIGINT) AS f,
      | round(sqrt(p_retailprice), 6) AS sq,
      | round(ln(p_retailprice), 6) AS l,
      | round(log10(p_retailprice), 6) AS l10,
      | round(power(p_size, 2), 1) AS p2,
      | CAST(p_partkey % 7 AS BIGINT) AS m
      |FROM part ORDER BY p_partkey LIMIT 200""".stripMargin

  /** String function battery. */
  val stringFuncs: String =
    """SELECT p_partkey,
      | replace(p_name, ' ', '_') AS snake,
      | lpad(p_brand, 12, '*') AS padded,
      | reverse(p_name) AS rev,
      | p_brand || ':' || p_name AS joined,
      | CAST(instr(p_name, 'e') AS BIGINT) AS pos_e,
      | trim(substr(p_name, 1, 6)) AS head6
      |FROM part ORDER BY p_partkey LIMIT 200""".stripMargin

  /** Exact interpolated percentiles per group (Spark `percentile` ≡
    * DuckDB `quantile_cont` — the oracle swaps the function name). */
  val percentiles: String =
    """SELECT o_orderpriority,
      | round(percentile(o_totalprice, 0.5), 2) AS p50,
      | round(percentile(o_totalprice, 0.9), 2) AS p90,
      | round(percentile(o_totalprice, 0.99), 2) AS p99
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** Deterministic stratified sample: lowest-event-id 10% per event
    * type via percent_rank (training-data subsampling shape). */
  val stratifiedSample: String =
    """SELECT event_id, event_type FROM (
      | SELECT event_id, event_type,
      |  percent_rank() OVER (PARTITION BY event_type ORDER BY event_id) AS pr
      | FROM events) t
      |WHERE pr <= 0.1 ORDER BY event_id""".stripMargin

  // The reference's three benchmark shapes (BASELINE.md /
  // internal/metrics/benchmark.go:350-372) over the events table, with
  // fixed time bounds (data spans 2024-01-01..01-30) so the oracle is
  // deterministic. b01≈simple_query (target P95 100ms), b02≈
  // complex_aggregation (1s), b03≈count_distinct (5s).

  val baselineSimpleCount: String =
    """SELECT count(*) AS n FROM events
      |WHERE ts >= TIMESTAMP '2024-01-30 00:00:00'""".stripMargin

  val baselineHourlyDistinct: String =
    """SELECT date_trunc('hour', ts) AS hour,
      | count(DISTINCT user_id) AS ids
      |FROM events WHERE ts >= TIMESTAMP '2024-01-24 00:00:00'
      |GROUP BY 1 ORDER BY hour""".stripMargin

  val baselineCountDistinct: String =
    """SELECT count(DISTINCT user_id) AS ids FROM events""".stripMargin

  /** Nested aggregate subquery: suppliers above global average revenue. */
  val nestedAggSubquery: String =
    """SELECT l_suppkey, round(sum(l_extendedprice), 2) AS revenue
      |FROM lineitem GROUP BY l_suppkey
      |HAVING sum(l_extendedprice) >
      |  (SELECT avg(r) FROM (SELECT sum(l_extendedprice) AS r
      |                       FROM lineitem GROUP BY l_suppkey) t)
      |ORDER BY revenue DESC, l_suppkey LIMIT 50""".stripMargin
}
