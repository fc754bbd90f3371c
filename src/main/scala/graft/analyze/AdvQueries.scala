package graft.analyze

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.core.Tables

/** Advanced SQL surface: rank-based percentiles, exact-sum statistics,
  * correlated/IN subqueries, and list aggregation — all via spark.sql
  * over registered views, each with a DuckDB oracle.
  *
  * Percentiles deliberately avoid quantile interpolation built-ins
  * (Spark's percentile() and DuckDB's quantile_cont() interpolate with
  * formulas that can differ in the last ulp); rank-based selection picks
  * actual row values and combines them with single IEEE ops, so both
  * engines produce identical bits. Variance/stddev/correlation are
  * computed from exact DECIMAL sums expanded through the textbook
  * formulas, written identically on both sides.
  */
object AdvQueries {

  type QFn = (SparkSession, String) => DataFrame

  private def sql(q: String): QFn = (s: SparkSession, d: String) => {
    Tables.registerAll(s, d)
    s.sql(q)
  }

  /** (name, spark SQL, duckdb SQL) — dialect differences only. */
  private val pairs: Seq[(String, String, String)] = Seq(

    ("q36_percentiles", {
      // Spark dialect: integer division is `div`
      """WITH r AS (
        |  SELECT o_orderpriority, o_totalprice,
        |         ROW_NUMBER() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey) AS rn,
        |         COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
        |  FROM orders)
        |SELECT o_orderpriority,
        |  (MAX(CASE WHEN rn = (n+1) div 2 THEN o_totalprice END)
        |   + MAX(CASE WHEN rn = (n+2) div 2 THEN o_totalprice END)) / 2 AS median_price,
        |  MAX(CASE WHEN rn = CAST(ceil(0.9 * n) AS BIGINT) THEN o_totalprice END) AS p90_price,
        |  COUNT(*) / MAX(n) AS n_rows_check
        |FROM r GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin
    }, {
      """WITH r AS (
        |  SELECT o_orderpriority, o_totalprice,
        |         ROW_NUMBER() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey) AS rn,
        |         COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
        |  FROM orders)
        |SELECT o_orderpriority,
        |  (MAX(CASE WHEN rn = (n+1) // 2 THEN o_totalprice END)
        |   + MAX(CASE WHEN rn = (n+2) // 2 THEN o_totalprice END)) / 2 AS median_price,
        |  MAX(CASE WHEN rn = CAST(ceil(0.9 * n) AS BIGINT) THEN o_totalprice END) AS p90_price,
        |  CAST(COUNT(*) / MAX(n) AS DOUBLE) AS n_rows_check
        |FROM r GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin
    }),

    ("q37_stats_exact", {
      // variance/stddev/corr from exact decimal sums; identical formula
      // text on both sides -> identical doubles. Spark needs the DOUBLE
      // cast on count to match DuckDB's float division of COUNT(*).
      """WITH s AS (
        |  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS syy,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sxy
        |  FROM lineitem)
        |SELECT
        |  (sxx - sx * sx / n) / (n - 1) AS var_qty,
        |  sqrt((sxx - sx * sx / n) / (n - 1)) AS stddev_qty,
        |  round((n * sxy - sx * sy) / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 12) AS corr_qty_price
        |FROM s""".stripMargin
    }, {
      """WITH s AS (
        |  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS syy,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sxy
        |  FROM lineitem)
        |SELECT
        |  (sxx - sx * sx / n) / (n - 1) AS var_qty,
        |  sqrt((sxx - sx * sx / n) / (n - 1)) AS stddev_qty,
        |  round((n * sxy - sx * sy) / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 12) AS corr_qty_price
        |FROM s""".stripMargin
    }),

    ("q38_correlated_subquery", {
      """SELECT o.o_orderkey, o.o_custkey, o.o_totalprice
        |FROM orders o
        |WHERE o.o_totalprice > 1.5 * (
        |  SELECT CAST(SUM(CAST(i.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
        |  FROM orders i WHERE i.o_custkey = o.o_custkey)
        |ORDER BY o.o_orderkey""".stripMargin
    }, {
      """SELECT o.o_orderkey, o.o_custkey, o.o_totalprice
        |FROM orders o
        |WHERE o.o_totalprice > 1.5 * (
        |  SELECT CAST(SUM(CAST(i.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
        |  FROM orders i WHERE i.o_custkey = o.o_custkey)
        |ORDER BY o.o_orderkey""".stripMargin
    }),

    ("q39_collect_list", {
      """SELECT c_nationkey,
        |  array_join(sort_array(collect_list(c_name)), '|') AS names,
        |  COUNT(*) AS n
        |FROM customer GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin
    }, {
      """SELECT c_nationkey,
        |  array_to_string(list_sort(list(c_name)), '|') AS names,
        |  COUNT(*) AS n
        |FROM customer GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin
    }),

    ("q50_having_subquery", {
      // groups larger than the mean group size, in exact integer
      // arithmetic: n_i * n_groups > n_total  <=>  n_i > avg
      """SELECT o_custkey, COUNT(*) AS n_orders
        |FROM orders GROUP BY o_custkey
        |HAVING COUNT(*) * (SELECT COUNT(DISTINCT o_custkey) FROM orders)
        |       > (SELECT COUNT(*) FROM orders)
        |ORDER BY o_custkey""".stripMargin
    }, {
      """SELECT o_custkey, COUNT(*) AS n_orders
        |FROM orders GROUP BY o_custkey
        |HAVING COUNT(*) * (SELECT COUNT(DISTINCT o_custkey) FROM orders)
        |       > (SELECT COUNT(*) FROM orders)
        |ORDER BY o_custkey""".stripMargin
    }),

    ("q52_value_windows", {
      """SELECT o_custkey, o_orderkey,
        |  first_value(o_totalprice) OVER w AS first_price,
        |  last_value(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_price,
        |  nth_value(o_totalprice, 2) OVER w AS second_price
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin
    }, {
      """SELECT o_custkey, o_orderkey,
        |  first_value(o_totalprice) OVER w AS first_price,
        |  last_value(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_price,
        |  nth_value(o_totalprice, 2) OVER w AS second_price
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin
    }),

    ("q53_rank_distributions", {
      """SELECT o_custkey, o_orderkey,
        |  percent_rank() OVER w AS pr,
        |  cume_dist() OVER w AS cd,
        |  CAST(ntile(4) OVER w AS INT) AS quartile
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin
    }, {
      """SELECT o_custkey, o_orderkey,
        |  percent_rank() OVER w AS pr,
        |  cume_dist() OVER w AS cd,
        |  CAST(ntile(4) OVER w AS INT) AS quartile
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin
    }),

    ("q54_lateral_topk", {
      """SELECT c_custkey, t.o_orderkey, t.o_totalprice
        |FROM customer JOIN LATERAL (
        |  SELECT o_orderkey, o_totalprice FROM orders
        |  WHERE o_custkey = c_custkey
        |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
        |ORDER BY c_custkey, t.o_orderkey""".stripMargin
    }, {
      """SELECT c_custkey, t.o_orderkey, t.o_totalprice
        |FROM customer, LATERAL (
        |  SELECT o_orderkey, o_totalprice FROM orders
        |  WHERE o_custkey = c_custkey
        |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
        |ORDER BY c_custkey, t.o_orderkey""".stripMargin
    }),

    ("q40_in_subqueries", {
      """SELECT p_partkey, p_name
        |FROM part
        |WHERE p_partkey IN (SELECT l_partkey FROM lineitem
        |                    WHERE year(l_shipdate) = 2001)
        |  AND p_partkey NOT IN (SELECT l_partkey FROM lineitem
        |                        WHERE year(l_shipdate) = 1995)
        |ORDER BY p_partkey""".stripMargin
    }, {
      """SELECT p_partkey, p_name
        |FROM part
        |WHERE p_partkey IN (SELECT l_partkey FROM lineitem
        |                    WHERE year(l_shipdate) = 2001)
        |  AND p_partkey NOT IN (SELECT l_partkey FROM lineitem
        |                        WHERE year(l_shipdate) = 1995)
        |ORDER BY p_partkey""".stripMargin
    }),

    // hourly exact latency-style percentiles over the event stream —
    // the windowed form of q36's rank-based selection (no interpolating
    // quantile built-ins: both engines pick actual row values and
    // combine them with single IEEE ops)
    ("w07_windowed_percentiles", {
      """WITH r AS (
        |  SELECT date_trunc('hour', ts) AS window_start, value,
        |         ROW_NUMBER() OVER (PARTITION BY date_trunc('hour', ts)
        |                            ORDER BY value, event_id) AS rn,
        |         COUNT(*) OVER (PARTITION BY date_trunc('hour', ts)) AS n
        |  FROM events)
        |SELECT window_start,
        |  (MAX(CASE WHEN rn = (n+1) div 2 THEN value END)
        |   + MAX(CASE WHEN rn = (n+2) div 2 THEN value END)) / 2 AS median_value,
        |  MAX(CASE WHEN rn = CAST(ceil(0.9 * n) AS BIGINT) THEN value END) AS p90_value,
        |  COUNT(*) AS n_events
        |FROM r GROUP BY window_start ORDER BY window_start""".stripMargin
    }, {
      """WITH r AS (
        |  SELECT date_trunc('hour', ts) AS window_start, value,
        |         ROW_NUMBER() OVER (PARTITION BY date_trunc('hour', ts)
        |                            ORDER BY value, event_id) AS rn,
        |         COUNT(*) OVER (PARTITION BY date_trunc('hour', ts)) AS n
        |  FROM events)
        |SELECT window_start,
        |  (MAX(CASE WHEN rn = (n+1) // 2 THEN value END)
        |   + MAX(CASE WHEN rn = (n+2) // 2 THEN value END)) / 2 AS median_value,
        |  MAX(CASE WHEN rn = CAST(ceil(0.9 * n) AS BIGINT) THEN value END) AS p90_value,
        |  COUNT(*) AS n_events
        |FROM r GROUP BY window_start ORDER BY window_start""".stripMargin
    }),

    // robust outlier detection per event type: rank-based median and
    // MAD (two partitioned ranking passes — no interpolating quantile
    // builtin, so the doubles verify exactly), outliers = |x − med|
    // > 3·MAD. The data-quality monitor that survives heavy tails
    // where mean/stddev gates do not.
    ("w13_robust_outliers", {
      """WITH r AS (
        |  SELECT event_type, value, event_id,
        |         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn,
        |         COUNT(*) OVER (PARTITION BY event_type) AS n
        |  FROM events),
        |med AS (
        |  SELECT event_type,
        |    (MAX(CASE WHEN rn = (n+1) div 2 THEN value END)
        |     + MAX(CASE WHEN rn = (n+2) div 2 THEN value END)) / 2 AS med
        |  FROM r GROUP BY event_type),
        |d AS (
        |  SELECT e.event_type, e.event_id, m.med, abs(e.value - m.med) AS dev
        |  FROM events e JOIN med m ON e.event_type = m.event_type),
        |r2 AS (
        |  SELECT event_type, med, dev,
        |         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY dev, event_id) AS rn,
        |         COUNT(*) OVER (PARTITION BY event_type) AS n
        |  FROM d),
        |mad AS (
        |  SELECT event_type, MAX(med) AS med,
        |    (MAX(CASE WHEN rn = (n+1) div 2 THEN dev END)
        |     + MAX(CASE WHEN rn = (n+2) div 2 THEN dev END)) / 2 AS mad
        |  FROM r2 GROUP BY event_type)
        |SELECT d.event_type, m.med, m.mad,
        |  SUM(CASE WHEN d.dev > 3 * m.mad THEN 1 ELSE 0 END) AS n_outliers,
        |  COUNT(*) AS n_events
        |FROM d JOIN mad m ON d.event_type = m.event_type
        |GROUP BY d.event_type, m.med, m.mad ORDER BY d.event_type""".stripMargin
    }, {
      """WITH r AS (
        |  SELECT event_type, value, event_id,
        |         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn,
        |         COUNT(*) OVER (PARTITION BY event_type) AS n
        |  FROM events),
        |med AS (
        |  SELECT event_type,
        |    (MAX(CASE WHEN rn = (n+1) // 2 THEN value END)
        |     + MAX(CASE WHEN rn = (n+2) // 2 THEN value END)) / 2 AS med
        |  FROM r GROUP BY event_type),
        |d AS (
        |  SELECT e.event_type, e.event_id, m.med, abs(e.value - m.med) AS dev
        |  FROM events e JOIN med m ON e.event_type = m.event_type),
        |r2 AS (
        |  SELECT event_type, med, dev,
        |         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY dev, event_id) AS rn,
        |         COUNT(*) OVER (PARTITION BY event_type) AS n
        |  FROM d),
        |mad AS (
        |  SELECT event_type, MAX(med) AS med,
        |    (MAX(CASE WHEN rn = (n+1) // 2 THEN dev END)
        |     + MAX(CASE WHEN rn = (n+2) // 2 THEN dev END)) / 2 AS mad
        |  FROM r2 GROUP BY event_type)
        |SELECT d.event_type, m.med, m.mad,
        |  CAST(SUM(CASE WHEN d.dev > 3 * m.mad THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
        |  CAST(COUNT(*) AS BIGINT) AS n_events
        |FROM d JOIN mad m ON d.event_type = m.event_type
        |GROUP BY d.event_type, m.med, m.mad ORDER BY d.event_type""".stripMargin
    }))

  val defs: Seq[(String, QFn, Option[String])] =
    pairs.map { case (n, sparkSql, duckSql) => (n, sql(sparkSql), Some(duckSql)) }

  def queries: Map[String, QFn] = defs.map(q => q._1 -> q._2).toMap
  def oracles: Map[String, String] =
    defs.collect { case (n, _, Some(o)) => n -> o.trim }.toMap
}
