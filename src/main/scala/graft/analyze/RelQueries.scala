package graft.analyze

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

import graft.core.Tables

/** Relational query workload over the driver's star schema.
  *
  * This is the SURVEY.md §2 operator inventory (the T-, P- and A-ops plus the
  * join/agg/window/set-op/scalar-function categories) re-targeted to
  * the TPC-H-ish test tables, each paired with an ANSI-SQL oracle the
  * driver runs in DuckDB.
  *
  * Exactness discipline (so Spark and DuckDB hash-match bit-for-bit):
  *  - money/ratio aggregations are computed in DECIMAL(18,2) (the data
  *    is 2-decimal), summed exactly, and cast to DOUBLE at the end —
  *    a single deterministic rounding instead of order-dependent float
  *    summation;
  *  - averages are expressed as CAST(exact_sum AS DOUBLE) / COUNT —
  *    one IEEE division on identical operands;
  *  - integer-typed results are cast so both engines agree (DuckDB
  *    SUM(int)→HUGEINT, year()→BIGINT, ROW_NUMBER()→BIGINT vs Spark's
  *    LONG/INT).
  *
  * Scale notes (100 TB design): filters/projections sit directly on the
  * scan so parquet pushdown applies; small dims are broadcast; the one
  * global-window query (q30) documents its single-task hazard and the
  * scalable alternative lives in [[graft.operators.SeqNumber]].
  */
object RelQueries {

  type QFn = (SparkSession, String) => DataFrame

  private def dec(c: Column): Column = c.cast(DecimalType(18, 2))
  private def ts(s: String): Column = lit(s).cast(TimestampType)
  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(spark, dir, name)

  /** (name, spark impl, duckdb oracle) triples. */
  val defs: Seq[(String, QFn, Option[String])] = Seq(

    // ---- aggregation ----------------------------------------------------
    // TPC-H Q1 shape: scan-heavy partial+final hash aggregate. Reference
    // analog: value_counts/sums (SURVEY §2.5 A6/A12, §2.3 T6).
    ("q01_pricing_summary", (s: SparkSession, d: String) => {
      t(s, d, "lineitem")
        .filter(col("l_shipdate") <= ts("1999-12-31 00:00:00"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
          sum(dec(col("l_extendedprice"))).cast("double").as("sum_base_price"),
          sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
            .cast("double").as("sum_disc_price"),
          sum(dec(col("l_extendedprice")) *
              ((lit(1) - dec(col("l_discount"))) * (lit(1) + dec(col("l_tax"))))
                .cast(DecimalType(8, 4)))
            .cast("double").as("sum_charge"),
          (sum(dec(col("l_quantity"))).cast("double") / count(lit(1))).as("avg_qty"),
          (sum(dec(col("l_discount"))).cast("double") / count(lit(1))).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }, Some("""
      SELECT l_returnflag, l_linestatus,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST((1 - CAST(l_discount AS DECIMAL(18,2))) * (1 + CAST(l_tax AS DECIMAL(18,2))) AS DECIMAL(8,4))) AS DOUBLE) AS sum_charge,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
        CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
        COUNT(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1999-12-31 00:00:00'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus""")),

    // ---- window: top-N per group (SURVEY P4-adjacent) -------------------
    ("q02_topn_per_group", (s: SparkSession, d: String) => {
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, d, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("o_orderpriority"), col("rn"), col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_orderpriority"), col("rn"))
    }, Some("""
      SELECT o_orderpriority, rn, o_orderkey, o_totalprice FROM (
        SELECT o_orderpriority, o_orderkey, o_totalprice,
               CAST(ROW_NUMBER() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rn
        FROM orders) t
      WHERE rn <= 3 ORDER BY o_orderpriority, rn""")),

    // ---- 3-way join + agg + top-k (TPC-H Q3 shape) ----------------------
    ("q03_shipping_priority", (s: SparkSession, d: String) => {
      t(s, d, "customer").filter(col("c_mktsegment") === "BUILDING")
        .join(t(s, d, "orders"), col("c_custkey") === col("o_custkey"))
        .join(t(s, d, "lineitem"), col("o_orderkey") === col("l_orderkey"))
        .filter(col("o_orderdate") < ts("1999-07-01 00:00:00") &&
                col("l_shipdate") > ts("1999-07-01 00:00:00"))
        .groupBy(col("l_orderkey"), col("o_orderdate"))
        .agg(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
          .cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    }, Some("""
      SELECT l_orderkey, o_orderdate,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
      FROM customer JOIN orders ON c_custkey = o_custkey
                    JOIN lineitem ON o_orderkey = l_orderkey
      WHERE c_mktsegment = 'BUILDING'
        AND o_orderdate < TIMESTAMP '1999-07-01 00:00:00'
        AND l_shipdate > TIMESTAMP '1999-07-01 00:00:00'
      GROUP BY l_orderkey, o_orderdate
      ORDER BY revenue DESC, l_orderkey LIMIT 10""")),

    // ---- semi join / EXISTS (SURVEY T1-family) --------------------------
    ("q04_exists_semi", (s: SparkSession, d: String) => {
      val o = t(s, d, "orders"); val l = t(s, d, "lineitem")
      o.join(l, o("o_orderkey") === l("l_orderkey") && l("l_shipdate") > o("o_orderdate"),
             "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
        .orderBy(col("o_orderpriority"))
    }, Some("""
      SELECT o_orderpriority, COUNT(*) AS order_count
      FROM orders
      WHERE EXISTS (SELECT 1 FROM lineitem
                    WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
      GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // ---- 6-way join with broadcast dims (TPC-H Q5 shape) ----------------
    ("q05_local_supplier_volume", (s: SparkSession, d: String) => {
      t(s, d, "customer")
        .join(t(s, d, "orders"), col("c_custkey") === col("o_custkey"))
        .join(t(s, d, "lineitem"), col("o_orderkey") === col("l_orderkey"))
        .join(broadcast(t(s, d, "supplier")),
              col("l_suppkey") === col("s_suppkey") &&
              col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(t(s, d, "nation")), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, d, "region")), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
               .cast("double").as("revenue"),
             count(lit(1)).as("n_items"))
        .orderBy(col("r_name"), col("n_name"))
    }, Some("""
      SELECT r_name, n_name,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
             COUNT(*) AS n_items
      FROM customer JOIN orders ON c_custkey = o_custkey
                    JOIN lineitem ON o_orderkey = l_orderkey
                    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
                    JOIN nation ON s_nationkey = n_nationkey
                    JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name, n_name ORDER BY r_name, n_name""")),

    // ---- filter + scalar agg (TPC-H Q6 shape; pushdown showcase) --------
    ("q06_forecast_revenue", (s: SparkSession, d: String) => {
      t(s, d, "lineitem")
        .filter(col("l_shipdate") >= ts("1998-01-01 00:00:00") &&
                col("l_shipdate") < ts("1999-01-01 00:00:00") &&
                col("l_discount").between(0.03, 0.05) &&
                col("l_quantity") < 24)
        .agg(sum(dec(col("l_extendedprice")) * dec(col("l_discount")))
               .cast("double").as("revenue"),
             count(lit(1)).as("n_rows"))
    }, Some("""
      SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
             COUNT(*) AS n_rows
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1999-01-01 00:00:00'
        AND l_discount BETWEEN 0.03 AND 0.05
        AND l_quantity < 24""")),

    // ---- left outer join + null-safe agg (SURVEY P6 family) -------------
    ("q07_left_join_agg", (s: SparkSession, d: String) => {
      t(s, d, "customer")
        .join(t(s, d, "orders"), col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"), col("c_name"))
        .agg(count(col("o_orderkey")).as("n_orders"),
             coalesce(sum(dec(col("o_totalprice"))), lit(0).cast(DecimalType(18, 2)))
               .cast("double").as("total_spent"))
        .orderBy(col("c_custkey"))
    }, Some("""
      SELECT c_custkey, c_name, COUNT(o_orderkey) AS n_orders,
             CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 0) AS DOUBLE) AS total_spent
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey, c_name ORDER BY c_custkey""")),

    // ---- full outer join -----------------------------------------------
    ("q08_full_outer_join", (s: SparkSession, d: String) => {
      val c = t(s, d, "customer").groupBy(col("c_nationkey").as("nk"))
        .agg(count(lit(1)).as("n_cust"))
      val su = t(s, d, "supplier").groupBy(col("s_nationkey").as("nk2"))
        .agg(count(lit(1)).as("n_supp"))
      c.join(su, col("nk") === col("nk2"), "full")
        .select(coalesce(col("nk"), col("nk2")).as("nationkey"),
                coalesce(col("n_cust"), lit(0L)).as("n_cust"),
                coalesce(col("n_supp"), lit(0L)).as("n_supp"))
        .orderBy(col("nationkey"))
    }, Some("""
      SELECT COALESCE(c.nk, s.nk2) AS nationkey,
             COALESCE(c.n_cust, 0) AS n_cust, COALESCE(s.n_supp, 0) AS n_supp
      FROM (SELECT c_nationkey AS nk, COUNT(*) AS n_cust FROM customer GROUP BY 1) c
      FULL OUTER JOIN (SELECT s_nationkey AS nk2, COUNT(*) AS n_supp FROM supplier GROUP BY 1) s
      ON c.nk = s.nk2 ORDER BY nationkey""")),

    // ---- anti join (SURVEY T1: incremental file-set semantics) ----------
    ("q09_anti_join", (s: SparkSession, d: String) => {
      t(s, d, "customer")
        .join(t(s, d, "orders"), col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    }, Some("""
      SELECT c_custkey, c_name FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      ORDER BY c_custkey""")),

    // ---- cross join (tiny dims only — never at fact scale) --------------
    ("q10_cross_join", (s: SparkSession, d: String) => {
      t(s, d, "region").select(col("r_name"))
        .crossJoin(t(s, d, "nation").select(col("n_name")))
        .orderBy(col("r_name"), col("n_name"))
    }, Some("""
      SELECT r_name, n_name FROM region CROSS JOIN nation
      ORDER BY r_name, n_name""")),

    // ---- set ops (SURVEY A5) --------------------------------------------
    ("q11_union_distinct", (s: SparkSession, d: String) => {
      val n = t(s, d, "nation")
      t(s, d, "customer").join(n, col("c_nationkey") === col("n_nationkey"))
        .select(col("n_name"))
        .union(t(s, d, "supplier").join(n, col("s_nationkey") === col("n_nationkey"))
          .select(col("n_name")))
        .distinct()
        .orderBy(col("n_name"))
    }, Some("""
      SELECT n_name FROM customer JOIN nation ON c_nationkey = n_nationkey
      UNION
      SELECT n_name FROM supplier JOIN nation ON s_nationkey = n_nationkey
      ORDER BY n_name""")),

    ("q12_intersect", (s: SparkSession, d: String) => {
      val n = t(s, d, "nation")
      t(s, d, "customer").join(n, col("c_nationkey") === col("n_nationkey"))
        .select(col("n_name"))
        .intersect(t(s, d, "supplier").join(n, col("s_nationkey") === col("n_nationkey"))
          .select(col("n_name")))
        .orderBy(col("n_name"))
    }, Some("""
      SELECT n_name FROM customer JOIN nation ON c_nationkey = n_nationkey
      INTERSECT
      SELECT n_name FROM supplier JOIN nation ON s_nationkey = n_nationkey
      ORDER BY n_name""")),

    ("q13_except", (s: SparkSession, d: String) => {
      val n = t(s, d, "nation")
      t(s, d, "customer").join(n, col("c_nationkey") === col("n_nationkey"))
        .select(col("n_name"))
        .except(t(s, d, "supplier").join(n, col("s_nationkey") === col("n_nationkey"))
          .select(col("n_name")))
        .orderBy(col("n_name"))
    }, Some("""
      SELECT n_name FROM customer JOIN nation ON c_nationkey = n_nationkey
      EXCEPT
      SELECT n_name FROM supplier JOIN nation ON s_nationkey = n_nationkey
      ORDER BY n_name""")),

    // ---- rollup / cube / grouping sets ----------------------------------
    ("q14_rollup", (s: SparkSession, d: String) => {
      t(s, d, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), sum(dec(col("l_quantity"))).cast("double").as("qty"))
        .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))
    }, Some("""
      SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
      FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
      ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""")),

    ("q15_cube", (s: SparkSession, d: String) => {
      t(s, d, "events")
        .withColumn("yr", year(col("ts")))
        .cube(col("event_type"), col("yr"))
        .agg(count(lit(1)).as("n"))
        .orderBy(asc_nulls_first("event_type"), asc_nulls_first("yr"))
    }, Some("""
      SELECT event_type, CAST(year(ts) AS INT) AS yr, COUNT(*) AS n
      FROM events GROUP BY CUBE (event_type, CAST(year(ts) AS INT))
      ORDER BY event_type ASC NULLS FIRST, yr ASC NULLS FIRST""")),

    ("q16_grouping_sets", (s: SparkSession, d: String) => {
      Tables.load(s, d, "lineitem").createOrReplaceTempView("lineitem")
      s.sql("""
        SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""")
    }, Some("""
      SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
      FROM lineitem
      GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
      ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""")),

    // ---- window function suite ------------------------------------------
    ("q17_window_suite", (s: SparkSession, d: String) => {
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
      val wp = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, d, "orders").select(
        col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        row_number().over(w).as("rn"),
        lag(col("o_totalprice"), 1).over(w).as("prev_price"),
        lead(col("o_totalprice"), 1).over(w).as("next_price"),
        sum(dec(col("o_totalprice")))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("double").as("running_spend"),
        rank().over(wp).as("price_rank"))
        .orderBy(col("o_custkey"), col("rn"))
    }, Some("""
      SELECT o_custkey, o_orderkey, o_totalprice,
        CAST(ROW_NUMBER() OVER w AS INT) AS rn,
        LAG(o_totalprice, 1) OVER w AS prev_price,
        LEAD(o_totalprice, 1) OVER w AS next_price,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend,
        CAST(RANK() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS price_rank
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      ORDER BY o_custkey, rn""")),

    // ---- top-k (TakeOrderedAndProject — no global sort at scale) --------
    ("q18_topk", (s: SparkSession, d: String) => {
      t(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
        .limit(25)
    }, Some("""
      SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
      ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 25""")),

    // ---- string function suite (SURVEY §2.6 scalar functions) -----------
    ("q19_string_funcs", (s: SparkSession, d: String) => {
      t(s, d, "part").select(
        col("p_partkey"),
        lower(col("p_name")).as("name_lower"),
        upper(col("p_name")).as("name_upper"),
        length(col("p_name")).as("name_len"),
        substring(col("p_name"), 1, 4).as("name_pre"),
        concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
        regexp_extract(col("p_name"), "^(\\w+)", 1).as("first_word"),
        regexp_replace(col("p_name"), "[aeiou]", "").as("devoweled"),
        split(col("p_name"), " ").getItem(1).as("second_word"),
        lpad(col("p_brand"), 10, "#").as("brand_pad"),
        reverse(col("p_name")).as("name_rev"))
        .orderBy(col("p_partkey"))
    }, Some("""
      SELECT p_partkey,
        lower(p_name) AS name_lower,
        upper(p_name) AS name_upper,
        CAST(length(p_name) AS INT) AS name_len,
        substring(p_name, 1, 4) AS name_pre,
        concat_ws('|', p_brand, p_type) AS brand_type,
        regexp_extract(p_name, '^(\w+)', 1) AS first_word,
        regexp_replace(p_name, '[aeiou]', '', 'g') AS devoweled,
        string_split(p_name, ' ')[2] AS second_word,
        lpad(p_brand, 10, '#') AS brand_pad,
        reverse(p_name) AS name_rev
      FROM part ORDER BY p_partkey""")),

    // ---- date/time function suite ---------------------------------------
    ("q20_date_funcs", (s: SparkSession, d: String) => {
      t(s, d, "orders").select(
        col("o_orderkey"), col("o_orderdate"),
        year(col("o_orderdate")).as("yr"),
        month(col("o_orderdate")).as("mo"),
        dayofmonth(col("o_orderdate")).as("dom"),
        quarter(col("o_orderdate")).as("qtr"),
        date_trunc("month", col("o_orderdate")).as("month_start"),
        date_format(col("o_orderdate"), "yyyy-MM").as("ym"),
        datediff(lit("2002-01-01").cast(DateType), col("o_orderdate").cast(DateType))
          .as("days_to_2002"),
        unix_timestamp(col("o_orderdate")).as("epoch_s"))
        .orderBy(col("o_orderkey"))
    }, Some("""
      SELECT o_orderkey, o_orderdate,
        CAST(year(o_orderdate) AS INT) AS yr,
        CAST(month(o_orderdate) AS INT) AS mo,
        CAST(day(o_orderdate) AS INT) AS dom,
        CAST(quarter(o_orderdate) AS INT) AS qtr,
        date_trunc('month', o_orderdate) AS month_start,
        strftime(o_orderdate, '%Y-%m') AS ym,
        CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS INT) AS days_to_2002,
        CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s
      FROM orders ORDER BY o_orderkey""")),

    // ---- conditional expressions ----------------------------------------
    ("q21_conditional", (s: SparkSession, d: String) => {
      t(s, d, "orders").select(
        col("o_orderkey"),
        when(col("o_totalprice") > 300000, "high")
          .when(col("o_totalprice") > 150000, "mid")
          .otherwise("low").as("bucket"),
        coalesce(nullif(col("o_orderstatus"), lit("O")), lit("open")).as("status_or"),
        least(col("o_totalprice"), lit(200000.0)).as("capped"),
        greatest(col("o_totalprice"), lit(50000.0)).as("floored"))
        .orderBy(col("o_orderkey"))
    }, Some("""
      SELECT o_orderkey,
        CASE WHEN o_totalprice > 300000 THEN 'high'
             WHEN o_totalprice > 150000 THEN 'mid' ELSE 'low' END AS bucket,
        COALESCE(NULLIF(o_orderstatus, 'O'), 'open') AS status_or,
        LEAST(o_totalprice, 200000.0) AS capped,
        GREATEST(o_totalprice, 50000.0) AS floored
      FROM orders ORDER BY o_orderkey""")),

    // ---- JSON extraction (SURVEY S4 family) ------------------------------
    ("q22_json_extract", (s: SparkSession, d: String) => {
      t(s, d, "events")
        .select(col("event_type"), get_json_object(col("props"), "$.k").cast("int").as("k"))
        .groupBy(col("event_type"))
        .agg(sum(col("k")).as("sum_k"), max(col("k")).as("max_k"),
             count(col("k")).as("n_k"))
        .orderBy(col("event_type"))
    }, Some("""
      SELECT event_type,
             CAST(SUM(k) AS BIGINT) AS sum_k, MAX(k) AS max_k, COUNT(k) AS n_k
      FROM (SELECT event_type, CAST(json_extract_string(props, '$.k') AS INT) AS k FROM events) t
      GROUP BY event_type ORDER BY event_type""")),

    // ---- null-count profile (SURVEY A3) ----------------------------------
    ("q23_null_profile", (s: SparkSession, d: String) => {
      val o = t(s, d, "orders")
      o.select(o.columns.toSeq.map(c => count(when(col(c).isNull, 1)).as(c)): _*)
    }, Some("""
      SELECT COUNT(CASE WHEN o_orderkey IS NULL THEN 1 END) AS o_orderkey,
             COUNT(CASE WHEN o_custkey IS NULL THEN 1 END) AS o_custkey,
             COUNT(CASE WHEN o_orderstatus IS NULL THEN 1 END) AS o_orderstatus,
             COUNT(CASE WHEN o_totalprice IS NULL THEN 1 END) AS o_totalprice,
             COUNT(CASE WHEN o_orderdate IS NULL THEN 1 END) AS o_orderdate,
             COUNT(CASE WHEN o_orderpriority IS NULL THEN 1 END) AS o_orderpriority
      FROM orders""")),

    // ---- value_counts (SURVEY A6/A12) ------------------------------------
    ("q24_value_counts", (s: SparkSession, d: String) => {
      t(s, d, "events").groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("event_type"))
    }, Some("""
      SELECT event_type, COUNT(*) AS n FROM events
      GROUP BY event_type ORDER BY n DESC, event_type""")),

    // ---- multi-distinct aggregation --------------------------------------
    ("q25_count_distinct", (s: SparkSession, d: String) => {
      t(s, d, "lineitem").agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        countDistinct(col("l_orderkey")).as("n_orders"),
        count(lit(1)).as("n_rows"))
    }, Some("""
      SELECT COUNT(DISTINCT l_partkey) AS n_parts,
             COUNT(DISTINCT l_suppkey) AS n_supps,
             COUNT(DISTINCT l_orderkey) AS n_orders,
             COUNT(*) AS n_rows
      FROM lineitem""")),

    // ---- case-insensitive filter + complement (SURVEY A8) ----------------
    ("q26_filter_ci", (s: SparkSession, d: String) => {
      t(s, d, "events").agg(
        count(when(lower(col("event_type")) === "purchase", 1)).as("purchases"),
        count(when(lower(col("event_type")) =!= "purchase", 1)).as("others"))
    }, Some("""
      SELECT COUNT(CASE WHEN lower(event_type) = 'purchase' THEN 1 END) AS purchases,
             COUNT(CASE WHEN lower(event_type) <> 'purchase' THEN 1 END) AS others
      FROM events""")),

    // ---- derived boolean distribution (SURVEY A9) ------------------------
    ("q27_derived_bool", (s: SparkSession, d: String) => {
      t(s, d, "events")
        .withColumn("high_value", col("value") > 100)
        .groupBy(col("event_type"), col("high_value"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("event_type"), col("high_value"))
    }, Some("""
      SELECT event_type, value > 100 AS high_value, COUNT(*) AS n
      FROM events GROUP BY event_type, value > 100
      ORDER BY event_type, high_value""")),

    // ---- two-key group + label mapping (SURVEY A10) ----------------------
    ("q28_label_map", (s: SparkSession, d: String) => {
      t(s, d, "events")
        .select(col("event_type"),
                when(col("value") > 100, "big").otherwise("small").as("size_label"))
        .groupBy(col("event_type"), col("size_label"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("event_type"), col("size_label"))
    }, Some("""
      SELECT event_type,
             CASE WHEN value > 100 THEN 'big' ELSE 'small' END AS size_label,
             COUNT(*) AS n
      FROM events GROUP BY 1, 2 ORDER BY event_type, size_label""")),

    // ---- non-null count split (SURVEY A11) -------------------------------
    ("q29_notnull_split", (s: SparkSession, d: String) => {
      t(s, d, "events").groupBy(col("event_type"))
        .agg(count(col("value")).as("n_value"),
             count(when(col("value") > 150, col("value"))).as("n_big"),
             count(lit(1)).as("n_rows"))
        .orderBy(col("event_type"))
    }, Some("""
      SELECT event_type, COUNT(value) AS n_value,
             COUNT(CASE WHEN value > 150 THEN value END) AS n_big,
             COUNT(*) AS n_rows
      FROM events GROUP BY event_type ORDER BY event_type""")),

    // ---- global sequence regeneration (SURVEY P4) ------------------------
    // Window with no partition = single task; acceptable for final ordered
    // publication only. The scalable per-partition-offset variant is
    // graft.operators.SeqNumber (used by the cricket publish job).
    ("q30_global_seq", (s: SparkSession, d: String) => {
      t(s, d, "orders")
        .select(col("o_orderkey"), col("o_orderdate"))
        .withColumn("seq", row_number().over(
          Window.orderBy(col("o_orderdate"), col("o_orderkey"))))
        .orderBy(col("seq"))
    }, Some("""
      SELECT o_orderkey, o_orderdate,
             CAST(ROW_NUMBER() OVER (ORDER BY o_orderdate, o_orderkey) AS INT) AS seq
      FROM orders ORDER BY seq""")),

    // Same numbering through the scale-safe operator: range-partition +
    // per-partition offsets, NO unpartitioned window anywhere in the
    // plan (PlanGuardSpec forbids it outside q30's allowlist entry).
    // Identical oracle semantics; seq is BIGINT here (offset arithmetic)
    // vs q30's INT (row_number).
    ("q30b_global_seq_scalable", (s: SparkSession, d: String) => {
      graft.operators.SeqNumber.withSeq(
          t(s, d, "orders").select(col("o_orderkey"), col("o_orderdate")),
          Seq(col("o_orderdate"), col("o_orderkey")))
        .orderBy(col("seq"))
    }, Some("""
      SELECT o_orderkey, o_orderdate,
             CAST(ROW_NUMBER() OVER (ORDER BY o_orderdate, o_orderkey) AS BIGINT) AS seq
      FROM orders ORDER BY seq""")),

    // ---- arg_max / arg_min (SURVEY P8 last-row lookup) -------------------
    ("q31_argmax", (s: SparkSession, d: String) => {
      t(s, d, "orders").groupBy(col("o_custkey"))
        .agg(max_by(col("o_totalprice"), col("o_orderkey")).as("last_order_price"),
             min_by(col("o_totalprice"), col("o_orderkey")).as("first_order_price"),
             max(col("o_orderdate")).as("last_date"))
        .orderBy(col("o_custkey"))
    }, Some("""
      SELECT o_custkey,
             arg_max(o_totalprice, o_orderkey) AS last_order_price,
             arg_min(o_totalprice, o_orderkey) AS first_order_price,
             MAX(o_orderdate) AS last_date
      FROM orders GROUP BY o_custkey ORDER BY o_custkey""")),

    // ---- explode + wordcount (SURVEY T7 flatten family) ------------------
    ("q32_wordcount", (s: SparkSession, d: String) => {
      t(s, d, "documents")
        .select(explode(split(col("text"), " ")).as("word"))
        .groupBy(col("word"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("word"))
        .limit(50)
    }, Some("""
      SELECT word, COUNT(*) AS n
      FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents) t
      GROUP BY word ORDER BY n DESC, word LIMIT 50""")),

    // ---- posexplode: positional flatten (SURVEY T7 core) -----------------
    ("q33_posexplode", (s: SparkSession, d: String) => {
      t(s, d, "documents").filter(col("doc_id") < 20)
        .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "word")))
        .orderBy(col("doc_id"), col("pos"))
    }, Some("""
      SELECT doc_id,
             CAST(unnest(range(len(string_split(text, ' ')))) AS INT) AS pos,
             unnest(string_split(text, ' ')) AS word
      FROM documents WHERE doc_id < 20 ORDER BY doc_id, pos""")),

    // ---- higher-order array functions (SURVEY T6 family) -----------------
    ("q34_hof_array", (s: SparkSession, d: String) => {
      t(s, d, "embeddings").select(
        col("vec_id"),
        aggregate(col("embedding"), lit(0.0),
          (acc: Column, x: Column) => acc + x.cast("double")).as("emb_sum"),
        array_max(col("embedding")).cast("double").as("emb_max"),
        array_min(col("embedding")).cast("double").as("emb_min"),
        size(filter(col("embedding"), (x: Column) => x > lit(0f))).as("n_pos"),
        size(col("embedding")).as("dim"))
        .orderBy(col("vec_id"))
    }, Some("""
      SELECT vec_id,
        list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(embedding, x -> CAST(x AS DOUBLE))), (a, b) -> a + b) AS emb_sum,
        CAST(list_max(embedding) AS DOUBLE) AS emb_max,
        CAST(list_min(embedding) AS DOUBLE) AS emb_min,
        CAST(len(list_filter(embedding, x -> x > 0)) AS INT) AS n_pos,
        CAST(len(embedding) AS INT) AS dim
      FROM embeddings ORDER BY vec_id""")),

    // ---- pivot ----------------------------------------------------------
    ("q35_pivot", (s: SparkSession, d: String) => {
      t(s, d, "events").groupBy(col("user_id"))
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(count(lit(1)))
        .na.fill(0)
        .orderBy(col("user_id"))
    }, Some("""
      SELECT user_id,
        COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS click,
        COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS error,
        COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
        COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
        COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS view
      FROM events GROUP BY user_id ORDER BY user_id""")),

    // ---- distinct count over a moving window frame ------------------
    // Spark has no COUNT(DISTINCT) OVER; the idiomatic encoding is
    // size(collect_set() OVER frame) — still one window pass, per-row
    // state bounded by the frame (20 rows), so it holds at scale. The
    // oracle is DuckDB's native windowed distinct aggregate.
    ("q56_window_distinct", (s: SparkSession, d: String) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id")).rowsBetween(-19, 0)
      t(s, d, "events")
        .select(col("event_id"), col("user_id"),
          size(collect_set(col("event_type")).over(w))
            .cast("long").as("distinct_types"))
        .orderBy(col("event_id"))
    }, Some("""
      SELECT event_id, user_id,
             CAST(COUNT(DISTINCT event_type) OVER (PARTITION BY user_id
               ORDER BY ts, event_id
               ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS BIGINT)
               AS distinct_types
      FROM events ORDER BY event_id""")),

    // ---- ordered string aggregation (LISTAGG / string_agg) ----------
    // Spark 4's listagg is order-nondeterministic across partitions;
    // the deterministic encoding is array_sort(collect_list) +
    // concat_ws — same single hash aggregation, and the sort is per
    // GROUP (bounded), not global.
    ("q57_listagg", (s: SparkSession, d: String) => {
      val nation = t(s, d, "nation")
      val region = t(s, d, "region")
      nation.join(broadcast(region),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(
          concat_ws(",", array_sort(collect_list(col("n_name"))))
            .as("nations"),
          count(lit(1)).as("n"))
        .orderBy(col("r_name"))
    }, Some("""
      SELECT r_name, string_agg(n_name, ',' ORDER BY n_name) AS nations,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM nation JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name ORDER BY r_name""")),

    // ---- VARIANT semi-structured path (Spark 4 VariantType) ---------
    // parse once into an open VARIANT column, then typed extraction +
    // schema discovery downstream — the modern ingestion shape for
    // schema-drifting JSON (vs q22's per-path string extraction).
    // DuckDB has no VARIANT; the oracle uses its JSON reader, which is
    // exactly the semantic contract variant_get must honor.
    ("q58_variant_extract", (s: SparkSession, d: String) => {
      t(s, d, "events")
        .select(col("event_type"), parse_json(col("props")).as("v"))
        .select(col("event_type"),
          variant_get(col("v"), "$.k", "int").as("k"),
          schema_of_variant(col("v")).as("vschema"))
        .groupBy(col("event_type"), col("vschema"))
        .agg(count(col("k")).as("n_k"), sum(col("k")).as("sum_k"),
          min(col("k")).as("min_k"), max(col("k")).as("max_k"))
        .orderBy(col("event_type"))
    }, Some("""
      SELECT event_type, 'OBJECT<k: BIGINT>' AS vschema,
             COUNT(k) AS n_k, CAST(SUM(k) AS BIGINT) AS sum_k,
             MIN(k) AS min_k, MAX(k) AS max_k
      FROM (SELECT event_type,
              CAST(json_extract_string(props, '$.k') AS INT) AS k
            FROM events) t
      GROUP BY event_type ORDER BY event_type""")),

    // ---- market-basket association rules (Agrawal VLDB'94 2-itemset
    // core): part pairs co-occurring in >= 2 orders, with exact-ppm
    // support/confidence/lift. Pair generation is an equi-join on the
    // order key with the hot-basket cap oracle-modeled; lift/conf are
    // DECIMAL(38,0) integral `div` — no IEEE division ----------------
    ("q59_basket_rules", (s: SparkSession, d: String) =>
      graft.ext.Association.frequentPairs(t(s, d, "lineitem")),
      Some("""
      WITH b0 AS (SELECT DISTINCT l_orderkey AS okey, l_partkey AS part
                  FROM lineitem),
      ok AS (SELECT okey FROM b0 GROUP BY okey HAVING COUNT(*) <= 100),
      b AS (SELECT b0.* FROM b0 JOIN ok USING (okey)),
      tot AS (SELECT COUNT(DISTINCT okey) AS n_orders FROM b),
      pc AS (SELECT part, COUNT(*) AS n FROM b GROUP BY part),
      pr AS (SELECT x.part AS part_a, y.part AS part_b,
               COUNT(*) AS n_ab
             FROM b x JOIN b y ON x.okey = y.okey AND x.part < y.part
             GROUP BY 1, 2 HAVING COUNT(*) >= 2)
      SELECT pr.part_a, pr.part_b, pr.n_ab, pa.n AS n_a, pb.n AS n_b,
        CAST((CAST(pr.n_ab AS HUGEINT) * tot.n_orders * 1000000)
          // (CAST(pa.n AS HUGEINT) * pb.n) AS BIGINT) AS lift_ppm,
        CAST((CAST(pr.n_ab AS HUGEINT) * 1000000) // pa.n AS BIGINT)
          AS conf_ppm
      FROM pr
      JOIN pc pa ON pa.part = pr.part_a
      JOIN pc pb ON pb.part = pr.part_b
      CROSS JOIN tot
      ORDER BY part_a, part_b""")),

    // ---- relative-rank window family: percent_rank / cume_dist /
    // ntile over per-type value order — the remaining rank-function
    // surface q53's rank/dense_rank suite doesn't cover. Unique
    // (value, event_id) order keys make peer groups singletons, so
    // both engines' definitions coincide exactly; partitioned by
    // event_type (bounded strata — never an unpartitioned window) ----
    ("q60_relative_ranks", (s: SparkSession, d: String) => {
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("value"), col("event_id"))
      t(s, d, "events")
        .select(col("event_id"), col("event_type"),
          percent_rank().over(w).as("pr"),
          cume_dist().over(w).as("cd"),
          ntile(4).over(w).as("quartile"))
        .orderBy(col("event_id"))
    }, Some("""
      SELECT event_id, event_type,
             percent_rank() OVER w AS pr,
             cume_dist() OVER w AS cd,
             CAST(ntile(4) OVER w AS INT) AS quartile
      FROM events
      WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id)
      ORDER BY event_id""")),

    // ---- RANGE-frame (logical-offset) windows: trailing one-hour
    // sliding sum/count per user over event TIME, not row position —
    // the window-frame surface the q17/q52/q60 ROWS suites don't
    // touch. Frame = RANGE 3599999999 µs PRECEDING..CURRENT ROW over
    // epoch-microsecond order: value-based bounds + all-peers-included
    // semantics are identical in both engines, and the summed cents
    // are exact integers so frame-set equality IS result equality;
    // partitioned by user_id, never an unpartitioned window ----------
    ("q61_range_window", (s: SparkSession, d: String) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("tus"))
        .rangeBetween(-3599999999L, Window.currentRow)
      t(s, d, "events")
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("tus"),
          (col("value").cast("decimal(18,2)") * 100).cast("long")
            .as("cents"))
        .select(col("event_id"), col("user_id"), col("tus"),
          sum(col("cents")).over(w).as("hour_cents"),
          count(lit(1)).over(w).as("hour_events"))
        .orderBy(col("event_id"))
    }, Some("""
      WITH b AS (SELECT event_id, user_id, epoch_us(ts) AS tus,
              CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
            FROM events)
      SELECT event_id, user_id, tus,
             CAST(SUM(cents) OVER w AS BIGINT) AS hour_cents,
             CAST(COUNT(*) OVER w AS BIGINT) AS hour_events
      FROM b
      WINDOW w AS (PARTITION BY user_id ORDER BY tus
                   RANGE BETWEEN 3599999999 PRECEDING AND CURRENT ROW)
      ORDER BY event_id"""))
  )

  def queries: Map[String, QFn] = defs.map(q => q._1 -> q._2).toMap
  def oracles: Map[String, String] =
    defs.collect { case (n, _, Some(o)) => n -> o.stripMargin.trim }.toMap
}
