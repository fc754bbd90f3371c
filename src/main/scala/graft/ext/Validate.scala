package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Declarative data-quality constraint auditing (the Deequ/unit-test
  * shape: Schelter et al., VLDB'18): a fact table is admitted to the
  * corpus only after completeness / uniqueness / range / domain /
  * referential constraints hold, and the audit must cost ONE pass, not
  * one scan per constraint.
  *
  * All scan-local constraints fold into a single aggregation (one
  * map-side-combined pass over the fact table, constant-size state);
  * the referential check is one left-anti join against the dimension's
  * key — co-partitionable at cluster scale. Violation COUNTS (not
  * booleans) are reported so a production gate can alert on rates.
  */
object Validate {

  /** Constraint audit of the `lineitem` fact against `orders`:
    * completeness (l_returnflag non-null), primary-key uniqueness
    * ((l_orderkey, l_linenumber), via a portable concat key),
    * range (l_quantity in [1, 50]), non-negativity (l_extendedprice),
    * two domain checks (l_returnflag in A/N/R, l_linestatus in O/F),
    * and referential integrity (every l_orderkey exists in orders).
    *
    * Output: (check_name, violations, passed), check_name ascending.
    */
  def constraintAudit(lineitem: DataFrame, orders: DataFrame): DataFrame = {
    val li = graft.core.Tables.spread(lineitem)
    val scan = li.agg(
      sum(when(col("l_returnflag").isNull, 1L).otherwise(0L)).as("c_complete"),
      (count(lit(1)) - countDistinct(
        concat_ws("|", col("l_orderkey"), col("l_linenumber"))))
        .as("c_unique"),
      sum(when(col("l_quantity") < 1.0 || col("l_quantity") > 50.0, 1L)
        .otherwise(0L)).as("c_range"),
      sum(when(col("l_extendedprice") < 0.0, 1L).otherwise(0L)).as("c_nonneg"),
      sum(when(!col("l_returnflag").isin("A", "N", "R"), 1L).otherwise(0L))
        .as("c_dom_flag"),
      sum(when(!col("l_linestatus").isin("O", "F"), 1L).otherwise(0L))
        .as("c_dom_status"))
    val fk = li.join(orders.select(col("o_orderkey")),
        col("l_orderkey") === col("o_orderkey"), "left_anti")
      .agg(count(lit(1)).as("c_fk"))
    scan.crossJoin(fk)
      .selectExpr("""stack(7,
        'complete_l_returnflag', c_complete,
        'unique_pk', c_unique,
        'range_l_quantity_1_50', c_range,
        'nonneg_l_extendedprice', c_nonneg,
        'domain_l_returnflag', c_dom_flag,
        'domain_l_linestatus', c_dom_status,
        'fk_orders', c_fk) AS (check_name, violations)""")
      .withColumn("passed", col("violations") === 0L)
      .orderBy(col("check_name"))
  }
}
