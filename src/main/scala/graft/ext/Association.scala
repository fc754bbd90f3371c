package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.PlanCapture.CheckpointOps

/** Market-basket association mining over the order/part fact table —
  * the classic "what co-occurs" curation signal (Agrawal & Srikant,
  * VLDB'94 frequent itemsets, here the 2-itemset + rule-stats core a
  * pipeline actually ships): which part pairs appear in the same order
  * more often than chance, with exact-integer support / confidence /
  * lift so the result is reproducible across engines.
  *
  * Scale shape: ONE groupBy(order) materializes each basket as a
  * sorted distinct-part array and pairs expand INSIDE the array (a
  * flatten/transform projection — no basket self-join, no separate
  * dedup or size passes), so the cost is Σ basket², bounded by capping
  * basket size (`maxBasket`, the hot-bucket discipline — oversized
  * baskets are EXCLUDED, and the oracle models the same cap),
  * never a cross join. Supports/lifts are all counts: the only
  * non-count arithmetic is integral `div` on DECIMAL(38,0) products
  * (ppm scaling), which both engines floor identically — no IEEE
  * division anywhere.
  */
object Association {

  /** Frequent part pairs with rule stats: for every unordered pair
    * (part_a < part_b) co-occurring in >= `minSupport` capped baskets,
    * emit (n_ab, n_a, n_b, lift_ppm, conf_ppm) where
    * lift_ppm = floor(n_ab * n_orders * 1e6 / (n_a * n_b)) and
    * conf_ppm = floor(n_ab * 1e6 / n_a) — parts-per-million fixed
    * point, DECIMAL(38,0) intermediates so 100 TB-scale counts cannot
    * overflow. Output ordered by (part_a, part_b).
    */
  def frequentPairs(lineitem: DataFrame, minSupport: Long = 2L,
                    maxBasket: Int = 100): DataFrame = {
    require(minSupport >= 1 && maxBasket >= 2,
      s"minSupport >= 1, maxBasket >= 2: $minSupport, $maxBasket")
    // ONE groupBy materializes each basket as a sorted distinct-part
    // array (per-group state bounded by the order's own line count),
    // then pair expansion happens INSIDE the array — no basket
    // self-join, no separate dedup/size passes. Sorted arrays make
    // part_a < part_b by construction.
    val baskets = graft.core.Tables.spread(lineitem)
      .select(col("l_orderkey").as("okey"), col("l_partkey").as("part"))
      .groupBy(col("okey"))
      .agg(sort_array(collect_set(col("part"))).as("parts"))
      .filter(size(col("parts")) <= maxBasket)
      .cpGuard() // read three times: total + part counts + pair counts
    val tot = baskets.agg(count(lit(1)).as("n_orders"))
    val pc = baskets.select(explode(col("parts")).as("part"))
      .groupBy(col("part")).agg(count(lit(1)).as("n"))
    val combos = flatten(transform(col("parts"), (x, i) =>
      transform(slice(col("parts"), i + lit(2),
          greatest(size(col("parts")) - i - 1, lit(0))),
        y => struct(x.as("part_a"), y.as("part_b")))))
    val pairs = baskets.select(explode(combos).as("p"))
      .select(col("p.part_a"), col("p.part_b"))
      .groupBy(col("part_a"), col("part_b"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minSupport)
    pairs
      .join(pc.toDF("part_a", "n_a"), Seq("part_a"))
      .join(pc.toDF("part_b", "n_b"), Seq("part_b"))
      .crossJoin(broadcast(tot)) // 1-row total attach (c18 convention)
      .select(col("part_a"), col("part_b"), col("n_ab"), col("n_a"),
        col("n_b"),
        expr("""CAST(CAST(n_ab AS DECIMAL(38,0)) * n_orders * 1000000
                 div (CAST(n_a AS DECIMAL(38,0)) * n_b) AS BIGINT)""")
          .as("lift_ppm"),
        expr("CAST(CAST(n_ab AS DECIMAL(38,0)) * 1000000 div n_a AS BIGINT)")
          .as("conf_ppm"))
      .orderBy(col("part_a"), col("part_b"))
  }
}
