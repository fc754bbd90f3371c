package graft

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.AsOfJoin
import graft.plans.AsOfJoinNative

class AsOfNativeSpec extends SparkSpec {

  val sf = "/root/testdata/sf0.001"

  private def clicksAndPurchases = {
    val ev = Tables.load(spark, sf, "events")
    val clicks = ev.filter(col("event_type") === "click")
      .groupBy(col("user_id"), col("ts"))
      .agg(max(col("event_id")).as("click_id"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    (purchases, clicks)
  }

  test("native as-of exec is row-identical to the union+window operator") {
    val (p, c) = clicksAndPurchases
    val viaWindow = AsOfJoin.lastBefore(p, c, "user_id", "ts", Seq("click_id"))
    val viaNative = AsOfJoinNative.lastBefore(p, c, "user_id", "ts", Seq("click_id"))
    assert(viaNative.columns.toSeq == viaWindow.columns.toSeq)
    assert(viaNative.exceptAll(viaWindow).count() == 0,
      viaNative.exceptAll(viaWindow).limit(5).collect().mkString("; "))
    assert(viaWindow.exceptAll(viaNative).count() == 0)
    assert(viaNative.count() > 0)
  }

  test("native as-of plan contains the custom exec and two key shuffles") {
    val (p, c) = clicksAndPurchases
    val df = AsOfJoinNative.lastBefore(p, c, "user_id", "ts", Seq("click_id"))
    df.collect() // AQE prints only the final plan after execution
    val plan = df.queryExecution.executedPlan.toString
    // nodeName strips the Exec suffix
    assert(plan.contains("AsOfJoin "), plan)
    assert(plan.contains("Exchange hashpartitioning(user_id"), plan)
  }

  test("left rows with no prior match carry null payload") {
    val (p, c) = clicksAndPurchases
    val out = AsOfJoinNative.lastBefore(p, c, "user_id", "ts", Seq("click_id"))
    // first purchase of some user precedes any click -> null asof_ts
    val withNull = out.filter(col("asof_ts").isNull).count()
    val without = out.filter(col("asof_ts").isNotNull).count()
    assert(withNull + without == out.count())
    assert(without > 0)
  }
}
