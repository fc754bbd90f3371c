package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.Layout

class LayoutSpec extends SparkSpec {

  val sf = "/root/testdata/sf0.001"

  // bucketed tables need a writable warehouse; build a dedicated session
  // (clear the shared one first — getOrCreate would silently reuse it
  // and ignore the warehouse config)
  lazy val wspark: SparkSession = {
    val wh = Files.createTempDirectory("graft_wh").toString
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    val s = SparkSession.builder()
      .master("local[8]")
      .appName("graft-bucketing")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", wh)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sql("DROP TABLE IF EXISTS li_b")
    s.sql("DROP TABLE IF EXISTS o_b")
    s
  }

  test("bucketed co-located join plans without a shuffle exchange") {
    val li = Tables.load(wspark, sf, "lineitem")
      .select(col("l_orderkey"), col("l_quantity"))
    val o = Tables.load(wspark, sf, "orders")
      .select(col("o_orderkey"), col("o_totalprice"))
    Layout.writeBucketed(li, "li_b", "l_orderkey", 8)
    Layout.writeBucketed(o.withColumnRenamed("o_orderkey", "l_orderkey"),
      "o_b", "l_orderkey", 8)

    // disable broadcast: on driver-sized fixtures Spark would broadcast
    // instead; the point here is the shuffle-free sort-merge path that
    // bucketing buys on fact-to-fact joins at scale
    wspark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = wspark.table("li_b").join(wspark.table("o_b"), "l_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"expected no shuffle, got:\n$plan")
      assert(joined.count() == li.count()) // every lineitem has its order

      val unbucketed = Tables.load(wspark, sf, "lineitem")
        .select(col("l_orderkey"))
        .join(Tables.load(wspark, sf, "orders")
          .select(col("o_orderkey").as("l_orderkey"), col("o_totalprice")),
          "l_orderkey")
      assert(unbucketed.queryExecution.executedPlan.toString
        .contains("Exchange hashpartitioning"))
    } finally wspark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("bucketed band table makes the incremental-dedup probe corpus-shuffle-free") {
    import wspark.implicits._
    wspark.sql("DROP TABLE IF EXISTS corpus_bands")
    val corpus = (0L until 200L).map(i =>
      (i, s"corpus doc number $i with some shared words and body $i"))
      .toDF("doc_id", "text")
    val batch = (1000L until 1020L).map(i =>
      (i, s"fresh doc number $i with some shared words and body $i"))
      .toDF("doc_id", "text")
    // the StreamDedup state shape at cluster scale: corpus bands are
    // written bucketed by BOTH join keys once; each batch's probe then
    // shuffles ONLY the batch side
    graft.operators.Layout.writeBucketed(
      graft.ext.Dedup.minhashBands(graft.ext.Dedup.minhashSignatures(corpus)),
      "corpus_bands", Seq("band_idx", "band_key"), 8)
    wspark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val nb = graft.ext.Dedup.minhashBands(
        graft.ext.Dedup.minhashSignatures(batch))
      val cand = wspark.table("corpus_bands").as("c")
        .join(nb.as("x"),
          col("c.band_idx") === col("x.band_idx") &&
          col("c.band_key") === col("x.band_key"))
      val plan = cand.queryExecution.executedPlan.toString
      val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
      assert(exchanges == 1, s"expected only the batch-side shuffle:\n$plan")
    } finally {
      wspark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      wspark.sql("DROP TABLE IF EXISTS corpus_bands")
      ()
    }
  }

  test("registered w17 keeps the co-located join exchange-free") {
    // the oracle-gated w17 query end to end: the ONLY hash exchange in
    // the plan is the post-join priority rollup — the sort-merge join
    // over the two freshly written bucketed tables shuffles nothing
    val df = graft.analyze.OpQueries
      .queries("w17_bucketed_colocated_join")(wspark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1,
      s"join must be exchange-free (1 rollup shuffle only):\n$plan")
    assert(df.collect().length == 5) // the five order priorities
  }

  test("salted join equals the plain join result under a hot key") {
    val events = Tables.load(spark, sf, "events")
      .select(col("user_id"), col("event_id"), col("value"))
    val users = events.select(col("user_id")).distinct()
      .withColumn("user_tag", concat(lit("u"), col("user_id")))
    val plain = events.join(users, "user_id")
      .select(col("event_id"), col("user_tag"))
    val salted = Layout.saltedJoin(events, users, "user_id",
        salts = 8, entropyCol = "event_id")
      .select(col("event_id"), col("user_tag"))
    assert(salted.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(salted).count() == 0)
  }
}
