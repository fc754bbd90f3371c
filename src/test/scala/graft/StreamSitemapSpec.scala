package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.ext.Curation
import graft.streaming.{StreamSitemap, StreamUrlDedup}

class StreamSitemapSpec extends SparkSpec {

  private def frontierDocs = {
    import spark.implicits._
    (0L until 7L).toDF("doc_id")
      .withColumn("text", lit("x")).withColumn("source", lit("s"))
  }

  private def plantedLocs: Seq[(String, String)] =
    Curation.DomainSitemaps.flatMap { case (d, xml) =>
      "<loc>([^<]*)</loc>".r.findAllMatchIn(xml).map(m => (d, m.group(1)))
    }

  test("split cohorts: streamed discovery == the batch c44 verdicts") {
    import spark.implicits._
    val state = Files.createTempDirectory("ss_state").toString
    val out = Files.createTempDirectory("ss_out").toString + "/disc"
    // the crawled frontier accumulates as seen-URL state first
    StreamUrlDedup.processBatch(spark,
      Curation.urlPlant(frontierDocs).select(col("doc_id"), col("url")),
      0L, state, Files.createTempDirectory("ss_drops").toString + "/d")
    // the advertised locs arrive split across two micro-batches
    val (c1, c2) = plantedLocs.sortBy(_._2).splitAt(4)
    StreamSitemap.processBatch(spark, c1.toDF("sm_domain", "url"), 0L,
      state, out)
    StreamSitemap.processBatch(spark, c2.toDF("sm_domain", "url"), 1L,
      state, out)
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[String]("sm_domain"), r.getAs[String]("url")) ->
        ((r.getAs[String]("norm_url"), r.getAs[Boolean]("allowed"),
          r.getAs[Boolean]("already_seen"), r.getAs[Boolean]("fetchable")))
    val streamed = spark.read.parquet(out).collect().map(key).toMap
    val batch = Curation.sitemapFrontier(frontierDocs).collect()
      .map(key).toMap
    assert(streamed == batch, s"streamed $streamed\nbatch $batch")
  }

  test("micro-batch replay rewrites identical discovery rows") {
    import spark.implicits._
    val state = Files.createTempDirectory("ss_state2").toString
    val out = Files.createTempDirectory("ss_out2").toString + "/disc"
    StreamUrlDedup.processBatch(spark,
      Curation.urlPlant(frontierDocs).select(col("doc_id"), col("url")),
      0L, state, Files.createTempDirectory("ss_drops2").toString + "/d")
    val locs = plantedLocs.toDF("sm_domain", "url")
    StreamSitemap.processBatch(spark, locs, 0L, state, out)
    val once = spark.read.parquet(out).collect()
      .map(_.toString).sorted.toSeq
    StreamSitemap.processBatch(spark, locs, 0L, state, out)
    val twice = spark.read.parquet(out).collect()
      .map(_.toString).sorted.toSeq
    assert(once == twice, "replay changed the discovery report")
  }

  test("loc probe joins the bucketed URL state with no Exchange") {
    import spark.implicits._
    val state = Files.createTempDirectory("ss_state3").toString
    StreamUrlDedup.processBatch(spark,
      (0L until 200L).map(i => (i, s"https://h$i.example.com/p$i"))
        .toDF("doc_id", "url"),
      0L, state, Files.createTempDirectory("ss_drops3").toString + "/d")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // the processBatch probe shape, stated explicitly: admitted batch
      // locs LEFT JOIN the bucketed state on norm_url
      val admitted = Curation.admissionVerdict(Curation.urlNormalize(
          plantedLocs.toDF("sm_domain", "url")))
        .select(col("sm_domain"), col("url"), col("norm_url"),
          col("allowed"))
      val seen = StreamUrlDedup.urlState(spark, state)
        .select(col("norm_url"), lit(true).as("already_seen"))
      val probe = admitted.join(seen, Seq("norm_url"), "left")
      val plan = probe.queryExecution.executedPlan.toString
      val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
      assert(exchanges == 1, s"expected only the loc-side shuffle:\n$plan")
      assert(plan.contains("SelectedBucketsCount"),
        s"URL state not read as a bucketed scan:\n$plan")
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }
}
