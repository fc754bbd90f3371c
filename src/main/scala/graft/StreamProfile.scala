package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import scala.collection.mutable

/** Dev-only per-BATCH job profiler for the streaming operators:
  * `runMain graft.StreamProfile [sfDir]` seeds each operator's state
  * with a batch-0 call, then profiles a representative warm batch
  * (batch 1) — every Spark job's duration and count for ONE
  * processBatch step, the number a per-batch latency budget actually
  * pays. Mirrors [[JobProfile]] (which profiles registered queries;
  * streaming steps are not in the registry). Measurement tooling only;
  * never on any query path.
  */
object StreamProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .enableHiveSupport()
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val tmp = java.nio.file.Files.createTempDirectory("streamprofile").toString

    def profiled(name: String)(body: => Unit): Unit = {
      val starts = mutable.Map[Int, Long]()
      val rows = mutable.ArrayBuffer[(Int, Long)]()
      val listener = new SparkListener {
        override def onJobStart(js: SparkListenerJobStart): Unit =
          starts.synchronized { starts(js.jobId) = js.time }
        override def onJobEnd(je: SparkListenerJobEnd): Unit =
          starts.synchronized {
            starts.remove(je.jobId).foreach(t0 => rows += ((je.jobId, je.time - t0)))
          }
      }
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      body
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // drain the async bus BEFORE removal
      spark.sparkContext.removeSparkListener(listener)
      println(f"== $name%s: wall $wall%.2f s, ${rows.size}%d jobs ==")
      rows.sortBy(_._1).foreach { case (id, ms) =>
        println(f"  job $id%4d  ${ms / 1000.0}%6.2f s")
      }
      println(f"  (sum of job times ${rows.map(_._2).sum / 1000.0}%.2f s)")
    }

    val embs = graft.core.Tables.load(spark, sfDir, "embeddings")
    val ev = graft.core.Tables.load(spark, sfDir, "events")

    // --- StreamSimilarity: batch 0 seeds the vector/bucket state,
    // batch 1 is the profiled warm probe-and-append step
    graft.streaming.StreamSimilarity.processBatch(spark,
      embs.filter(col("vec_id") % 2 === 0), 0L,
      s"$tmp/sim_state", s"$tmp/sim_out", nPlanes = 8, threshold = 0.9)
    profiled("StreamSimilarity.processBatch(warm)") {
      graft.streaming.StreamSimilarity.processBatch(spark,
        embs.filter(col("vec_id") % 2 === 1), 1L,
        s"$tmp/sim_state", s"$tmp/sim_out", nPlanes = 8, threshold = 0.9)
    }

    // --- StreamSketch (HLL registers): batch 0 seeds, batch 1 profiled
    val users = ev.select(col("event_id"), col("user_id"))
    graft.streaming.StreamSketch.processBatch(spark,
      users.filter(col("event_id") % 2 === 0), 0L, s"$tmp/sk_state", p = 8)
    profiled("StreamSketch.processBatch(warm)") {
      graft.streaming.StreamSketch.processBatch(spark,
        users.filter(col("event_id") % 2 === 1), 1L, s"$tmp/sk_state", p = 8)
    }

    // --- StreamPageRank: transition edges from consecutive events per
    // user (the StreamTransitions shape); batch 0 seeds graph + ranks,
    // batch 1 is the profiled warm-refresh step
    val edges = ev.select((col("event_id") % 97).as("src"),
        (col("event_id") % 89).as("dst"))
      .filter(col("src") =!= col("dst"))
    spark.sql("DROP TABLE IF EXISTS graft_streamprofile_pr")
    graft.streaming.StreamPageRank.processBatch(spark,
      edges.filter(col("src") % 2 === 0), 0L, "graft_streamprofile_pr",
      s"$tmp/pr_state", refreshIters = 2, buckets = 8)
    profiled("StreamPageRank.processBatch(warm)") {
      graft.streaming.StreamPageRank.processBatch(spark,
        edges.filter(col("src") % 2 === 1), 1L, "graft_streamprofile_pr",
        s"$tmp/pr_state", refreshIters = 2, buckets = 8)
    }

    spark.stop()
  }
}
