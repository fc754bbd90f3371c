package graft

import org.apache.spark.sql.SparkSession

/** Child-JVM main for [[PressureSpec]]: runs the given queries under a
  * DELIBERATELY starved memory manager and reports whether they
  * completed and how much they spilled.
  *
  * The starvation levers are static SparkContext confs (hence the
  * separate JVM — the shared test session cannot change them):
  * `spark.testing.memory` caps what the UnifiedMemoryManager believes
  * the heap is (512 MB) with `spark.memory.fraction` 0.2 — an
  * execution pool of ~40 MB shared by 4 cores — and
  * `spark.shuffle.spill.numElementsForceSpillThreshold` forces every
  * sorter/aggregator past 4096 rows to spill, the same code path a
  * 100× data volume exercises under a real per-executor budget. High
  * `spark.sql.shuffle.partitions` (64) per the scale contract.
  *
  * Output: ONE JSON line {failed:[…], memory_spilled:N, disk_spilled:N}.
  */
object PressureMain {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args.drop(1).toSeq
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.testing.memory", (512L * 1024 * 1024).toString)
      .config("spark.memory.fraction", "0.2")
      .config("spark.shuffle.spill.numElementsForceSpillThreshold", "4096")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val spilledMem = new java.util.concurrent.atomic.AtomicLong
    val spilledDisk = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = te.taskMetrics
          if (m != null) {
            spilledMem.addAndGet(m.memoryBytesSpilled)
            spilledDisk.addAndGet(m.diskBytesSpilled)
            ()
          }
        }
      })
    val failed = names.filter { n =>
      try {
        SparkEntry.queries(n)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        false
      } catch { case e: Throwable =>
        System.err.println(s"[pressure] $n failed: ${e.getMessage}")
        true
      }
    }
    val line = s"""{"failed":[${failed.map("\"" + _ + "\"").mkString(",")}],""" +
      s""""memory_spilled":${spilledMem.get},"disk_spilled":${spilledDisk.get}}"""
    spark.stop()
    println(line)
  }
}
