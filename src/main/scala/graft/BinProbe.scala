package graft

import graft.core.Sessions

/** One-off diagnostic: run the named queries with DAGScheduler INFO
  * logging so "Broadcasting large task binary" warnings can be
  * attributed to the stage (and call site) that produced them.
  *
  * Usage: runMain graft.BinProbe <sfDir> <queryName...>
  */
object BinProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.local()
    spark.sparkContext.setLogLevel("INFO")
    args.drop(1).foreach { n =>
      println(s"===== BINPROBE $n =====")
      SparkEntry.queries(n)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
