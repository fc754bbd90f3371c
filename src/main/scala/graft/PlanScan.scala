package graft

import graft.core.Sessions

/** One-off: count CartesianProduct / BroadcastNestedLoopJoin nodes per
  * registered query (plan text), to seed the PlanGuardSpec allowlist.
  */
object PlanScan {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = Sessions.local()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
        val cart = "CartesianProduct".r.findAllIn(plan).size
        val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(plan).size
        if (cart > 0 || bnlj > 0)
          println(s"PLANSCAN $name cartesian=$cart bnlj=$bnlj")
      } catch {
        case e: Throwable => println(s"PLANSCAN $name ERROR ${e.getMessage}")
      }
    }
    println("PLANSCAN done")
    spark.stop()
  }
}
