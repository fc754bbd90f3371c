package graft
import org.apache.spark.sql.SparkSession
/** Dev-only plan inspector: prints join-related physical-plan lines for
  * one registered query (`runMain graft.PlanPeek <name> <sfDir>`).
  */
object PlanPeek {
  def main(args: Array[String]): Unit = {
    val (name, sfDir) = (args(0), args(1))
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.queries(name)(spark, sfDir)
    println(df.queryExecution.executedPlan.toString.split('\n')
      .filter(l => l.contains("Join") || l.contains("NestedLoop"))
      .mkString("\n"))
  }
}
