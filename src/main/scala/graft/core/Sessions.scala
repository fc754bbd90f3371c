package graft.core

import org.apache.spark.sql.SparkSession

/** SparkSession factory. Local defaults mirror the driver harness
  * (local[32], 32 shuffle partitions, UTC, AQE on); on a real cluster
  * the same builder settings apply minus master.
  */
object Sessions {
  def local(cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
