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
      // Runtime bloom-filter join pushdown is the RIGHT call at scale
      // (candidate-id filtering reaches the parquet scan), but when the
      // creation side is a stats-less checkpointed frame Spark sizes
      // the bloom at the 1M-item default — a ~1 MiB filter serialized
      // into every consumer stage's task binary (measured: the 2-4 MiB
      // task-binary warnings on c04/c05 were exactly these). Size it to
      // the candidate cardinality this engine actually produces
      // (hot-bucket caps bound candidates); an undersized bloom only
      // raises FPP — never wrong results. Raise for a real cluster.
      .config("spark.sql.optimizer.runtime.bloomFilter.expectedNumItems",
        "131072")
      .config("spark.sql.optimizer.runtime.bloomFilter.numBits", "1048576")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
