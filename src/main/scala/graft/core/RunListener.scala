package graft.core

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Job-outcome notification hook — the engine-side equivalent of the
  * reference's exception_handler decorator + Telegram status message
  * around every Lambda (utils.py:17-63, 109-125). The transport is
  * pluggable (the reference POSTs to a bot API; default here is a log
  * line); the pipeline code stays notification-free either way.
  */
class RunListener(notify: String => Unit = m => Console.err.println(s"[notify] $m"))
    extends SparkListener {

  val events: mutable.Buffer[String] = mutable.Buffer.empty

  private def record(m: String): Unit = synchronized { events += m; notify(m) }

  override def onJobStart(js: SparkListenerJobStart): Unit =
    record(s"job ${js.jobId} started (${js.stageInfos.size} stages)")

  override def onJobEnd(je: SparkListenerJobEnd): Unit =
    record(s"job ${je.jobId} finished: ${je.jobResult}")
}

object RunListener {
  /** Attach a listener to the session; returns it for inspection. */
  def attach(spark: SparkSession, notify: String => Unit): RunListener = {
    val l = new RunListener(notify)
    spark.sparkContext.addSparkListener(l)
    l
  }
}
