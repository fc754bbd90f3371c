package graft

import org.scalatest.funsuite.AnyFunSuite

/** Spill-under-pressure evidence — the local proxy for the 100×
  * question: the heaviest composite queries must DEGRADE TO DISK when
  * the memory manager is starved, not OOM and not wedge. The starved
  * session needs static confs, so [[PressureMain]] runs in a child JVM
  * (same classpath, same JDK17 --add-opens) and reports completion +
  * spill metrics as one JSON line; this spec asserts every query
  * finished and that the run genuinely spilled (non-zero memory AND
  * disk spill bytes — proof the pressure was real, not that the data
  * happened to fit).
  */
class PressureSpec extends AnyFunSuite {

  test("heaviest queries complete under a starved memory manager, spilling") {
    // the round-15 bench's top medians plus the crawl composite (the
    // earlier sets d36/d19/g26/d30 stay covered by construction — same
    // machinery families; g29's registered path is the driver shortcut
    // and has no distributed pressure surface)
    val heavy = Seq("w42_pettitt_segments", "g28_betweenness_sampled",
      "s40_nsw_refine_audit", "s24_ivf_pq_recall", "s27_dbscan",
      "c40_crawl_corpus")
    val javaBin = System.getProperty("java.home") + "/bin/java"
    // the forked test JVM already carries Spark's JDK17 module opens —
    // reuse them verbatim in the child
    val opens = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getInputArguments.toArray.map(_.toString)
      .filter(a => a == "--add-opens" || a.endsWith("=ALL-UNNAMED"))
    val cmd = Seq(javaBin, "-Xmx2g") ++ opens ++ Seq(
      "-cp", System.getProperty("java.class.path"),
      "graft.PressureMain", "/root/testdata/sf0.01") ++ heavy
    val pb = new ProcessBuilder(cmd: _*)
    pb.redirectErrorStream(false)
    val proc = pb.start()
    val out = new String(proc.getInputStream.readAllBytes(), "UTF-8")
    val err = new String(proc.getErrorStream.readAllBytes(), "UTF-8")
    val done = proc.waitFor(15, java.util.concurrent.TimeUnit.MINUTES)
    assert(done, "pressure child JVM did not finish in 15 minutes")
    assert(proc.exitValue() == 0,
      s"pressure child exited ${proc.exitValue()}\n${err.takeRight(2000)}")
    val line = out.linesIterator.toSeq.reverse
      .find(_.startsWith("{")).getOrElse(
        fail(s"no JSON line from pressure child; stdout:\n$out"))
    assert(line.contains("\"failed\":[]"),
      s"queries failed under pressure: $line\n${err.takeRight(2000)}")
    def metric(name: String): Long =
      s""""$name":(\\d+)""".r.findFirstMatchIn(line)
        .map(_.group(1).toLong).getOrElse(-1L)
    assert(metric("memory_spilled") > 0L,
      s"no memory spill recorded — pressure not exercised: $line")
    assert(metric("disk_spilled") > 0L,
      s"no disk spill recorded — pressure not exercised: $line")
  }
}
