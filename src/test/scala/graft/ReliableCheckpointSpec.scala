package graft

import java.nio.file.{Files, Paths}

import graft.core.PlanCapture
import graft.ext.Graphs

/** cpGuard's reliable-checkpoint flag: with
  * spark.graft.reliableCheckpoints=true every internal checkpoint goes
  * through RDD `checkpoint()` (files on the configured directory —
  * survives executor loss mid-iteration) instead of `localCheckpoint()`
  * (blocks pinned to executors). Results must be identical either way.
  */
class ReliableCheckpointSpec extends SparkSpec {

  import spark.implicits._

  test("reliable flag: identical iterative results + checkpoint files on disk") {
    val edges = Seq((1L, 2L, 1L), (2L, 3L, 1L), (3L, 4L, 1L), (5L, 1L, 2L))
      .toDF("src", "dst", "w")
    val seeds = Seq(1L).toDF("k")
    val base = Graphs.sssp(edges, seeds, rounds = 3).collect().toSeq
    val dir = Files.createTempDirectory("graft_rcp").toString
    spark.conf.set(PlanCapture.ReliableKey, "true")
    spark.conf.set(PlanCapture.CheckpointDirKey, dir)
    try {
      val got = Graphs.sssp(edges, seeds, rounds = 3).collect().toSeq
      assert(got == base, "reliable checkpointing must not change results")
      val files = Files.walk(Paths.get(dir))
        .filter(p => Files.isRegularFile(p)).count()
      assert(files > 0, s"no RDD checkpoint files landed under $dir")
    } finally {
      spark.conf.unset(PlanCapture.ReliableKey)
      spark.conf.unset(PlanCapture.CheckpointDirKey)
    }
  }

  test("flag off (default): no checkpoint dir needed, local path unchanged") {
    // the default path must not require a checkpoint dir at all
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    import graft.core.PlanCapture.CheckpointOps
    assert(df.cpGuard().collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 2L))
  }

  test("cpGuard skips re-checkpointing an already-materialized input") {
    import org.apache.spark.sql.functions.col
    import graft.core.PlanCapture.CheckpointOps
    val df = Seq((1L, 2L), (3L, 4L)).toDF("a", "b")
    val cp = df.cpGuard()
    // the checkpoint itself, and any attribute-only projection of it,
    // are already materialized: cpGuard must return them UNCHANGED
    // (re-checkpointing re-writes the same table — the double-
    // checkpoint pageRankWarmStart/g11 paid before this rule)
    assert(cp.cpGuard() eq cp)
    val sel = cp.select(col("a").as("x"), col("b"))
    assert(sel.cpGuard() eq sel)
    // anything with real work above the RDD scan still checkpoints
    val agg = cp.groupBy(col("a")).count()
    assert(!(agg.cpGuard() eq agg))
    // and the values flow through identically either way
    assert(sel.cpGuard().collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 3L))
  }
}
