package graft

/** Plan-level regression guard over EVERY registered query: no
  * CartesianProduct anywhere, and BroadcastNestedLoopJoin only where a
  * query deliberately broadcasts a bounded side (or IS the cross-join
  * test) — with exact node counts, so a new accidental nested loop (or
  * a second one sneaking into an allowed query) fails the build. This
  * is the guard that keeps every future operator honest at the plan
  * level: a Catalyst change, a lost equi-condition, or a dropped
  * broadcast hint shows up here before it shows up as a 100x slowdown
  * at scale.
  */
class PlanGuardSpec extends SparkSpec {
  // Allowance tables + audit logic live in graft.core.PlanAudit so the
  // PlanScan main can run the SAME audit at the bench sf (sf0.1) —
  // this spec is the sf0.001 instance that runs on every sbt test.

  test("no unplanned cartesian or nested-loop join in any registered query") {
    val failures = SparkEntry.queries.keys.toSeq.sorted.flatMap { name =>
      graft.core.PlanAudit.auditQuery(spark, name,
        "/root/testdata/sf0.001").failures
    }
    assert(failures.isEmpty,
      s"plan regressions:\n${failures.mkString("\n")}")
  }

  test("w14 plans the salt-explode shape (shuffle-hash join on __salt)") {
    val qe = SparkEntry.queries("w14_skew_salted_join")(
      spark, "/root/testdata/sf0.001").queryExecution
    val plan = qe.executedPlan.toString
    assert(plan.contains("Generate explode"),
      s"expected the dim side's salt-replication Generate:\n$plan")
    assert(plan.contains("__salt"),
      s"expected the join keys to carry __salt:\n$plan")
    assert(plan.contains("ShuffledHashJoin"),
      s"expected a shuffle-hash join (broadcast would defeat the salting):\n$plan")
  }
}
