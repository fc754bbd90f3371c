package graft.core

/** Concurrent evaluation of INDEPENDENT eager subplans of one query.
  *
  * Many audit-shaped operators materialize several independent
  * intermediates (exact baselines, per-variant candidate sets, forward/
  * backward BFS states) through eager `cpGuard()` checkpoints. Built
  * sequentially, each materialization is a full Spark job whose tail
  * leaves the cluster idle — and the NEXT branch's jobs cannot start
  * until the current one returns. Spark's scheduler happily runs
  * several jobs at once inside one application (actions are only
  * sequential because driver code calls them sequentially); submitting
  * independent branches from separate driver threads lets the next
  * branch's tasks back-fill executors freed by the current branch's
  * stragglers. This is the standard overlap-independent-jobs pattern
  * (Spark docs, job scheduling within an application) and it holds at
  * any scale: in local mode it collapses serial job latency; on a
  * cluster it fills the straggler tail. Default FIFO scheduling is
  * exactly the back-fill behavior wanted — no config change.
  *
  * Threads are created per call (never pooled): Spark's active-session
  * and job-group state live in inheritable thread-locals, so a cached
  * pool created under one session would leak it into later ones (a
  * real hazard across test suites). Branch count here is always a
  * small constant (2-4), so thread creation cost is nil against the
  * jobs each branch runs. Results are position-stable and exceptions
  * propagate loudly — the first failing branch's ORIGINAL exception is
  * rethrown on the caller thread after every branch has settled (no
  * half-built state left running).
  */
object Par {

  /** Evaluate two independent eager branches concurrently; `fb` runs
    * on the caller thread. Values (and exceptions) are exactly those
    * of sequential evaluation — only the JOB SCHEDULING overlaps, so
    * any query rewritten through this helper computes byte-identical
    * results.
    */
  def eval2[A, B](fa: => A, fb: => B): (A, B) = {
    val boxed = evalAll(Seq(() => fa, () => fb))
    (boxed(0).asInstanceOf[A], boxed(1).asInstanceOf[B])
  }

  /** Evaluate three independent eager branches concurrently (the
    * two-out-of-three generalization of [[eval2]]; `fc` runs on the
    * caller thread).
    */
  def eval3[A, B, C](fa: => A, fb: => B, fc: => C): (A, B, C) = {
    val boxed = evalAll(Seq(() => fa, () => fb, () => fc))
    (boxed(0).asInstanceOf[A], boxed(1).asInstanceOf[B],
      boxed(2).asInstanceOf[C])
  }

  /** Evaluate every thunk concurrently — one fresh daemon thread per
    * thunk except the LAST, which runs on the caller thread (the
    * caller participates instead of idling). Results keep input order;
    * after all branches settle, the first failure (input order) is
    * rethrown.
    */
  def evalAll(thunks: Seq[() => Any]): IndexedSeq[Any] = {
    require(thunks.nonEmpty, "Par.evalAll needs at least one branch")
    val results = new Array[Either[Throwable, Any]](thunks.size)
    def run(i: Int): Unit =
      results(i) =
        try Right(thunks(i)())
        catch { case e: Throwable => Left(e) }
    val workers = thunks.indices.init.map { i =>
      val t = new Thread(() => run(i), s"graft-par-$i")
      t.setDaemon(true)
      t.start()
      t
    }
    run(thunks.size - 1)
    workers.foreach(_.join())
    results.collectFirst { case Left(e) => e }.foreach(e => throw e)
    results.map(_.toOption.get).toIndexedSeq
  }
}
