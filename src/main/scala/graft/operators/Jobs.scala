package graft.operators

/**
 * Driver-side fan-out for INDEPENDENT Spark actions — the component writes
 * of one artifact. Each thunk runs on its own thread; all are awaited, and
 * the first failure is rethrown after every job has settled (no orphan
 * write racing a caller's `finally unpersist`).
 *
 * Why this exists: a bundle/index save is several SKETCH-SIZED component
 * writes over one shared persisted input. Run serially, each pays full
 * job-scheduling + output-commit latency — the dominant term of a write
 * whose data is KBs — so an artifact save costs jobs × latency of wall
 * time. Spark schedules concurrent jobs from separate threads against the
 * same session safely (each action carries its own execution id; writes
 * target disjoint directories), so overlapping them collapses that serial
 * latency without changing what lands on disk. At cluster scale the same
 * holds: the components are bounded by the sketch shape, not the corpus,
 * and share the one materialized cache of the slice.
 *
 * Contract for callers: fan out ONLY order-free writes. A component with a
 * WRITE-ORDER contract (a stats row doubling as the segment's commit
 * record, e.g. [[TextAnalysis]] lexical segments) stays OUTSIDE the
 * fan-out, written after the fan-out returns. Inputs shared by several
 * thunks must be persisted AND materialized before the call — concurrent
 * first-actions on an unmaterialized cache would compute it repeatedly.
 *
 * NO-CONCURRENT-SIBLINGS-UNDER-A-CONF-WINDOW invariant: a session-conf
 * mutation window ([[confWindow]] — what `Gates.startSized` and
 * `Graph.withNodeLoopConf` open to apply a volume-derived
 * shuffle-partition count) must NEVER overlap a fan-out from another
 * thread: a sibling action PLANNING a query inside the window would
 * silently compile against the temporary conf (e.g. a corpus-sized
 * shuffle at 1 partition). Both directions are checked at runtime; a
 * violation is reported loudly (stderr) and, under
 * `-Dgraft.strictConfScope=1` / `SPARK_GRAFT_STRICT_CONF_SCOPE=1`, thrown
 * — so the race can never be introduced silently. (Default is warn, not
 * throw: the shared test session runs suites in parallel, where
 * independent short windows may brush against each other benignly —
 * every affected result in this repo is partition-count independent by
 * construction.)
 */
private[graft] object Jobs {
  private val activeFanOuts = new java.util.concurrent.atomic.AtomicInteger(0)
  @volatile private var confWindowOwner: Thread = _

  private def strictConfScope: Boolean =
    sys.props.get("graft.strictConfScope").contains("1") ||
      sys.env.get("SPARK_GRAFT_STRICT_CONF_SCOPE").contains("1")

  private def scopeViolation(msg: String): Unit =
    if (strictConfScope) throw new IllegalStateException(msg)
    else System.err.println(s"[graft] conf-scope WARNING: $msg")

  /** Open a session-conf mutation window (set conf → body → restore) and
    * enforce the invariant above: no live fan-out from another thread, no
    * overlapping window from another thread. Same-thread nesting and
    * same-thread fan-outs inside the window are deliberate composition
    * (the owner chose the conf its own children run under) and pass. */
  private[graft] def confWindow[A](label: String)(body: => A): A = {
    val me = Thread.currentThread()
    val owner = confWindowOwner
    if (owner != null && (owner ne me))
      scopeViolation(s"$label: opening a session-conf window while another " +
        s"is open on thread '${owner.getName}' — the two restores would " +
        "race and one window's value would leak into the other's plans")
    val live = activeFanOuts.get()
    if (live > 0)
      scopeViolation(s"$label: opening a session-conf window while $live " +
        "Jobs.concurrently fan-out(s) are live — a sibling action planning " +
        "now would silently inherit the temporary conf")
    val prev = confWindowOwner
    confWindowOwner = me
    try body finally confWindowOwner = prev
  }

  def concurrently(jobs: (() => Unit)*): Unit = {
    require(jobs.nonEmpty, "Jobs.concurrently: no jobs")
    if (jobs.length == 1) { jobs.head(); return }
    val owner = confWindowOwner
    if (owner != null && (owner ne Thread.currentThread()))
      scopeViolation("Jobs.concurrently: fanning out while a session-conf " +
        s"window is open on thread '${owner.getName}' — the siblings would " +
        "plan under that window's temporary conf")
    activeFanOuts.incrementAndGet()
    try concurrentlyImpl(jobs) finally activeFanOuts.decrementAndGet()
  }

  private def concurrentlyImpl(jobs: Seq[() => Unit]): Unit = {
    val pool = java.util.concurrent.Executors.newFixedThreadPool(jobs.length)
    try {
      val futs = jobs.map { j =>
        pool.submit(new java.util.concurrent.Callable[Unit] {
          override def call(): Unit = j()
        })
      }
      // await ALL before surfacing the first failure: a caller's finally
      // block (unpersist, staging cleanup) must not run under a still-live
      // sibling write. That includes a driver-thread INTERRUPT while
      // blocked in get(): remember it, keep settling the remaining
      // futures, and restore the interrupt status afterwards — returning
      // early would be exactly the orphan-write race this contract exists
      // to prevent
      var interrupted = false
      val errs = futs.flatMap { f =>
        var res: Option[Throwable] = None
        var settled = false
        while (!settled) {
          try { f.get(); settled = true }
          catch {
            case e: java.util.concurrent.ExecutionException =>
              res = Some(Option(e.getCause).getOrElse(e): Throwable)
              settled = true
            case _: InterruptedException => interrupted = true
          }
        }
        res
      }
      if (interrupted) Thread.currentThread().interrupt()
      // surface the first failure with the siblings' causes attached —
      // a multi-component write failure must not hide its root cause
      errs.headOption.foreach { first =>
        errs.drop(1).foreach(first.addSuppressed)
        throw first
      }
    } finally pool.shutdown()
  }
}
