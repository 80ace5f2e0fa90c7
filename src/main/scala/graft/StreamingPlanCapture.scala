package graft

/** Audit-time capture of streaming micro-batch physical plans.
  *
  * [[PlanAudit]] inspects `queryExecution.executedPlan` of whatever a query
  * function returns — but the s* queries return a BATCH view of a drained
  * stream (a memory-sink table or a stats rollup), so the plans that
  * actually did the work (the per-micro-batch IncrementalExecutions, the
  * foreachBatch probe/write actions) were invisible to it: the audit
  * printed empty scanCols for all seven streaming queries.
  *
  * The streaming entry points record their last-executed micro-batch plan
  * here when (and only when) [[enabled]] — the audit flips it on, resets
  * per query, and folds everything recorded during the run into the same
  * flag/scan checks as batch plans. Production/bench/correctness runs never
  * pay the plan-string render: `plan` is by-name and unevaluated when
  * disabled.
  */
object StreamingPlanCapture {

  @volatile var enabled = false

  private val plans =
    new java.util.concurrent.ConcurrentLinkedQueue[(String, String)]()

  /** Record a plan under a query tag (e.g. "s02"). No-op unless enabled. */
  def record(name: String, plan: => String): Unit =
    if (enabled) plans.add((name, plan))

  /** Everything recorded since the last [[reset]], in arrival order. */
  def all: Seq[(String, String)] = {
    val out = Vector.newBuilder[(String, String)]
    plans.forEach(p => out += p)
    out.result()
  }

  def reset(): Unit = plans.clear()
}
