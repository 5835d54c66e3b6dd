package graft

/** Global anti-pattern gate over the ENTIRE query inventory: a
  * CartesianProduct (the non-broadcast cartesian — both sides big, the
  * plan that cannot survive any scale-up) must never appear in any
  * registered query. Deliberate one-row cross joins plan as
  * BroadcastNestedLoopJoin with a single-row build side and are allowed;
  * a plain CartesianProduct is always a regression. */
class PlanAuditSpec extends GraftSuite {

  test("no registered query plans a non-broadcast CartesianProduct") {
    val offenders = SparkEntry.all.flatMap { q =>
      // physical plan without executing the query's jobs (iterative
      // operators still materialize their loop-internal checkpoints)
      val plan =
        try q.fn(spark, sf).queryExecution.sparkPlan.toString
        catch { case e: Throwable => s"PLANNING-FAILED: $e" }
      if (plan.contains("CartesianProduct") || plan.startsWith("PLANNING-FAILED"))
        Some(q.name -> plan.linesIterator.take(3).mkString(" | "))
      else None
    }
    assert(offenders.isEmpty,
      offenders.map { case (n, p) => s"$n: $p" }.mkString("\n"))
  }
}
