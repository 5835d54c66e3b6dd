package graft

import org.apache.spark.sql.functions._

/** Pins the Bench harness's session-hygiene contract: the per-query
  * snapshot-diff of `sc.getPersistentRDDs` + explicit unpersist releases
  * every localCheckpoint block a query created — deterministically, not
  * via the GC-driven ContextCleaner (which round 5 proved cannot keep up
  * across a 219-query session: the driver charged six late-session
  * queries 219.1s that re-ran in 17.3s isolated). */
class BenchHygieneSpec extends GraftSuite {
  import spark.implicits._

  test("snapshot-diff unpersist releases exactly a query's checkpoint blocks") {
    val sc = spark.sparkContext
    // pre-existing persisted state must survive the cleanup untouched
    val keeper = Seq(1, 2, 3).toDF("x").localCheckpoint(true)
    val before = sc.getPersistentRDDs.keySet
    assert(before.nonEmpty, "keeper checkpoint must register as persisted")

    // a Bench-shaped query: iterative operator leaving checkpoints
    // behind (resolveClusters block-cuts its edges/labels; kcorePeel
    // moved to columnar bulk cuts in round 12 and no longer qualifies)
    val pairs = Seq((1L, 2L), (2L, 3L), (4L, 5L), (5L, 6L))
      .toDF("doc_a", "doc_b")
    val core = operators.Dedup.resolveClusters(pairs)
    core.queryExecution.toRdd.count()
    val after = sc.getPersistentRDDs
    val delta = after.keySet -- before
    assert(delta.nonEmpty, "the peel must have left checkpoint blocks behind")

    // the Bench cleanup step
    after.foreach { case (id, rdd) =>
      if (!before.contains(id)) rdd.unpersist(blocking = true)
    }
    val remaining = sc.getPersistentRDDs.keySet
    assert((remaining & delta).isEmpty,
      s"query checkpoints must be gone after unpersist: ${remaining & delta}")
    assert(before.subsetOf(remaining),
      "pre-existing persisted RDDs must be untouched by the cleanup")
    keeper.unpersist(blocking = true)
  }
}
