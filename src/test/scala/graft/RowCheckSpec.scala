package graft

/** Smoke guard: every named query must produce rows at the smallest SF.
  * Catches hardcoded-literal assumptions (a region name, a source id, a
  * date window) that happen to hold at the driver's sf0.01 gate but not
  * at other scales — and vice versa. */
class RowCheckSpec extends GraftSuite {
  /** Queries whose CORRECT answer is the empty set (disagreement /
    * symmetric-difference gates) — for these the smoke check asserts the
    * query runs, and emptiness is itself the pass condition. (Currently
    * none: q_simhash_recall became a one-row count summary in round 4.) */
  private val emptyByDesign = Set.empty[String]

  /** Queries whose row count is DENSITY-driven, not scale-driven: the
    * radius self-join's pair count grows ~quadratically with points in
    * the fixed world square (4 pairs at sf0.01, 368 at sf0.1 — both
    * oracle-green), so the ~150-point sf0.001 corpus finding ZERO pairs
    * within R is the correct answer, not a latent literal assumption.
    * The smoke check still requires the query to RUN. */
  private val sparseAtSmoke = Set("q_spatial_join")

  test("every named query returns rows at sf0.001") {
    val bad = SparkEntry.all.flatMap { q =>
      val n = try q.fn(spark, sf).count() catch { case _: Throwable => -1L }
      val ok = if (emptyByDesign(q.name)) n == 0
        else if (sparseAtSmoke(q.name)) n >= 0
        else n > 0
      if (ok) None else Some(q.name -> n)
    }
    assert(bad.isEmpty, s"empty (0) or failing (-1) at sf0.001: $bad")
  }
}
