package graft

/** Smoke guard: every named query must produce rows at the smallest SF.
  * Catches hardcoded-literal assumptions (a region name, a source id, a
  * date window) that happen to hold at the driver's sf0.01 gate but not
  * at other scales — and vice versa. */
class RowCheckSpec extends GraftSuite {
  test("every named query returns rows at sf0.001") {
    val empty = SparkEntry.all.flatMap { q =>
      val n = try q.fn(spark, sf).count() catch { case _: Throwable => -1L }
      if (n <= 0) Some(q.name -> n) else None
    }
    assert(empty.isEmpty, s"empty (0) or failing (-1) at sf0.001: $empty")
  }
}
