package graft

import graft.operators.Linkage
import org.apache.spark.sql.functions._

/** Blocked fuzzy matching: kernel semantics on hand-built tables and the
  * honest-failure properties of the customer linkage query. */
class LinkageSpec extends GraftSuite {
  import spark.implicits._

  private def dirty(rows: (Long, String, String)*) =
    rows.toDF("dirty_id", "dirty_name", "block")
  private def clean(rows: (Long, String, String)*) =
    rows.toDF("id", "name", "block")

  test("kernel: best match wins on distance, ties break on reference id") {
    val d = dirty((1L, "smith", "b1"))
    val c = clean((10L, "smyth", "b1"), (11L, "smith", "b1"), (12L, "smith", "b1"))
    val out = Linkage.fuzzyJoin(d, c, maxDist = 2).collect()
    assert(out.length == 1)
    val r = out.head
    // exact match at distance 0 beats smyth at 1; id 11 beats id 12
    assert(r.getLong(2) == 11L && r.getInt(4) == 0, s"got $r")
  }

  test("kernel: no candidate within budget -> NULL match, row preserved") {
    val d = dirty((1L, "abcdef", "b1"), (2L, "zzzzzz", "nowhere"))
    val c = clean((10L, "uvwxyz", "b1"))
    val out = Linkage.fuzzyJoin(d, c, maxDist = 2)
      .orderBy($"dirty_id").collect()
    assert(out.length == 2, "unmatched dirty rows must survive")
    assert(out.forall(_.isNullAt(2)), s"both rows exceed budget/block: ${out.toSeq}")
  }

  test("kernel: verify never runs across blocks") {
    // identical name, wrong block: must NOT match
    val d = dirty((1L, "same", "b1"))
    val c = clean((10L, "same", "b2"))
    val out = Linkage.fuzzyJoin(d, c, maxDist = 2).collect()
    assert(out.head.isNullAt(2), "blocking must gate candidate generation")
  }

  test("kernel: loose maxDist refused") {
    intercept[IllegalArgumentException] {
      Linkage.fuzzyJoin(dirty(), clean(), maxDist = 99)
    }
  }

  test("q_sorted_neighborhood: every planted twin is found within the window") {
    val out = SparkEntry.queries("q_sorted_neighborhood")(spark, sf).collect()
    val planted = Tables.customer(spark, sf)
      .filter(col("c_custkey") % 10 === 0).count()
    assert(out.length == planted, "one verdict per planted twin")
    out.foreach(r => assert(r.getBoolean(1),
      s"a tail corruption displaces at most SnmWindow ranks, must be found: $r"))
  }

  test("q_fuzzy_join: tail-corrupted rows are NULL, all others match themselves") {
    val out = SparkEntry.queries("q_fuzzy_join")(spark, sf).collect()
    out.foreach { r =>
      val id = r.getLong(0)
      if (id % 7 == 0) assert(r.isNullAt(2),
        s"block-key corruption must surface as unmatched: $r")
      else {
        assert(r.getLong(2) == id, s"row must re-match its own customer: $r")
        val want = if (id % 5 == 0) 2 else 1
        assert(r.getInt(4) == want, s"distance must equal planted noise: $r")
      }
    }
    assert(out.exists(_.getLong(0) % 7 == 0) && out.exists(_.getLong(0) % 5 == 0),
      "fixture must exercise both corruption modes")
  }
}
