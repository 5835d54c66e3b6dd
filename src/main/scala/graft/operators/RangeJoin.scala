package graft.operators

import graft.{NamedQuery, Tables}
import graft.functions.Exact._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Range (point-in-interval) join. Spark plans a raw theta join
  * (`x >= lo AND x < hi`) as BroadcastNestedLoop/cartesian — O(n·m), the
  * same scale-killer the r1 verdict flagged for all-pairs similarity. The
  * scale formulation buckets the domain: intervals explode into the
  * fixed-width buckets they overlap, points map to exactly one bucket,
  * and the pair space collapses to an EQUI-join on bucket id with a cheap
  * residual filter after the hash join. Cost is linear in points +
  * (interval length / bucketWidth), and the join shuffles/broadcasts on a
  * long key instead of comparing every pair.
  */
object RangeJoin {

  /** Join each point row to every interval row containing it
    * (lo <= x < hi). `bucketWidth` trades explode factor for bucket
    * selectivity — pick ~ the median interval length. Non-negative
    * domains only (floor-based bucketing). */
  def pointInInterval(points: DataFrame, x: String, intervals: DataFrame,
                      lo: String, hi: String, bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0 && !bucketWidth.isNaN,
      s"bucketWidth must be a positive finite number, got $bucketWidth")
    val pb = points.withColumn("__b", floor(col(x) / bucketWidth).cast("long"))
    val ib = intervals.withColumn("__b",
      explode(sequence(
        floor(col(lo) / bucketWidth).cast("long"),
        floor(col(hi) / bucketWidth).cast("long"))))
    pb.join(ib, Seq("__b"))
      .filter(col(x) >= col(lo) && col(x) < col(hi))
      .drop("__b")
  }

  // ------------------------------------------------------------ q_range_join
  /** Price-band classification of lineitems — intervals overlap (the
    * catch-all band) so the multi-match join semantics are exercised, not
    * just a partitioning. */
  private def bands(s: SparkSession): DataFrame = {
    import s.implicits._
    Seq(
      ("low", 0.0, 20000.0),
      ("mid", 20000.0, 45000.0),
      ("high", 45000.0, 80000.0),
      ("top", 80000.0, 200000.0),
      ("all", 0.0, 200000.0))
      .toDF("band", "lo", "hi")
  }

  private def rangeJoinQuery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val points = Tables.lineitem(s, dir)
      .select($"l_orderkey", $"l_linenumber", $"l_extendedprice")
    pointInInterval(points, "l_extendedprice", bands(s), "lo", "hi",
      bucketWidth = 10000.0)
      .groupBy($"band")
      .agg(count(lit(1)).as("n_items"), dsum($"l_extendedprice").as("total_price"))
      .orderBy($"band")
  }

  private val rangeJoinSql =
    s"""WITH bands(band, lo, hi) AS (VALUES
       |  ('low', 0.0, 20000.0), ('mid', 20000.0, 45000.0),
       |  ('high', 45000.0, 80000.0), ('top', 80000.0, 200000.0),
       |  ('all', 0.0, 200000.0))
       |SELECT b.band, COUNT(*) AS n_items,
       |  ${sqlDsum("l.l_extendedprice")} AS total_price
       |FROM lineitem l JOIN bands b
       |  ON l.l_extendedprice >= b.lo AND l.l_extendedprice < b.hi
       |GROUP BY b.band ORDER BY band""".stripMargin

  val all: Seq[NamedQuery] = Seq(
    NamedQuery("q_range_join", rangeJoinQuery, Some(rangeJoinSql), bench = true))
}
