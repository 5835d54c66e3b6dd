package graft.operators

import graft.{NamedQuery, Tables}
import graft.functions.Exact._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — the canonical time-series operator Spark
  * lacks natively: for every left row, attach the latest right row of the
  * same key with rightTime <= leftTime. Composed from built-ins per the
  * custom-operator preference order (SURVEY-brief option (a)): tag and
  * UNION both sides, ONE window over (key, time) carries the most recent
  * right values forward, then keep left rows. Cost = one shuffle on the
  * key and a linear pass — no join node at all (asserted in AsOfSpec),
  * versus the O(n·m) range join a naive formulation produces. This is the
  * shape that survives 100 TB: both inputs stream through a single
  * exchange, skew bounded by per-key cardinality like any window.
  *
  * Differentially tested against DuckDB's native ASOF JOIN (q_asof_join).
  */
object AsOf {

  /** @param valueCols right-side columns to attach (names must not
    *                  collide with left columns; right rows should be
    *                  unique per (key, rightTime) — pre-aggregate if not)
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
               leftTime: String, rightTime: String,
               valueCols: Seq[String]): DataFrame =
    asofImpl(left, right, key, leftTime, rightTime, valueCols,
      forward = false)

  /** Shared union+window carry for both directions: backward orders time
    * ascending (carry = latest at-or-before), forward descending (carry =
    * earliest at-or-after). Right rows sort BEFORE left rows at equal
    * __t in either direction, giving inclusive <= / >= semantics. */
  private def asofImpl(left: DataFrame, right: DataFrame, key: String,
                       leftTime: String, rightTime: String,
                       valueCols: Seq[String], forward: Boolean): DataFrame = {
    val l = left
      .withColumn("__t", col(leftTime))
      .withColumn("__is_left", lit(1))
    val r = right.select(
      (col(key) +: col(rightTime).as("__t") +: lit(0).as("__is_left") +:
        valueCols.map(col)): _*)
    val timeOrder = if (forward) col("__t").desc else col("__t").asc
    val w = Window.partitionBy(col(key)).orderBy(timeOrder, col("__is_left"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val attached = valueCols.foldLeft(l.unionByName(r, allowMissingColumns = true)) {
      case (df, v) => df.withColumn(v, last(col(v), ignoreNulls = true).over(w))
    }
    attached.filter(col("__is_left") === 1).drop("__t", "__is_left")
  }

  // ------------------------------------------------------------- q_asof_join
  /** Feature-engineering shape: attach to every event the exact total of
    * its user's latest COMPLETED hour (hour windows become available at
    * their end time — a leakage-safe point-in-time feature). */
  private def asofQuery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = Tables.events(s, dir)
    val hourly = e
      .groupBy($"user_id", window($"ts", "1 hour")("end").as("avail_ts"))
      .agg(dsum($"value").as("prev_hour_total"))
    asofJoin(
      e.select($"event_id", $"user_id", $"ts"),
      hourly, "user_id", "ts", "avail_ts", Seq("prev_hour_total"))
      .select($"event_id", $"user_id", $"prev_hour_total")
      .orderBy($"event_id")
  }

  private val asofQuerySql =
    s"""WITH h AS (
       |  SELECT user_id,
       |    time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS avail_ts,
       |    ${sqlDsum("value")} AS prev_hour_total
       |  FROM events GROUP BY 1, 2)
       |SELECT e.event_id, e.user_id, h.prev_hour_total
       |FROM events e ASOF LEFT JOIN h
       |  ON e.user_id = h.user_id AND e.ts >= h.avail_ts
       |ORDER BY event_id""".stripMargin

  /** FORWARD as-of: attach the EARLIEST right row at-or-after the left
    * time (the "next quote / next restock" direction) — the backward
    * carry run over a descending time order. */
  def asofJoinForward(left: DataFrame, right: DataFrame, key: String,
                      leftTime: String, rightTime: String,
                      valueCols: Seq[String]): DataFrame =
    asofImpl(left, right, key, leftTime, rightTime, valueCols,
      forward = true)

  // ----------------------------------------------------- q_asof_join_forward
  /** The forward direction: for every event, the total of its user's
    * NEXT hour window starting at-or-after the event — the
    * "what happens next" label-building shape, the deliberate mirror of
    * the leakage-safe backward feature query above. */
  private def asofForwardQuery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = Tables.events(s, dir)
    val hourly = e
      .groupBy($"user_id", window($"ts", "1 hour")("start").as("avail_ts"))
      .agg(dsum($"value").as("next_hour_total"))
    asofJoinForward(
      e.select($"event_id", $"user_id", $"ts"),
      hourly, "user_id", "ts", "avail_ts", Seq("next_hour_total"))
      .select($"event_id", $"user_id", $"next_hour_total")
      .orderBy($"event_id")
  }

  private val asofForwardSql =
    s"""WITH h AS (
       |  SELECT user_id,
       |    time_bucket(INTERVAL '1 hour', ts) AS avail_ts,
       |    ${sqlDsum("value")} AS next_hour_total
       |  FROM events GROUP BY 1, 2)
       |SELECT e.event_id, e.user_id,
       |  (SELECT h.next_hour_total FROM h
       |   WHERE h.user_id = e.user_id AND h.avail_ts >= e.ts
       |   ORDER BY h.avail_ts ASC LIMIT 1) AS next_hour_total
       |FROM events e ORDER BY event_id""".stripMargin

  val all: Seq[NamedQuery] = Seq(
    NamedQuery("q_asof_join", asofQuery, Some(asofQuerySql), bench = true),
    NamedQuery("q_asof_join_forward", asofForwardQuery, Some(asofForwardSql),
      bench = true))
}
