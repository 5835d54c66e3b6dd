package graft.operators

import graft.{NamedQuery, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Journey / sequence analytics — the event-stream ops between raw
  * clickstreams and marketing/product questions: position-based
  * multi-touch attribution (who gets credit for a conversion),
  * frequent path mining (which 3-step journeys dominate), and audience
  * overlap (how much two segments share). All exact-integer: credit
  * splits use largest-remainder so every conversion's credit sums to
  * exactly 1e6 ppm, supports and Jaccards are integer DIV ppm. The
  * streaming last-touch attributor (`streaming/Attribute.scala`) and
  * the Markov transition matrix (q_markov) cover the adjacent shapes;
  * these three are their batch multi-touch / higher-order / set-overlap
  * complements. */
object Journey {

  // ------------------------------------------------------- q_multi_touch
  /** U-shaped (position-based) multi-touch attribution: each converting
    * user's credit splits over the non-purchase touches STRICTLY before
    * their FIRST purchase — 40% to the first touch, 40% to the last,
    * the middle 20% split by LARGEST REMAINDER over the interior
    * touches (earlier positions take the odd ppm), so every user's
    * credit sums to exactly 1,000,000 ppm (1 touch → 100%, 2 → 50/50).
    * Naive per-touch floor division leaks up to n−3 ppm per conversion —
    * at 1e9 conversions that's real budget vanishing from the report.
    *
    * Scale shape: the purchase boundary is one user-partitioned window
    * over the purchase slice; touches take one user-keyed join + one
    * user-partitioned window (count + position share the partition);
    * final rollup is a type-keyed aggregation with map-side partials. */
  private def multiTouch(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = Tables.events(s, dir)
      .select($"user_id", $"event_id", unix_micros($"ts").as("us"),
        $"event_type")
    val wp = Window.partitionBy($"user_id").orderBy($"us", $"event_id")
    val firstPurchase = e.filter($"event_type" === "purchase")
      .withColumn("rn", row_number().over(wp))
      .filter($"rn" === 1)
      .select($"user_id", $"us".as("p_us"), $"event_id".as("p_eid"))
    val touches = e.filter($"event_type" =!= "purchase")
      .join(firstPurchase, Seq("user_id"))
      .filter($"us" < $"p_us" ||
        ($"us" === $"p_us" && $"event_id" < $"p_eid"))
    val wt = Window.partitionBy($"user_id")
    val wo = Window.partitionBy($"user_id").orderBy($"us", $"event_id")
    val credited = touches
      .select($"user_id", $"event_type",
        count(lit(1)).over(wt).as("n"),
        row_number().over(wo).cast("long").as("pos"))
      .select($"event_type",
        when($"n" === 1, 1000000L)
          .when($"n" === 2, 500000L)
          .when($"pos" === 1 || $"pos" === $"n", 400000L)
          .otherwise(expr("200000 DIV (n - 2)") +
            when($"pos" - 1 <= expr("200000 % (n - 2)"), 1L).otherwise(0L))
          .as("credit_ppm"))
    credited.groupBy($"event_type")
      .agg(count(lit(1)).as("n_touches"),
        sum($"credit_ppm").as("credit_ppm_total"))
      .orderBy($"event_type")
  }

  private val multiTouchSql =
    """WITH e AS (
      |  SELECT user_id, event_id, epoch_us(ts) AS us, event_type
      |  FROM events),
      |fp AS (
      |  SELECT user_id, us AS p_us, event_id AS p_eid FROM (
      |    SELECT user_id, us, event_id,
      |      ROW_NUMBER() OVER (PARTITION BY user_id
      |                         ORDER BY us, event_id) AS rn
      |    FROM e WHERE event_type = 'purchase')
      |  WHERE rn = 1),
      |touches AS (
      |  SELECT e.user_id, e.event_type,
      |    COUNT(*) OVER (PARTITION BY e.user_id) AS n,
      |    ROW_NUMBER() OVER (PARTITION BY e.user_id
      |                       ORDER BY e.us, e.event_id) AS pos
      |  FROM e JOIN fp ON e.user_id = fp.user_id
      |  WHERE e.event_type != 'purchase'
      |    AND (e.us < fp.p_us
      |      OR (e.us = fp.p_us AND e.event_id < fp.p_eid))),
      |credited AS (
      |  SELECT event_type,
      |    CASE WHEN n = 1 THEN 1000000
      |         WHEN n = 2 THEN 500000
      |         WHEN pos = 1 OR pos = n THEN 400000
      |         ELSE 200000 // (n - 2)
      |           + (CASE WHEN pos - 1 <= 200000 % (n - 2)
      |              THEN 1 ELSE 0 END) END AS credit_ppm
      |  FROM touches)
      |SELECT event_type, COUNT(*) AS n_touches,
      |  CAST(SUM(credit_ppm) AS BIGINT) AS credit_ppm_total
      |FROM credited GROUP BY event_type ORDER BY event_type""".stripMargin

  // ------------------------------------------------------- q_path_ngrams
  // audited-global-window(q_path_ngrams): frame = type-vocab³-bounded trigram axis (≤125 rows here) — bound audited in PlanAuditSpec/UnpartitionedWindowAudit
  /** Frequent 3-step journey mining: each user's event-type sequence
    * (event-time order, id tie-break) unrolls into overlapping trigrams
    * via LEAD windows — the sequential-pattern shape q_markov's
    * transition matrix (bigram, memoryless) cannot express: a Markov
    * chain predicts view→click regardless of what preceded the view;
    * the trigram support table shows whether view→click→purchase
    * actually runs above its memoryless expectation. Supports report as
    * exact integer ppm of all trigrams; the min-support cut is on ppm
    * so the operator's output contract is scale-free.
    *
    * Scale shape: trigram extraction is one user-partitioned window
    * (two LEADs share it); the support rollup aggregates to a
    * type-vocab³-bounded frame and the total runs over THAT (≤125
    * rows), never over the corpus. */
  val MinSupportPpm = 2000L

  private def pathNgrams(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val wo = Window.partitionBy($"user_id").orderBy($"us", $"event_id")
    val tri = Tables.events(s, dir)
      .select($"user_id", $"event_id", unix_micros($"ts").as("us"),
        $"event_type".as("t0"))
      .select($"t0",
        lead($"t0", 1).over(wo).as("t1"),
        lead($"t0", 2).over(wo).as("t2"))
      .filter($"t1".isNotNull && $"t2".isNotNull)
    tri.groupBy($"t0", $"t1", $"t2")
      .agg(count(lit(1)).as("n"))
      .withColumn("support_ppm",
        expr("n * 1000000 DIV sum(n) OVER ()"))
      .filter($"support_ppm" >= MinSupportPpm)
      .orderBy($"n".desc, $"t0", $"t1", $"t2")
  }

  private val pathNgramsSql =
    s"""WITH seqd AS (
       |  SELECT event_type AS t0,
       |    LEAD(event_type, 1) OVER w AS t1,
       |    LEAD(event_type, 2) OVER w AS t2
       |  FROM events
       |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
       |tri AS (
       |  SELECT t0, t1, t2, COUNT(*) AS n FROM seqd
       |  WHERE t1 IS NOT NULL AND t2 IS NOT NULL
       |  GROUP BY 1, 2, 3)
       |SELECT t0, t1, t2, n,
       |  n * 1000000 // CAST(SUM(n) OVER () AS BIGINT) AS support_ppm
       |FROM tri
       |QUALIFY support_ppm >= $MinSupportPpm
       |ORDER BY n DESC, t0, t1, t2""".stripMargin

  // -------------------------------------------------- q_audience_overlap
  /** Audience overlap matrix: for every pair of event types, the
    * intersection size and exact Jaccard ppm of their user audiences —
    * the segment-dedup arithmetic behind "these two campaigns reach
    * 61% the same people". Pairs assemble from the DISTINCT (user,
    * type) frame self-joined on user with type < type — each user
    * contributes at most C(|types|,2) pair rows, so the join fan-out is
    * type-vocab-bounded per user, never quadratic in users.
    *
    * Scale shape: one distinct aggregation (map-side partials), one
    * user-keyed self-join with bounded fan-out, one pair rollup; the
    * type-sized audience roster broadcasts back onto ≤ C(types,2)
    * rows. */
  private def audienceOverlap(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ut = Tables.events(s, dir)
      .select($"user_id", $"event_type").distinct()
    val sizes = ut.groupBy($"event_type").agg(count(lit(1)).as("n"))
    val pairs = ut.select($"user_id", $"event_type".as("ta"))
      .join(ut.select($"user_id", $"event_type".as("tb")), Seq("user_id"))
      .filter($"ta" < $"tb")
      .groupBy($"ta", $"tb")
      .agg(count(lit(1)).as("inter"))
    pairs
      .join(broadcast(sizes.select($"event_type".as("ta"), $"n".as("na"))),
        Seq("ta"))
      .join(broadcast(sizes.select($"event_type".as("tb"), $"n".as("nb"))),
        Seq("tb"))
      .select($"ta", $"tb", $"na", $"nb", $"inter",
        expr("inter * 1000000 DIV (na + nb - inter)").as("jaccard_ppm"))
      .orderBy($"ta", $"tb")
  }

  private val audienceOverlapSql =
    """WITH ut AS (
      |  SELECT DISTINCT user_id, event_type FROM events),
      |sizes AS (
      |  SELECT event_type, COUNT(*) AS n FROM ut GROUP BY 1),
      |pairs AS (
      |  SELECT a.event_type AS ta, b.event_type AS tb, COUNT(*) AS inter
      |  FROM ut a JOIN ut b
      |    ON a.user_id = b.user_id AND a.event_type < b.event_type
      |  GROUP BY 1, 2)
      |SELECT ta, tb, sa.n AS na, sb.n AS nb, inter,
      |  inter * 1000000 // (sa.n + sb.n - inter) AS jaccard_ppm
      |FROM pairs
      |JOIN sizes sa ON sa.event_type = ta
      |JOIN sizes sb ON sb.event_type = tb
      |ORDER BY ta, tb""".stripMargin

  val all: Seq[NamedQuery] = Seq(
    NamedQuery("q_multi_touch", multiTouch, Some(multiTouchSql),
      bench = true),
    NamedQuery("q_path_ngrams", pathNgrams, Some(pathNgramsSql),
      bench = true),
    NamedQuery("q_audience_overlap", audienceOverlap,
      Some(audienceOverlapSql), bench = true))
}
