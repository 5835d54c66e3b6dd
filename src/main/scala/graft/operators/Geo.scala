package graft.operators

import graft.{NamedQuery, Tables}
import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Geospatial operators over deterministic synthetic coordinates.
  *
  * The fixture tables carry no lat/lon, so every point derives from an
  * md5 hash of a stable id — uniform over a 1,000,000 × 1,000,000
  * integer grid, replayed bit-identically by the DuckDB oracle
  * (`md5_number_lower`). All geometry stays EXACT-INTEGER: squared
  * euclidean / Manhattan distances in grid units via `%` and `DIV`
  * (never float `/` — the hash exceeds a double's 53-bit integer
  * range), the same discipline as the ppm/DIV rule everywhere else.
  *
  * The scale centerpiece is q_spatial_join: a radius self-join done the
  * way a 100 TB cluster must — grid-cell blocking with cell size = R,
  * each point probing its 3×3 neighborhood, so candidates are bounded
  * by local density × 9R² and the shuffle carries (id, x, y, cell)
  * only. The oracle is a deliberately DIFFERENT formulation (a direct
  * band-predicate join DuckDB plans as an IEJoin), so agreement is
  * differential, not copied.
  */
object Geo {

  /** World is a GridUnits × GridUnits integer square. */
  val GridUnits = 1000000L
  /** Radius for the blocked self-join; also the blocking cell size. */
  val JoinRadius = 1000L
  /** Cell size for the density grid (20 × 20 cells). */
  val DensityCell = 50000L
  /** Geofence half-width (rectangular, Chebyshev). */
  val FenceHalf = 150000L

  private def hash(tag: String, id: Column): Column =
    TextFunctions.md5Lower64(concat(lit(tag), id.cast("string")))
      .bitwiseAND(lit(Long.MaxValue))

  /** Integer (x, y) from a hash column already named `h`. */
  private val xExpr = s"h % $GridUnits"
  private val yExpr = s"(h DIV $GridUnits) % $GridUnits"

  private def sqlPoint(tag: String, id: String): String =
    s"""CAST(md5_number_lower('$tag' || CAST($id AS VARCHAR))
       |      & 9223372036854775807::UBIGINT AS BIGINT)""".stripMargin

  // --------------------------------------------------------- q_geo_grid
  /** Spatial density grid: every event maps to a deterministic point,
    * points bucket into a 20×20 cell grid, and each cell reports event
    * count, distinct users, and revenue cents. The roll-a-map-tile
    * aggregation every geo dashboard starts from.
    *
    * Scale shape: row-local hashing + cell arithmetic inside codegen,
    * one cell-keyed aggregation over a FIXED 400-cell axis — map-side
    * partials collapse everything before the shuffle. */
  private def geoGrid(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .select($"user_id", round($"value" * 100).cast("long").as("cents"),
        hash("gev:", $"event_id").as("h"))
      .selectExpr("user_id", "cents",
        s"($xExpr) DIV $DensityCell AS cell_x",
        s"($yExpr) DIV $DensityCell AS cell_y")
      .groupBy($"cell_x", $"cell_y")
      .agg(count(lit(1)).as("n_events"),
        countDistinct($"user_id").as("n_users"),
        sum($"cents").as("sum_cents"))
      .orderBy($"cell_x", $"cell_y")
  }

  private val geoGridSql =
    s"""WITH p AS (
       |  SELECT user_id, CAST(round(value * 100) AS BIGINT) AS cents,
       |    ${sqlPoint("gev:", "event_id")} AS h
       |  FROM events),
       |pt AS (
       |  SELECT user_id, cents,
       |    (h % $GridUnits) // $DensityCell AS cell_x,
       |    ((h // $GridUnits) % $GridUnits) // $DensityCell AS cell_y
       |  FROM p)
       |SELECT cell_x, cell_y, COUNT(*) AS n_events,
       |  COUNT(DISTINCT user_id) AS n_users,
       |  CAST(SUM(cents) AS BIGINT) AS sum_cents
       |FROM pt GROUP BY cell_x, cell_y ORDER BY cell_x, cell_y""".stripMargin

  // ----------------------------------------------------- q_spatial_join
  /** Radius self-join via grid-cell blocking: customers' home points,
    * all pairs within JoinRadius (exact integer squared euclidean).
    * Blocking: cell size = R, the LEFT side explodes into its 3×3
    * neighbor cells, the RIGHT side anchors at its own cell, pairs join
    * on the cell key with `id_a < id_b` — every qualifying pair is
    * found exactly once (the partner's anchor cell is a unique member
    * of the probe neighborhood when dist ≤ R ≤ cell size).
    *
    * Scale shape: the LSH-banding argument in euclidean space —
    * candidates are bounded by 9 × (local density × R²) per point, the
    * shuffle carries (id, x, y) only, and the verify filter is
    * row-local integer arithmetic. No all-pairs anywhere; the oracle
    * instead uses a band-predicate join (DuckDB IEJoin) — a different
    * algorithm agreeing on the exact pair set.
    *
    * Density caveat (measured in ScaleDecade2Spec): at fixed R, k× the
    * points in the SAME world is k× density, so candidates AND result
    * pairs grow ~k² — inherent to the radius-join SPEC, not the
    * blocking. The per-candidate cost is what blocking bounds; a real
    * 100 TB deployment holds density constant (R shrinks or the world
    * grows with the corpus), which restores linear growth. */
  private[graft] def points(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.customer(s, dir)
      .select($"c_custkey".as("id"), hash("geo:", $"c_custkey").as("h"))
      .selectExpr("id", s"$xExpr AS x", s"$yExpr AS y")
  }

  /** The blocked kernel over any (id, x, y) frame — public so the
    * skew-stress spec can feed a PLANTED hot-cell distribution (real
    * geodata is power-law dense: cities) and prove AQE's skew-join
    * split fires on the cell-keyed shuffle while the pair set stays
    * bit-identical to the unsplit plan. */
  def spatialJoinOn(pts0: DataFrame): DataFrame = {
    import pts0.sparkSession.implicits._
    val pts = pts0
      .selectExpr("id", "x", "y",
        s"x DIV $JoinRadius AS cx", s"y DIV $JoinRadius AS cy")
    val probes = pts
      .select($"id".as("id_a"), $"x".as("xa"), $"y".as("ya"),
        explode(array((-1 to 1).flatMap(dx => (-1 to 1).map(dy =>
          struct(($"cx" + dx).as("cx"), ($"cy" + dy).as("cy")))): _*))
          .as("cell"))
      .select($"id_a", $"xa", $"ya", $"cell.cx".as("cx"), $"cell.cy".as("cy"))
    val anchors = pts
      .select($"id".as("id_b"), $"x".as("xb"), $"y".as("yb"), $"cx", $"cy")
    probes.join(anchors, Seq("cx", "cy"))
      .filter($"id_a" < $"id_b")
      .select($"id_a", $"id_b",
        (($"xa" - $"xb") * ($"xa" - $"xb") +
          ($"ya" - $"yb") * ($"ya" - $"yb")).as("dist2"))
      .filter($"dist2" <= JoinRadius * JoinRadius)
  }

  private def spatialJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    spatialJoinOn(points(s, dir)).orderBy($"id_a", $"id_b")
  }

  private val spatialJoinSql =
    s"""WITH p AS (
       |  SELECT c_custkey AS id, ${sqlPoint("geo:", "c_custkey")} AS h
       |  FROM customer),
       |pt AS (
       |  SELECT id, h % $GridUnits AS x, (h // $GridUnits) % $GridUnits AS y
       |  FROM p)
       |SELECT a.id AS id_a, b.id AS id_b,
       |  (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS dist2
       |FROM pt a JOIN pt b
       |  ON a.id < b.id
       |  AND b.x BETWEEN a.x - $JoinRadius AND a.x + $JoinRadius
       |  AND b.y BETWEEN a.y - $JoinRadius AND a.y + $JoinRadius
       |WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
       |  <= ${JoinRadius * JoinRadius}
       |ORDER BY id_a, id_b""".stripMargin

  // ------------------------------------------------------ q_nearest_poi
  // audited-bnlj(q_nearest_poi): build side = 25-row nation POI roster (constant-bounded) — audited in PlanAuditSpec/BnljAudit
  /** Nearest-POI assignment: 25 POIs (one per nation, md5-derived
    * centers), every customer assigns to its nearest POI by exact
    * squared distance with a deterministic tie-break (smaller
    * nationkey), then a per-POI rollup: customers served and mean
    * distance² (floor DIV). The argmin collapses through one unique
    * key — dist2 × 100 + nationkey — so both engines agree bit-exactly
    * even on ties (the q_latest_per_key collapsed-argmax discipline).
    *
    * Scale shape: the POI roster is constant-bounded and broadcast;
    * the per-customer argmin is a map-side-partial keyed aggregation;
    * the final rollup axis is 25 rows. */
  private def nearestPoi(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val pois = Tables.nation(s, dir)
      .select($"n_nationkey".cast("long").as("poi"),
        hash("poi:", $"n_nationkey").as("h"))
      .selectExpr("poi", s"$xExpr AS px", s"$yExpr AS py")
    points(s, dir).crossJoin(broadcast(pois))
      .select($"id",
        ((($"x" - $"px") * ($"x" - $"px") +
          ($"y" - $"py") * ($"y" - $"py")) * 100 + $"poi").as("key"))
      .groupBy($"id").agg(min($"key").as("key"))
      .selectExpr("id", "key % 100 AS poi", "key DIV 100 AS dist2")
      .groupBy($"poi")
      .agg(count(lit(1)).as("n_customers"),
        expr("sum(dist2) DIV count(1)").as("mean_dist2"))
      .orderBy($"poi")
  }

  private val nearestPoiSql =
    s"""WITH pois AS (
       |  SELECT CAST(n_nationkey AS BIGINT) AS poi,
       |    h % $GridUnits AS px, (h // $GridUnits) % $GridUnits AS py
       |  FROM (SELECT n_nationkey,
       |      ${sqlPoint("poi:", "n_nationkey")} AS h FROM nation)),
       |cust AS (
       |  SELECT id, h % $GridUnits AS x, (h // $GridUnits) % $GridUnits AS y
       |  FROM (SELECT c_custkey AS id,
       |      ${sqlPoint("geo:", "c_custkey")} AS h FROM customer)),
       |assigned AS (
       |  SELECT c.id,
       |    MIN(((c.x - p.px) * (c.x - p.px)
       |       + (c.y - p.py) * (c.y - p.py)) * 100 + p.poi) AS key
       |  FROM cust c CROSS JOIN pois p GROUP BY c.id)
       |SELECT key % 100 AS poi, COUNT(*) AS n_customers,
       |  CAST(SUM(key // 100) AS BIGINT) // COUNT(*) AS mean_dist2
       |FROM assigned GROUP BY poi ORDER BY poi""".stripMargin

  // --------------------------------------------------------- q_geo_trip
  /** Per-user trip length: each user's events ordered by (ts, event_id)
    * trace a path through the grid; the trip length is the sum of
    * Manhattan steps |Δx| + |Δy| between consecutive points — exact
    * integers where a haversine would be float. Reports the top 20
    * travelers (total desc, then user_id) with step counts.
    *
    * Scale shape: one user-partitioned window (per-user rows are
    * rate-bounded by the fixture's constant events-per-user), one
    * user-keyed aggregation, TakeOrderedAndProject for the top-k. */
  val TripTopK = 20

  private def geoTrip(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    Tables.events(s, dir)
      .select($"user_id", $"ts", $"event_id",
        hash("gev:", $"event_id").as("h"))
      .selectExpr("user_id", "ts", "event_id",
        s"$xExpr AS x", s"$yExpr AS y")
      .select($"user_id",
        (abs($"x" - lag($"x", 1).over(w)) +
          abs($"y" - lag($"y", 1).over(w))).as("step"))
      .groupBy($"user_id")
      .agg(sum($"step").as("trip_len"),
        count($"step").as("n_moves"))
      .orderBy($"trip_len".desc, $"user_id")
      .limit(TripTopK)
  }

  private val geoTripSql =
    s"""WITH p AS (
       |  SELECT user_id, ts, event_id,
       |    ${sqlPoint("gev:", "event_id")} AS h
       |  FROM events),
       |pt AS (
       |  SELECT user_id, ts, event_id,
       |    h % $GridUnits AS x, (h // $GridUnits) % $GridUnits AS y
       |  FROM p),
       |steps AS (
       |  SELECT user_id,
       |    abs(x - LAG(x) OVER w) + abs(y - LAG(y) OVER w) AS step
       |  FROM pt WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
       |SELECT user_id, CAST(SUM(step) AS BIGINT) AS trip_len,
       |  COUNT(step) AS n_moves
       |FROM steps GROUP BY user_id
       |ORDER BY trip_len DESC, user_id LIMIT $TripTopK""".stripMargin

  // --------------------------------------------------------- q_geofence
  // audited-bnlj(q_geofence): build side = 5-row region fence roster (constant-bounded) — audited in PlanAuditSpec/BnljAudit
  /** Geofence hit counts: 5 rectangular fences (one per region,
    * md5-derived centers, fixed half-width), every event point tests
    * against every fence (point-in-rectangle = two integer interval
    * tests), and each (fence, event_type) cell reports hits and
    * distinct users. Overlapping fences each count — the
    * point-in-polygon shape with rectangles standing in for polygon
    * edge tables.
    *
    * Scale shape: the fence roster is constant-bounded and broadcast;
    * the containment test is row-local codegen; the output axis is
    * #fences × type-vocab. */
  private def geofence(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val fences = Tables.region(s, dir)
      .select($"r_regionkey".cast("long").as("fence"),
        hash("fence:", $"r_regionkey").as("h"))
      .selectExpr("fence", s"$xExpr AS fx", s"$yExpr AS fy")
    val evs = Tables.events(s, dir)
      .select($"user_id", $"event_type", hash("gev:", $"event_id").as("h"))
      .selectExpr("user_id", "event_type", s"$xExpr AS x", s"$yExpr AS y")
    evs.crossJoin(broadcast(fences))
      .filter(abs($"x" - $"fx") <= FenceHalf && abs($"y" - $"fy") <= FenceHalf)
      .groupBy($"fence", $"event_type")
      .agg(count(lit(1)).as("n_hits"),
        countDistinct($"user_id").as("n_users"))
      .orderBy($"fence", $"event_type")
  }

  private val geofenceSql =
    s"""WITH fences AS (
       |  SELECT CAST(r_regionkey AS BIGINT) AS fence,
       |    h % $GridUnits AS fx, (h // $GridUnits) % $GridUnits AS fy
       |  FROM (SELECT r_regionkey,
       |      ${sqlPoint("fence:", "r_regionkey")} AS h FROM region)),
       |evs AS (
       |  SELECT user_id, event_type,
       |    h % $GridUnits AS x, (h // $GridUnits) % $GridUnits AS y
       |  FROM (SELECT user_id, event_type,
       |      ${sqlPoint("gev:", "event_id")} AS h FROM events))
       |SELECT f.fence, e.event_type, COUNT(*) AS n_hits,
       |  COUNT(DISTINCT e.user_id) AS n_users
       |FROM evs e CROSS JOIN fences f
       |WHERE abs(e.x - f.fx) <= $FenceHalf AND abs(e.y - f.fy) <= $FenceHalf
       |GROUP BY f.fence, e.event_type
       |ORDER BY f.fence, e.event_type""".stripMargin

  val all: Seq[NamedQuery] = Seq(
    NamedQuery("q_geo_grid", geoGrid, Some(geoGridSql), bench = true),
    NamedQuery("q_spatial_join", spatialJoin, Some(spatialJoinSql),
      bench = true),
    NamedQuery("q_nearest_poi", nearestPoi, Some(nearestPoiSql),
      bench = true),
    NamedQuery("q_geo_trip", geoTrip, Some(geoTripSql), bench = true),
    NamedQuery("q_geofence", geofence, Some(geofenceSql), bench = true))
}
