package graft

import org.apache.spark.unsafe.types.UTF8String

/** Geo family (Geo.scala): the blocking scheme's completeness is the
  * load-bearing claim — q_spatial_join is checked pair-for-pair against
  * an in-test O(n²) brute force at smoke scale, so the 3×3 neighborhood
  * argument is proved, not assumed. The rest are conservation checks. */
class GeoSpec extends GraftSuite {

  import graft.operators.Geo

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  private def h64(tag: String, id: Long): Long =
    graft.functions.TextImpl.md5Lower64(
      UTF8String.fromString(tag + id.toString)) & Long.MaxValue

  test("q_spatial_join: blocked join equals brute force at smoke scale") {
    val ids = Tables.customer(spark, sf)
      .select("c_custkey").collect().map(_.getLong(0))
    val pts = ids.map { id =>
      val h = h64("geo:", id)
      (id, h % Geo.GridUnits, (h / Geo.GridUnits) % Geo.GridUnits)
    }
    val r2 = Geo.JoinRadius * Geo.JoinRadius
    val expected = (for {
      (a, xa, ya) <- pts.iterator
      (b, xb, yb) <- pts.iterator
      if a < b
      d2 = (xa - xb) * (xa - xb) + (ya - yb) * (ya - yb)
      if d2 <= r2
    } yield (a, b, d2)).toSet
    val got = run("q_spatial_join").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected,
      s"blocked join diverged from brute force: " +
        s"missing=${(expected -- got).take(5)} extra=${(got -- expected).take(5)}")
  }

  test("q_geo_grid: cells tile the world; event accounting closes") {
    val rows = run("q_geo_grid").collect()
    val nCells = Geo.GridUnits / Geo.DensityCell
    rows.foreach { r =>
      assert(r.getAs[Long]("cell_x") >= 0 && r.getAs[Long]("cell_x") < nCells)
      assert(r.getAs[Long]("cell_y") >= 0 && r.getAs[Long]("cell_y") < nCells)
      assert(r.getAs[Long]("n_users") <= r.getAs[Long]("n_events"))
    }
    val total = rows.map(_.getAs[Long]("n_events")).sum
    assert(total == Tables.events(spark, sf).count(),
      "every event lands in exactly one cell")
  }

  test("q_nearest_poi: every customer assigned exactly once") {
    val rows = run("q_nearest_poi").collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("poi") >= 0 && r.getAs[Long]("poi") < 25)
      assert(r.getAs[Long]("mean_dist2") >= 0)
    }
    assert(rows.map(_.getAs[Long]("n_customers")).sum ==
      Tables.customer(spark, sf).count())
  }

  test("q_geo_trip: move counts are events-per-user minus one") {
    val perUser = Tables.events(spark, sf).groupBy("user_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rows = run("q_geo_trip").collect()
    assert(rows.length == math.min(Geo.TripTopK, perUser.size))
    rows.foreach { r =>
      assert(r.getAs[Long]("n_moves") ==
        perUser(r.getAs[Long]("user_id")) - 1)
      assert(r.getAs[Long]("trip_len") >= 0)
    }
  }

  test("q_geofence: hit accounting is sane") {
    val rows = run("q_geofence").collect()
    assert(rows.nonEmpty, "fixed-width fences over a uniform grid must hit")
    rows.foreach { r =>
      assert(r.getAs[Long]("fence") >= 0 && r.getAs[Long]("fence") < 5)
      assert(r.getAs[Long]("n_users") <= r.getAs[Long]("n_hits"))
    }
  }
}
