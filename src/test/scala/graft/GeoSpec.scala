package graft

import org.apache.spark.sql.functions._
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

  test("spatial join under a planted hot cell: AQE skew-split fires, pairs unchanged") {
    // The fixture's md5-derived coordinates are uniform by construction;
    // real geodata is power-law dense (cities). Plant the city: ~10% of
    // points stacked on ONE location (its cell is the hot shuffle key of
    // the blocked join), the rest md5-uniform over the full grid. Prove
    // the engine answer at scale: (a) with skew-join enabled and forced
    // SMJ, AQE marks the cell-keyed join skew-optimized and splits the
    // hot partition; (b) the pair set is IDENTICAL to the baseline plan
    // (same count + checksum) — a split must never change an answer;
    // (c) the planted city's C(h,2) co-located pairs are all present.
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    val n = 20000L
    val hot = 2000L // 10%
    // hot points at one location (pair distance 0 <= R: all qualify);
    // background md5-uniform, disjoint id space above the hot block
    val pts = spark.range(n).selectExpr(
      "id",
      s"""CASE WHEN id < $hot THEN ${7 * Geo.JoinRadius} + 500
          ELSE CAST(conv(substring(md5(concat('sk:', id)), 1, 12), 16, 10)
               AS BIGINT) % ${Geo.GridUnits} END AS x""",
      s"""CASE WHEN id < $hot THEN ${11 * Geo.JoinRadius} + 500
          ELSE CAST(conv(substring(md5(concat('sky:', id)), 1, 12), 16, 10)
               AS BIGINT) % ${Geo.GridUnits} END AS y""")
    def checksum(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)), sum(col("id_a") * 31 + col("id_b")))
        .collect().head
      (r.getLong(0), r.getLong(1))
    }
    val baseline = checksum(Geo.spatialJoinOn(pts))
    assert(baseline._1 >= hot * (hot - 1) / 2,
      s"planted city must contribute C($hot,2) pairs, got ${baseline._1}")
    val keys = Seq(
      "spark.sql.shuffle.partitions",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> spark.conf.getOption(k)).toMap
    // the suite session runs 4 shuffle partitions; at that width the
    // hot cell is diluted below the 2x-median skew trigger. 64 is the
    // cluster-realistic width where one hot cell IS one hot partition.
    spark.conf.set("spark.sql.shuffle.partitions", "64")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8192")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4096")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val skewed = checksum(Geo.spatialJoinOn(pts))
      assert(skewed == baseline,
        s"skew-split changed the answer: $skewed vs $baseline")
      // drive the bare join plan itself through AQE, then inspect it
      val joined = Geo.spatialJoinOn(pts)
      joined.queryExecution.toRdd.count()
      val finalPlan = joined.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      val stagePlans = finalPlan +: finalPlan.collect {
        case qs: org.apache.spark.sql.execution.adaptive.QueryStageExec => qs.plan
      }
      val skewJoins = stagePlans.flatMap(_.collect {
        case j: SortMergeJoinExec if j.isSkewJoin => j
      })
      assert(skewJoins.nonEmpty,
        s"expected AQE to split the hot-cell partition; final plan:\n$finalPlan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
