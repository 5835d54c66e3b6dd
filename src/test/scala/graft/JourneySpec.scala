package graft

/** Journey/sequence analytics (Journey.scala): the conservation and
  * bound invariants behind the oracle hashes — attribution credit must
  * CONSERVE (exactly 1e6 ppm per converting user), trigram counts must
  * tie to sequence lengths, and overlap arithmetic must respect set
  * bounds. */
class JourneySpec extends GraftSuite {
  import org.apache.spark.sql.functions._

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q_multi_touch: credit conserves at exactly 1e6 ppm per converting user") {
    val e = Tables.events(spark, sf)
    // converting users WITH at least one touch before their first purchase
    // (a user whose first event is the purchase has no touch to credit)
    val wp = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
    val ev = e.select(col("user_id"), col("event_id"),
      unix_micros(col("ts")).as("us"), col("event_type"))
    val fp = ev.filter(col("event_type") === "purchase")
      .withColumn("rn", row_number().over(wp)).filter(col("rn") === 1)
      .select(col("user_id"), col("us").as("p_us"), col("event_id").as("p_eid"))
    val creditedUsers = ev.filter(col("event_type") =!= "purchase")
      .join(fp, Seq("user_id"))
      .filter(col("us") < col("p_us") ||
        (col("us") === col("p_us") && col("event_id") < col("p_eid")))
      .select("user_id").distinct().count()
    val total = run("q_multi_touch")
      .agg(sum("credit_ppm_total")).collect().head.getLong(0)
    assert(total == creditedUsers * 1000000L,
      s"credit leaked: $total ppm for $creditedUsers converting users")
  }

  test("q_path_ngrams: supports bounded and consistent with the total") {
    val rows = run("q_path_ngrams").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val ppm = r.getAs[Long]("support_ppm")
      assert(ppm >= operators.Journey.MinSupportPpm && ppm <= 1000000L)
    }
    // every user with k >= 3 events contributes exactly k-2 trigrams
    val expected = Tables.events(spark, sf)
      .groupBy("user_id").agg(count(lit(1)).as("k"))
      .filter(col("k") >= 3)
      .agg(sum(col("k") - 2)).collect().head.getLong(0)
    // the support cut may drop tail trigrams; the UNFILTERED total is
    // what must tie out — recompute the retained share bound instead
    val retained = rows.map(_.getAs[Long]("n")).sum
    assert(retained <= expected,
      s"retained trigrams $retained exceed the sequence-length total $expected")
  }

  test("q_audience_overlap: intersections respect set bounds") {
    val rows = run("q_audience_overlap").collect()
    assert(rows.length == 10, "C(5,2) type pairs expected at smoke scale")
    rows.foreach { r =>
      val (na, nb, inter) = (r.getAs[Long]("na"), r.getAs[Long]("nb"),
        r.getAs[Long]("inter"))
      assert(inter <= math.min(na, nb))
      val j = r.getAs[Long]("jaccard_ppm")
      assert(j >= 0 && j <= 1000000L)
      assert(j == inter * 1000000L / (na + nb - inter))
    }
  }
}
