package graft

import org.apache.spark.unsafe.types.UTF8String

/** KMV set algebra: the full sketch pipeline (per-set k-minima, union
  * sketch, match count, both estimators) replayed driver-side in plain
  * Scala from the raw customer sets, using the JVM md5Lower64 twin —
  * independent of both the Spark plan and the DuckDB oracle. */
class KmvJaccardSpec extends GraftSuite {

  private val K = operators.Analytics.KmvK

  private def h(member: Long): Long =
    functions.TextImpl.md5Lower64(
      UTF8String.fromString(s"kmv:$member")) & Long.MaxValue

  private def members(priority: String): Set[Long] =
    Tables.orders(spark, sf)
      .filter(org.apache.spark.sql.functions.col("o_orderpriority") === priority)
      .select("o_custkey").distinct().collect().map(_.getLong(0)).toSet

  test("q_kmv_jaccard: full driver replay of sketches and estimators") {
    val a = members("1-URGENT")
    val b = members("2-HIGH")
    val sa = a.map(h).toSeq.sorted.take(K).toSet
    val sb = b.map(h).toSeq.sorted.take(K).toSet
    val union = (sa ++ sb).toSeq.sorted.take(K)
    val kU = union.size.toLong
    val matches = union.count(x => sa(x) && sb(x)).toLong
    val estUnion =
      if (kU == K) (Long.MaxValue / union.last) * (K - 1) else kU
    val exactInter = (a intersect b).size.toLong
    val r = SparkEntry.queries("q_kmv_jaccard")(spark, sf).collect().head
    assert(r.getAs[Long]("exact_a") == a.size.toLong)
    assert(r.getAs[Long]("exact_b") == b.size.toLong)
    assert(r.getAs[Long]("exact_inter") == exactInter)
    assert(r.getAs[Long]("k_u") == kU)
    assert(r.getAs[Long]("matches") == matches)
    assert(r.getAs[Long]("j_est_ppm") == matches * 1000000L / kU)
    assert(r.getAs[Long]("est_union") == estUnion)
    assert(r.getAs[Long]("est_inter") == matches * estUnion / kU)
    assert(r.getAs[Long]("j_exact_ppm") ==
      exactInter * 1000000L / (a.size + b.size - exactInter))
    // the estimator must land within the coarse KMV error envelope
    // (~3/sqrt(K) of the true Jaccard, generous to avoid flake): a
    // grossly wrong sketch passes the identity checks above only if
    // the replay is wrong the same way — this bound is the sanity net
    val jTrue = exactInter.toDouble / (a.size + b.size - exactInter)
    val jEst = matches.toDouble / kU
    assert(math.abs(jEst - jTrue) < 3.0 / math.sqrt(K.toDouble) + 0.05,
      s"jaccard estimate $jEst too far from exact $jTrue")
  }
}
