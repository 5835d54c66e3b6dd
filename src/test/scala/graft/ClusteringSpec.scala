package graft

import graft.operators.Clustering
import org.apache.spark.sql.functions._

/** K-means kernel behavior on real (unplanted) data — the planted-cluster
  * exactness gate is q_kmeans itself. */
class ClusteringSpec extends GraftSuite {
  import spark.implicits._

  test("kmeans assigns every vector to exactly one of <= k clusters") {
    val e = Tables.embeddings(spark, sf)
    val out = Clustering.kmeansAssignments(e, "vec_id", "embedding",
      k = 8, iters = 2)
    assert(out.count() == e.count())
    assert(out.select($"vec_id").distinct().count() == e.count())
    assert(out.select($"cluster").distinct().count() <= 8)
    // every cluster label is one of the k seed ids
    val seeds = e.orderBy($"vec_id").limit(8)
      .collect().map(_.getLong(0)).toSet
    out.select($"cluster").distinct().collect()
      .foreach(r => assert(seeds.contains(r.getLong(0))))
  }

  test("kmeans objective (sum of squared distances) never increases with iterations") {
    val e = Tables.embeddings(spark, sf)
    val obj = (1 to 3).map { it =>
      Clustering.kmeansAssignments(e, "vec_id", "embedding", k = 8, iters = it)
        .agg(sum($"dist")).collect()(0).getDouble(0)
    }
    obj.sliding(2).foreach { case Seq(a, b) =>
      assert(b <= a * (1 + 1e-9), s"objective rose: $obj")
    }
  }

  test("q_kmeans gate: planted clusters recovered exactly on any layout") {
    val base = canon(SparkEntry.queries("q_kmeans")(spark, sf))
    assert(base.nonEmpty)
    // expected from pure id arithmetic
    val n = Tables.embeddings(spark, sf).count()
    val sizes = (0L until n).groupBy(_ % 8).view.mapValues(_.size.toLong).toMap
    val expected = (0L until n).map { id =>
      Seq(id % 8, sizes(id % 8), id).map(_.toString).mkString("|")
    }.sorted
    // canon sorts columns alphabetically: cluster_rep, cluster_size, vec_id
    assert(base == expected)
  }

  test("semDedup kernel: drops exactly the higher-id member of a near-dup pair") {
    // 1 cluster region at x≈(10,0), containing a near-dup pair {10, 11}
    // and a distinct member 12; far region {13} alone
    val pts = Seq(
      (10L, Array(10.0f, 0.0f)),
      (11L, Array(10.001f, 0.0f)),    // near-dup of 10 (cos ≈ 1)
      (12L, Array(10.0f, 4.0f)),      // same region, cos ≈ 0.93 → kept
      (13L, Array(0.0f, 10.0f))
    ).toDF("vec_id", "embedding")
    val out = Clustering.semDedup(pts, "vec_id", "embedding",
      k = 2, iters = 2, threshold = 0.99)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(out == Map(10L -> true, 11L -> false, 12L -> true, 13L -> true))
  }

  test("q_semdedup gate is layout-independent and keeps exactly k*subgroups reps") {
    val df = SparkEntry.queries("q_semdedup")(spark, sf)
    val rows = df.collect()
    val kept = rows.filter(_.getBoolean(1)).map(_.getLong(0)).toSet
    val expectKept = (0L until
      (graft.operators.Clustering.KmeansK *
        graft.operators.Clustering.SemSubgroups).toLong).toSet
    assert(kept == expectKept)
    assert(rows.length == Tables.embeddings(spark, sf).count())
  }

  test("sqDist: exact on known vectors, zero on self") {
    val df = Seq((Array(1.0f, 2.0f), Array(4.0f, 6.0f)))
      .toDF("a", "b")
      .select(Clustering.sqDist($"a", $"b").as("d"),
        Clustering.sqDist($"a", $"a").as("z"))
    val r = df.collect()(0)
    assert(r.getDouble(0) == 25.0)
    assert(r.getDouble(1) == 0.0)
  }
  // ------------------------------------------------------------ q_cluster_purity
  test("q_cluster_purity: sizes partition, purity bracketed, rollup consistent") {
    val rows = SparkEntry.queries("q_cluster_purity")(spark, sf).collect()
    val parts = rows.filter(_.getLong(0) >= 0L)
    val total = rows.filter(_.getLong(0) == -1L).head
    assert(parts.length == graft.operators.Clustering.KmeansK)
    assert(parts.map(_.getLong(1)).sum == total.getLong(1))
    assert(total.getLong(1) ==
      Tables.embeddings(spark, sf).count())
    assert(parts.map(_.getLong(3)).sum == total.getLong(3))
    parts.foreach { r =>
      val p = r.getLong(4)
      // majority share of L labels lives in [1e6/L, 1e6]; must never be
      // vacuously perfect on independent labels
      assert(p >= 1000000L / 16 && p < 1000000L, s"purity $p")
    }
  }
}
