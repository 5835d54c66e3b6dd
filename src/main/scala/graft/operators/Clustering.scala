package graft.operators

import graft.LineageCut._
import graft.{NamedQuery, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed k-means (Lloyd's algorithm) over the embedding column —
  * the clustering step behind IVF coarse quantizers, SemDeDup-style
  * semantic dedup, and topic bucketing of a training corpus.
  *
  * Scale design (100 TB):
  *  - the assignment pass is a crossJoin against the BROADCAST centroid
  *    frame (k rows — k stays small even when n doesn't) followed by a
  *    per-partition argmin: `min_by` partial aggregation collapses the
  *    k candidate rows per vector BEFORE the exchange, so the shuffle
  *    carries one row per vector, not k;
  *  - the update pass is the q_embedding_centroids aggregation shape:
  *    posexplode → one (cluster, dim)-keyed shuffle with partial avg;
  *  - per-round `localCheckpoint` materializes the tiny centroid frame
  *    and cuts the growing lineage (the iterative-DataFrame rule from
  *    Dedup.resolveClusters);
  *  - total cost per iteration: one scan + one slim shuffle — the plan
  *    a 1000-executor run wants.
  *
  * Determinism: ties in the argmin break on cluster id; centroid MEANS
  * are float and merge-order-dependent, so assignments are only
  * guaranteed reproducible when clusters are separated by more than
  * float noise — which is why the driver-visible gate (q_kmeans) runs
  * on PLANTED well-separated clusters whose expected assignment is pure
  * id arithmetic, while behavior on real data is spec-covered
  * (ClusteringSpec: full assignment, ≤ k clusters, non-increasing
  * objective). */
object Clustering {

  /** Squared L2 distance between two array columns (index-ordered HOF
    * aggregation — both inputs are attributes, so the projection-collapse
    * inliner cannot duplicate work). */
  def sqDist(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), _ + _)

  /** Lloyd's iterations. Input needs (idCol: long, vecCol: array<float|double>).
    * Init = vectors of the k smallest ids (deterministic, seed-free).
    * Returns (idCol, cluster: long — the ORIGINAL seed id of the cluster,
    * dist: squared distance to the final assigned centroid). */
  def kmeansAssignments(points: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int): DataFrame = {
    require(k >= 1 && iters >= 1, s"need k >= 1, iters >= 1; got $k, $iters")
    val id = col(idCol)
    val vec = col(vecCol)
    val pts = points.select(id.as("__id"), vec.cast("array<double>").as("__v"))
    var centroids = pts.orderBy(col("__id")).limit(k)
      .select(col("__id").as("__cluster"), col("__v").as("__c"))
      .lineageCut(true)
    var assigned: DataFrame = null
    for (_ <- 1 to iters) {
      assigned = pts.crossJoin(broadcast(centroids))
        .withColumn("__d", sqDist(col("__v"), col("__c")))
        .groupBy(col("__id"))
        .agg(
          min_by(col("__cluster"), struct(col("__d"), col("__cluster")))
            .as("__cluster"),
          min(col("__d")).as("__dist"),
          first(col("__v")).as("__v"))
      centroids = assigned
        .select(col("__cluster"), posexplode(col("__v")).as(Seq("__dim", "__x")))
        .groupBy(col("__cluster"), col("__dim"))
        .agg(avg(col("__x")).as("__m"))
        .groupBy(col("__cluster"))
        .agg(transform(array_sort(collect_list(struct(col("__dim"), col("__m")))),
          s => s.getField("__m")).as("__c"))
        .lineageCut(true)
    }
    assigned.select(col("__id").as(idCol), col("__cluster").as("cluster"),
      col("__dist").as("dist"))
  }

  // -------------------------------------------------------------------- q_kmeans
  // audited-bnlj(q_kmeans): build side = 1-row global-aggregate broadcast — audited in PlanAuditSpec/BnljAudit
  /** Driver-visible gate: plant k well-separated clusters over the
    * corpus id spine — member c of cluster (id % k) sits at
    * one-hot(c) * 10 plus ±0.05 jitter, so inter-cluster distance
    * (~10√2) dwarfs jitter and float-mean noise. Seeds 0..k-1 land one
    * per planted cluster, so converged assignments, the min-member
    * relabel, and cluster sizes are all pure id arithmetic the oracle
    * recomputes exactly. Split or merged clusters, a broken argmin, or
    * an unstable mean all surface as hash mismatches. */
  val KmeansK = 8
  val KmeansDim = 16
  val KmeansIters = 3

  private def plantedPoints(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val jitter: Int => Column = d =>
      (pmod(xxhash64($"vec_id", lit(d)), lit(1000)).cast("double") / 1000.0
        - 0.5) * 0.1
    val emb = array((0 until KmeansDim).map { d =>
      when(pmod($"vec_id", lit(KmeansK.toLong)) === d, lit(10.0))
        .otherwise(lit(0.0)) + jitter(d)
    }: _*)
    Tables.embeddings(s, dir).select($"vec_id", emb.as("planted"))
  }

  private def kmeansGate(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val assigned = kmeansAssignments(plantedPoints(s, dir), "vec_id",
      "planted", KmeansK, KmeansIters)
    val w = Window.partitionBy($"cluster")
    assigned.select($"vec_id",
      min($"vec_id").over(w).as("cluster_rep"),
      count(lit(1)).over(w).as("cluster_size"))
      .orderBy($"vec_id")
  }

  private val kmeansGateSql =
    s"""WITH m AS (SELECT vec_id, vec_id % $KmeansK AS c FROM embeddings)
       |SELECT vec_id, c AS cluster_rep,
       |  COUNT(*) OVER (PARTITION BY c) AS cluster_size
       |FROM m ORDER BY vec_id""".stripMargin

  // ------------------------------------------------------------------ q_semdedup
  // audited-bnlj(q_semdedup): build side = 1-row global-aggregate broadcast — audited in PlanAuditSpec/BnljAudit
  /** SemDeDup-style semantic deduplication (Abbas et al. 2023,
    * arXiv:2303.09540): cluster the embedding space, then within each
    * cluster drop every vector whose cosine to a LOWER-ID cluster-mate
    * exceeds the threshold — keeping one representative per semantic
    * near-dup group.
    *
    * Scale shape: the pair scan is WITHIN-CLUSTER only — an equi-join on
    * the cluster id, never an all-pairs join — so cost is Σ(cluster²),
    * controlled by k (real deployments size k ≈ n / 5000 to bound
    * cluster population; the paper uses k in the tens of thousands for
    * 100M-scale corpora). The drop rule "∃ lower-id near-dup in my
    * cluster" needs only a distinct on the higher id of each hit pair —
    * no iterative grouping — and scoring runs the native codegen
    * cosine. */
  val SemDedupThreshold = 0.99

  /** (idCol, keep: boolean). */
  def semDedup(points: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int, threshold: Double): DataFrame = {
    import graft.functions.VectorFunctions
    val id = col(idCol)
    val assigned = kmeansAssignments(points, idCol, vecCol, k, iters)
      .select(id, col("cluster"))
    val withVec = assigned.join(
      points.select(id, col(vecCol).cast("array<float>").as("__vf")), idCol)
    val a = withVec.select(id.as("__a"), col("cluster"), col("__vf").as("__va"))
    val b = withVec.select(id.as("__b"), col("cluster"), col("__vf").as("__vb"))
    val drops = a.join(b, Seq("cluster"))
      .filter(col("__a") < col("__b"))
      .filter(VectorFunctions.cosine(col("__va"), col("__vb")) >= threshold)
      .select(col("__b").as(idCol)).distinct()
      .withColumn("__drop", lit(true))
    points.select(id)
      .join(drops, Seq(idCol), "left")
      .select(id, coalesce(!col("__drop"), lit(true)).as("keep"))
  }

  /** Driver-visible gate: the planted frame gets two structure levels —
    * the k one-hot clusters above, plus 4 "subgroups" per cluster at a
    * +2.0 secondary component. Same-subgroup cosine ≈ 0.9999 (dup);
    * cross-subgroup within a cluster ≈ 0.96 (kept apart — also proves
    * the threshold actually separates); cross-cluster ≈ 0. Expected
    * keeps are the min id of each (cluster, subgroup) = exactly the ids
    * below k·4 — pure id arithmetic for the oracle. */
  val SemSubgroups = 4

  private def semPlanted(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val jitter: Int => Column = d =>
      (pmod(xxhash64($"vec_id", lit(d + 1000)), lit(1000)).cast("double")
        / 1000.0 - 0.5) * 0.1
    val cluster = pmod($"vec_id", lit(KmeansK.toLong))
    val sub = pmod(floor($"vec_id" / KmeansK), lit(SemSubgroups.toLong))
    val emb = array((0 until KmeansDim).map { d =>
      when(cluster === d, lit(10.0)).otherwise(lit(0.0)) +
        when(sub === (d - KmeansK), lit(2.0)).otherwise(lit(0.0)) +
        jitter(d)
    }: _*)
    Tables.embeddings(s, dir).select($"vec_id", emb.as("planted"))
  }

  private def semDedupGate(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val pts = semPlanted(s, dir)
    semDedup(pts, "vec_id", "planted", KmeansK, KmeansIters, SemDedupThreshold)
      .orderBy($"vec_id")
  }

  private val semDedupGateSql =
    s"""SELECT vec_id, vec_id < ${KmeansK * SemSubgroups} AS keep
       |FROM embeddings ORDER BY vec_id""".stripMargin

  // ------------------------------------------------------------ q_cluster_purity
  // audited-bnlj(q_cluster_purity): build side = 1-row global-aggregate broadcast — audited in PlanAuditSpec/BnljAudit
  /** Cluster-purity audit: k-means assignments (the planted-cluster
    * gate's REAL Lloyd path) crossed with the embeddings' independent
    * `label` column — per cluster, the majority label's share in exact
    * ppm, plus the -1 rollup row with the size-weighted corpus purity
    * (the external-validation metric for any unsupervised grouping).
    * The planted geometry fixes the ASSIGNMENTS (id % k, which the
    * oracle replays), while labels are independent of the plant, so
    * purity is genuinely fractional — not a vacuous 1e6.
    *
    * Scale shape: one (cluster, label) aggregation with map-side
    * partials; majority pick and rollup run on the k×|labels| grid. */
  private def clusterPurity(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val assigned = kmeansAssignments(plantedPoints(s, dir), "vec_id",
      "planted", KmeansK, KmeansIters)
      .join(Tables.embeddings(s, dir).select($"vec_id", $"label"), "vec_id")
    val cells = assigned.groupBy($"cluster", $"label")
      .agg(count(lit(1)).as("n"))
    val perCluster = cells
      .withColumn("rk", row_number().over(
        Window.partitionBy($"cluster").orderBy($"n".desc, $"label")))
      .withColumn("size", sum($"n").over(Window.partitionBy($"cluster")))
      .filter($"rk" === 1)
      .select($"cluster".cast("long").as("cluster"), $"size",
        $"label".as("majority_label"), $"n".as("majority_n"),
        expr("n * 1000000 DIV size").as("purity_ppm"))
    val total = perCluster.agg(lit(-1L).as("cluster"),
      sum($"size").as("size"), lit("__all__").as("majority_label"),
      sum($"majority_n").as("majority_n"))
      .withColumn("purity_ppm", expr("majority_n * 1000000 DIV size"))
    perCluster.unionByName(total).orderBy($"cluster")
  }

  private val clusterPuritySql =
    s"""WITH m AS (
       |  SELECT vec_id, vec_id % $KmeansK AS cluster, label FROM embeddings),
       |cells AS (
       |  SELECT cluster, label, CAST(COUNT(*) AS BIGINT) AS n
       |  FROM m GROUP BY 1, 2),
       |pc AS (
       |  SELECT CAST(cluster AS BIGINT) AS cluster,
       |    CAST(SUM(n) OVER (PARTITION BY cluster) AS BIGINT) AS size,
       |    label AS majority_label, n AS majority_n,
       |    ROW_NUMBER() OVER (PARTITION BY cluster ORDER BY n DESC, label)
       |      AS rk
       |  FROM cells),
       |per AS (
       |  SELECT cluster, size, majority_label, majority_n,
       |    majority_n * 1000000 // size AS purity_ppm
       |  FROM pc WHERE rk = 1)
       |SELECT * FROM per
       |UNION ALL
       |SELECT -1, CAST(SUM(size) AS BIGINT), '__all__',
       |  CAST(SUM(majority_n) AS BIGINT),
       |  CAST(SUM(majority_n) AS BIGINT) * 1000000
       |    // CAST(SUM(size) AS BIGINT)
       |FROM per
       |ORDER BY cluster""".stripMargin

  val all: Seq[NamedQuery] = Seq(
    NamedQuery("q_kmeans", kmeansGate, Some(kmeansGateSql), bench = true),
    NamedQuery("q_cluster_purity", clusterPurity, Some(clusterPuritySql),
      bench = true),
    NamedQuery("q_semdedup", semDedupGate, Some(semDedupGateSql), bench = true))
}
