package graft.operators

import graft.{NamedQuery, Tables}
import graft.functions.VectorFunctions
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over the `embeddings` table.
  *
  * Two paths, per the standard scale playbook:
  *  - `q_embedding_cosine_topk`: brute-force cosine top-k against a
  *    broadcast query vector — the exactness baseline. O(n·d) per query,
  *    embarrassingly parallel, zero shuffle of the big side (the single
  *    query row is broadcast); this is the right plan even at 100 TB when
  *    the query set is small.
  *  - `q_ann_lsh`: random-hyperplane LSH (sign sketches) with banded
  *    OR-amplification + single-bit multiprobe. The candidate join carries
  *    ONLY (vec_id, band, band_val) — embeddings never ride the LSH
  *    shuffle; payloads are re-joined once, after `distinct()`, for cosine
  *    verification. 16-bit bands give a 65k-bucket space per band that the
  *    corpus spreads over (occupancy ~n/65k per band value), and a
  *    `MaxBucket` guard drops degenerate hot buckets before the pair join.
  */
object Similarity {

  /** Deterministic pseudo-random hyperplane component for (plane, dim) —
    * see VectorImpl.planeComponent (shared with the native LshBands
    * expression so both spellings agree bit-for-bit). */
  def planeComponent(plane: Int, dim: Int): Double =
    graft.functions.VectorImpl.planeComponent(plane, dim)

  /** 4 bands x 16 sign bits. For near-dup vectors (cos >= 0.99 — the
    * regime LSH dedup targets) a band collides with p ~ 0.98^16 ~ 0.7, so
    * 4 bands give ~0.99 recall; multiprobe (single-bit flips, below) adds
    * hamming-distance-1 collisions for the sparser cos ~0.9 tail. Unlike a
    * fixed small bucket space, 2^16 buckets per band keep within-bucket
    * occupancy (and thus the quadratic pair step) ~n/2^16 — the candidate
    * count grows linearly with the corpus, not quadratically. */
  val NumPlanes = 64
  val BandBits = 16
  val NumBands: Int = NumPlanes / BandBits

  /** LSH buckets larger than this are dropped from candidate generation
    * (skew guard — e.g. the all-zeros sketch of degenerate/zero vectors
    * would otherwise explode one reducer quadratically). */
  val MaxBucket = 1000

  /** Per-row LSH signature, one int per band (BandBits sign bits) —
    * computed by the native LshBands expression in ONE fused pass per row
    * (the former zip_with+aggregate spelling re-ran an interpreted lambda
    * chain per plane: NumPlanes x d evaluations through the HOF
    * interpreter; the native loop is the same arithmetic in codegen). */
  def bandColumns(emb: Column): Seq[Column] = {
    val bands = VectorFunctions.lshBands(emb, NumPlanes, BandBits)
    (0 until NumBands).map(b => element_at(bands, b + 1).as(s"band_$b"))
  }

  // ----------------------------------------------------- q_embedding_cosine_topk
  // audited-bnlj(q_embedding_cosine_topk): build side = 1-row global-aggregate broadcast — audited in PlanAuditSpec/BnljAudit
  /** Brute-force cosine top-k for the query vector vec_id=0 (exactness
    * baseline; oracle checks the full pipeline incl. the native
    * CosineSimilarity codegen expression). */
  private def cosineTopk(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = Tables.embeddings(s, dir)
    val q = e.filter($"vec_id" === 0).select($"embedding".as("q_emb"))
    e.filter($"vec_id" =!= 0)
      .crossJoin(broadcast(q))
      .select($"vec_id",
        round(VectorFunctions.cosine($"embedding", $"q_emb"), 4).as("cos_sim"))
      .orderBy($"cos_sim".desc, $"vec_id")
      .limit(10)
  }

  private val cosineTopkSql =
    """WITH q AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 0)
      |SELECT e.vec_id,
      |  round(
      |    list_sum(list_transform(generate_series(1, len(e.embedding)),
      |                            i -> CAST(e.embedding[i] AS DOUBLE) * CAST(q.q_emb[i] AS DOUBLE)))
      |    / (sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
      |       * sqrt(list_sum(list_transform(q.q_emb, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))),
      |    4) AS cos_sim
      |FROM embeddings e CROSS JOIN q
      |WHERE e.vec_id <> 0
      |ORDER BY cos_sim DESC, vec_id LIMIT 10""".stripMargin

  // ------------------------------------------------------------------- q_ann_lsh
  /** Directed candidate pairs (vec_a -> vec_b) from banded LSH with
    * single-bit multiprobe. ID-ONLY: the frame carries two longs per row —
    * no embedding array enters any exchange in this subplan (asserted in
    * SimilaritySpec). The probe side explodes each row's band value plus
    * its BandBits single-bit flips; hot buckets are dropped by the
    * window-count skew guard below. */
  def annCandidateIds(e: DataFrame): DataFrame =
    annCandidateIdsWith(e, NumPlanes, BandBits)

  /** Parameterized banded-LSH candidate generation — the tuning dial
    * behind the operating points: fewer bits per band (so more bands
    * from the same plane budget) raises per-band collision probability
    * and band count at once, trading candidate volume for recall.
    * Bucket space 2^bandBits per band; the MaxBucket guard holds at
    * every setting. */
  def annCandidateIdsWith(e: DataFrame, numPlanes: Int,
      bandBits: Int): DataFrame = {
    import e.sparkSession.implicits._
    import org.apache.spark.sql.expressions.Window
    val banded = e.select($"vec_id",
      posexplode(VectorFunctions.lshBands($"embedding", numPlanes, bandBits)))
      .withColumnsRenamed(Map("pos" -> "band", "col" -> "band_val"))
    // skew guard via window over the id-only banded frame: its exchange on
    // (band, band_val) is shared by both join sides below (ReuseExchange),
    // so the signature scan runs ONCE per query
    val kept = banded
      .withColumn("bucket_n",
        count(lit(1)).over(Window.partitionBy($"band", $"band_val")))
      .filter($"bucket_n" <= MaxBucket)
    val recv = kept.select($"band", $"band_val", $"vec_id".as("vec_b"))
    // multiprobe: each vector probes its own bucket and all hamming-1 buckets
    val flips = array((lit(0) +: (0 until bandBits).map(j => lit(1 << j))): _*)
    val probe = kept.select($"vec_id".as("vec_a"), $"band",
      explode(transform(flips, f => $"band_val".bitwiseXOR(f))).as("band_val"))
    probe.join(recv, Seq("band", "band_val"))
      .filter($"vec_a" =!= $"vec_b")
      .select($"vec_a", $"vec_b")
      .distinct()
  }

  /** The SERVING operating point: same 64-plane budget re-cut as 8
    * bands x 8 bits (vs the dedup point's 4 x 16). Per-band collision
    * p = (agreement)^8 instead of ^16 and twice the bands — the
    * natural-regime recall@10 multiplies several-fold while the
    * candidate frame stays id-only and bucket-guarded (2^8 buckets per
    * band: occupancy n/256, linear). q_ann_lsh8_recall10 pins BOTH
    * points, so the recall-vs-candidate-volume dial is measured, not
    * asserted. */
  val TunedBandBits = 8

  def annCandidateIdsTuned(e: DataFrame): DataFrame =
    annCandidateIdsWith(e, NumPlanes, TunedBandBits)

  /** Shared verification tail: ONE payload re-join per side after the
    * id-only candidate generation, cosine only on candidates, then
    * windowed top-k per query vector. */
  private def scoreAndRank(cand: DataFrame, e: DataFrame, topK: Int): DataFrame = {
    import e.sparkSession.implicits._
    import org.apache.spark.sql.expressions.Window
    val emb = e.select($"vec_id", $"embedding")
    val scored = cand
      .join(emb.select($"vec_id".as("vec_a"), $"embedding".as("emb_a")), "vec_a")
      .join(emb.select($"vec_id".as("vec_b"), $"embedding".as("emb_b")), "vec_b")
      .select($"vec_a", $"vec_b",
        round(VectorFunctions.cosine($"emb_a", $"emb_b"), 4).as("cos_sim"))
    val w = Window.partitionBy($"vec_a").orderBy($"cos_sim".desc, $"vec_b")
    scored.withColumn("rank", row_number().over(w))
      .filter($"rank" <= topK)
      .select($"vec_a", $"vec_b", $"cos_sim", $"rank")
      .orderBy($"vec_a", $"rank")
  }

  /** LSH-bucketed ANN: top-k neighbors per vector among multiprobe band
    * collisions. Deterministic; recall vs brute force asserted in
    * SimilaritySpec. */
  def annLsh(s: SparkSession, dir: String, topK: Int = 3): DataFrame = {
    val e = Tables.embeddings(s, dir)
    scoreAndRank(annCandidateIds(e), e, topK)
  }

  // ------------------------------------------------------------------- q_ann_ivf
  /** IVF parameters: 64 deterministic pseudo-random coarse centroids,
    * probe the 4 nearest cells. Cell occupancy ~n/K keeps the
    * within-cell pair step linear in n for fixed K; at a real 100 TB
    * deployment K grows with n (K ~ sqrt(n)) and centroids come from a
    * sampled k-means — the quantizer here is the deterministic stand-in
    * with identical plan shape. */
  val IvfK = 64
  val IvfProbes = 4
  /** Second IVF operating point (the probe dial's other end): same
    * 64-cell quantizer, nprobe 4 → 16. Candidate volume scales ~4× (the
    * probe side emits 4× the (cell, id) rows; the receptor side is
    * unchanged), recall climbs accordingly — `q_ann_ivf16_recall10`
    * pins where, so the recall-vs-cost trade is a MEASURED pair, like
    * LSH's 4×16-vs-8×8 pair. */
  val IvfProbesWide = 16

  /** IVF candidates: each vector is OWNED by its nearest cell (receptor
    * side) and PROBES its `probes` nearest cells — id-only join on the
    * cell id, embeddings never enter the exchange. */
  def ivfCandidateIdsAt(probes: Int)(e: DataFrame): DataFrame = {
    import e.sparkSession.implicits._
    import org.apache.spark.sql.expressions.Window
    val recv0 = e.select($"vec_id".as("vec_b"),
      element_at(VectorFunctions.ivfCells($"embedding", IvfK, 1), 1).as("cell"))
    val recv = recv0
      .withColumn("bucket_n", count(lit(1)).over(Window.partitionBy($"cell")))
      .filter($"bucket_n" <= MaxBucket)
      .select($"cell", $"vec_b")
    val probe = e.select($"vec_id".as("vec_a"),
      explode(VectorFunctions.ivfCells($"embedding", IvfK, probes)).as("cell"))
    probe.join(recv, Seq("cell"))
      .filter($"vec_a" =!= $"vec_b")
      .select($"vec_a", $"vec_b")
      .distinct()
  }

  def ivfCandidateIds(e: DataFrame): DataFrame =
    ivfCandidateIdsAt(IvfProbes)(e)

  /** IVF-bucketed ANN — the second scale path (coarse quantization
    * instead of hashing); same verification tail as annLsh. */
  def annIvf(s: SparkSession, dir: String, topK: Int = 3): DataFrame = {
    val e = Tables.embeddings(s, dir)
    scoreAndRank(ivfCandidateIds(e), e, topK)
  }

  // ------------------------------------- q_ann_lsh_recall / q_ann_ivf_recall
  /** Id offset for planted near-duplicate rows in the recall gates (far
    * above any real vec_id / doc_id at any test scale). */
  val PlantOffset = 1000000L

  /** Recall-gate precondition: planted ids are `id + PlantOffset`, so a
    * corpus with ids at or above the offset would silently collide planted
    * rows with genuine ones (duplicate ids inside the candidate joins, and
    * the `b === a + PlantOffset` hit filter matching coincidental original
    * pairs). Refuse loudly instead — the same contract as the
    * MaxBruteForceRows guards on the O(n²) baselines. */
  def requirePlantable(df: DataFrame, idCol: String, what: String): Unit = {
    val row = df.agg(max(col(idCol))).head()
    val maxId = if (row.isNullAt(0)) -1L else row.getLong(0)
    require(maxId < PlantOffset,
      s"$what plants ids at id + $PlantOffset; corpus max $idCol = $maxId " +
        s"would collide with planted rows — raise PlantOffset for this corpus")
  }

  /** Plant one deterministic near-duplicate per vector: multiplicative
    * noise `x_i * (1 + u_i)`, u_i uniform-ish in [-0.03, 0.03] derived
    * from xxhash64(vec_id, i) — scale-free (independent of embedding
    * normalization), giving cos(x, x') ≈ 0.9997, squarely in the
    * near-dup regime the ANN paths are built for. */
  def plantNearDups(e: DataFrame): DataFrame = {
    import e.sparkSession.implicits._
    val perturbed = transform($"embedding", (x, i) =>
      x * (lit(1.0) +
        (pmod(xxhash64($"vec_id", i), lit(1000)).cast("double") / 500.0 - 1.0) * 0.03))
      .cast("array<float>")
    e.select($"vec_id", $"embedding")
      .unionByName(e.select(($"vec_id" + PlantOffset).as("vec_id"),
        perturbed.as("embedding")))
  }

  /** Per-original-vector plant-hit frame — the shared kernel of the
    * recall gates and rate summaries: ids whose planted near-dup came
    * out of the REAL candidate generator. */
  private def annPlantHits(candGen: DataFrame => DataFrame,
      e: DataFrame): DataFrame = {
    import e.sparkSession.implicits._
    candGen(plantNearDups(e))
      .filter($"vec_b" === $"vec_a" + PlantOffset ||
        $"vec_a" === $"vec_b" + PlantOffset)
      .select(least($"vec_a", $"vec_b").as("vec_id"))
      .distinct()
      .withColumn("__hit", lit(true))
  }

  /** Driver-visible recall gate for a bucketed candidate generator: run
    * the REAL candidate path over the shipped corpus plus planted
    * near-dups and emit a per-query-vector `found` boolean. The oracle
    * knows the expected answer exactly — every planted near-dup found —
    * so a recall miss surfaces as a hash-mismatched CORRECTNESS row
    * instead of living only in SimilaritySpec. The planted frame is 2n
    * rows and the candidate join stays id-only, so the gate has the same
    * scale shape as the path it checks. */
  private def annRecall(candGen: DataFrame => DataFrame)(
      s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = Tables.embeddings(s, dir)
    requirePlantable(e, "vec_id", "annRecall")
    e.select($"vec_id")
      .join(annPlantHits(candGen, e), Seq("vec_id"), "left")
      .select($"vec_id", coalesce($"__hit", lit(false)).as("found"))
      .orderBy($"vec_id")
  }

  private val annRecallSql =
    "SELECT vec_id, TRUE AS found FROM embeddings ORDER BY vec_id"

  /** One-row recall RATE summary per ANN method: (n_plants, n_found,
    * recall_ppm) with ppm integer-exact (BIGINT multiply-then-DIV, no
    * float). The recall gates answer pass/fail per plant; this row is
    * the movement meter — after a parameter change (bands, probes, K)
    * a recall regression shows up as the exact ppm delta, not just a
    * flipped boolean. Oracle expects full recall: ppm = 1,000,000. */
  private def annRecallRate(candGen: DataFrame => DataFrame)(
      s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = Tables.embeddings(s, dir)
    requirePlantable(e, "vec_id", "annRecallRate")
    e.select($"vec_id")
      .join(annPlantHits(candGen, e), Seq("vec_id"), "left")
      .agg(count(lit(1)).as("n_plants"),
        sum(when($"__hit", 1L).otherwise(0L)).as("n_found"))
      .select($"n_plants", $"n_found",
        expr("n_found * 1000000 DIV n_plants").as("recall_ppm"))
  }

  private val annRecallRateSql =
    """SELECT COUNT(*) AS n_plants, COUNT(*) AS n_found,
      |  CAST(1000000 AS BIGINT) AS recall_ppm
      |FROM embeddings""".stripMargin

  // ----------------------------------------- q_ann_lsh / q_ann_ivf (main)
  /** The full ANN query path with a driver-checkable expected answer:
    * plant one near-duplicate per vector (cos ≈ 0.9997 — far above the
    * corpus's natural max pairwise cosine of ~0.5), run the REAL
    * candidate generator + exact-cosine re-scoring + per-query top-1,
    * and emit each original vector's nearest neighbor. The expected
    * answer is pure id arithmetic — the plant wins top-1 for every
    * query — so a candidate-generation miss, a scoring bug, or a
    * ranking tie-break drift all surface as hash-mismatched CORRECTNESS
    * rows. (The previous formulation emitted the raw candidate top-k,
    * which no SQL oracle can replay — the driver recorded it rows-only.)
    * Same scale shape as production ANN: 2n-row id-only candidate join,
    * one payload re-join for scoring. */
  private def annPlantedTop1(candGen: DataFrame => DataFrame)(
      s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = Tables.embeddings(s, dir)
    requirePlantable(e, "vec_id", "annPlantedTop1")
    val planted = plantNearDups(e)
    scoreAndRank(candGen(planted), planted, topK = 1)
      .filter($"vec_a" < PlantOffset)
      .select($"vec_a".as("vec_id"), $"vec_b".as("nn_id"),
        ($"vec_b" === $"vec_a" + PlantOffset).as("nn_is_plant"))
      .orderBy($"vec_id")
  }

  private val annPlantedTop1Sql =
    s"""SELECT vec_id, vec_id + $PlantOffset AS nn_id, TRUE AS nn_is_plant
       |FROM embeddings ORDER BY vec_id""".stripMargin

  // -------------------------------------------------------- q_embedding_quantize
  /** Symmetric int8 quantization of the embedding column — the standard
    * storage/serving compression for vector corpora (4× smaller than
    * float32; ANN candidate generation runs on the int8 side, exact
    * rescoring on the float side). Emits per-vector scale and max
    * reconstruction error plus the structural half-step error bound.
    * Row-local native expression (one fused pass — computing the scale
    * inside a HOF lambda would re-evaluate it per element through the
    * projection-collapse inliner); every arithmetic step is a single IEEE
    * double op in index order, so the DuckDB list_transform spelling
    * reproduces the exact bits and the oracle needs no rounding at all. */
  private def embeddingQuantize(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.embeddings(s, dir)
      .select($"vec_id", VectorFunctions.int8QuantStats($"embedding").as("q"))
      .select($"vec_id", $"q.scale".as("scale"),
        $"q.max_abs_err".as("max_abs_err"),
        // slack factor: the exact-math bound is err <= scale/2; the fp
        // bound needs an ulp of headroom. Both engines compute identical
        // doubles, so the boolean is deterministic either way.
        ($"q.max_abs_err" <= $"q.scale" * 0.5000000005).as("err_ok"))
      .orderBy($"vec_id")
  }

  private val embeddingQuantizeSql =
    """WITH e AS (
      |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |  FROM embeddings),
      |s AS (
      |  SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale
      |  FROM e),
      |r AS (
      |  SELECT vec_id, scale,
      |    CASE WHEN scale = 0 THEN 0.0 ELSE
      |      list_max(list_transform(v, x -> abs(floor(x / scale + 0.5) * scale - x)))
      |    END AS max_abs_err
      |  FROM s)
      |SELECT vec_id, scale, max_abs_err,
      |  max_abs_err <= scale * 0.5000000005 AS err_ok
      |FROM r ORDER BY vec_id""".stripMargin

  // ---------------------------------------------------------- q_hard_negatives
  // audited-bnlj(q_hard_negatives): build side = 1-row global-aggregate broadcast — audited in PlanAuditSpec/BnljAudit
  /** Hard-negative mining for contrastive training data: for every
    * vector, the single most-similar vector with a DIFFERENT label — the
    * pairs that make embedding-model training batches informative.
    *
    * This is the brute-force ORACLE BASELINE (all cross-label pairs,
    * bounded like q_dedup_embedding); the scale formulation is
    * `hardNegativesIvf` below, which routes the same selection through
    * the id-only IVF candidate generator and is spec-asserted against
    * this baseline (candidate-subset bound + pruning actually pruning). */
  private def hardNegatives(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val e = Tables.embeddings(s, dir)
    Dedup.requireBounded(e, "hardNegatives", "hardNegativesIvf")
    val a = e.select($"vec_id".as("vec_a"), $"embedding".as("emb_a"),
      $"label".as("label_a"))
    val b = e.select($"vec_id".as("vec_b"), $"embedding".as("emb_b"),
      $"label".as("label_b"))
    val w = Window.partitionBy($"vec_a").orderBy($"cos_sim".desc, $"vec_b")
    a.join(b, $"label_a" =!= $"label_b")
      .select($"vec_a", $"vec_b",
        round(VectorFunctions.cosine($"emb_a", $"emb_b"), 4).as("cos_sim"))
      .withColumn("rank", row_number().over(w))
      .filter($"rank" === 1)
      .select($"vec_a", $"vec_b".as("hard_neg"), $"cos_sim")
      .orderBy($"vec_a")
  }

  private val hardNegativesSql =
    """WITH p AS (
      |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
      |    round(
      |      list_sum(list_transform(generate_series(1, len(a.embedding)),
      |                              i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
      |      / (sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
      |         * sqrt(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))),
      |      4) AS cos_sim
      |  FROM embeddings a JOIN embeddings b ON a.label <> b.label),
      |r AS (
      |  SELECT vec_a, vec_b, cos_sim,
      |    row_number() OVER (PARTITION BY vec_a
      |                       ORDER BY cos_sim DESC, vec_b) AS rank
      |  FROM p)
      |SELECT vec_a, vec_b AS hard_neg, cos_sim FROM r
      |WHERE rank = 1 ORDER BY vec_a""".stripMargin

  /** Scale path: hard negatives among IVF candidates only — the id-only
    * cell join prunes the pair space from n² to sum(cell²), labels join
    * onto ids (8-byte rows), and the embedding payload is re-joined once
    * for scoring. A candidate-pruned hard negative is at most as similar
    * as the brute-force one (subset property, spec-asserted); at corpus
    * scale that trade is the difference between feasible and not. */
  def hardNegativesIvf(e: DataFrame): DataFrame = {
    import e.sparkSession.implicits._
    val labels = e.select($"vec_id", $"label")
    val cand = ivfCandidateIds(e)
      .join(labels.select($"vec_id".as("vec_a"), $"label".as("label_a")), "vec_a")
      .join(labels.select($"vec_id".as("vec_b"), $"label".as("label_b")), "vec_b")
      .filter($"label_a" =!= $"label_b")
      .select($"vec_a", $"vec_b")
    // same verification tail as the ANN paths — one scoring definition
    scoreAndRank(cand, e, topK = 1)
      .select($"vec_a", $"vec_b".as("hard_neg"), $"cos_sim")
  }

  // -------------------------------------------------------- q_embedding_centroids
  /** Per-label per-dimension centroid of the embedding column — the
    * k-means/IVF-training aggregation shape: posexplode to (row, dim,
    * value), one shuffle keyed on (label, dim), partial+final avg. At
    * corpus scale this is how coarse quantizers are (re)trained; rounded
    * to 6dp so float-summation order can't flake the cross-engine
    * compare (values O(1), groups of hundreds: error ~1e-13). */
  private def embeddingCentroids(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.embeddings(s, dir)
      .select($"label", posexplode($"embedding"))
      .groupBy($"label", ($"pos" + 1).as("dim"))
      .agg(round(avg($"col"), 6).as("centroid"))
      .orderBy($"label", $"dim")
  }

  private val embeddingCentroidsSql =
    """SELECT label, dim, round(avg(v), 6) AS centroid
      |FROM (
      |  SELECT label, unnest(embedding) AS v,
      |         unnest(generate_series(1, len(embedding))) AS dim
      |  FROM embeddings)
      |GROUP BY 1, 2 ORDER BY label, dim""".stripMargin

  // ------------------------------------------------------------- q_gram_matrix
  /** Upper-triangle Gram matrix Σ q·qᵀ over the INT8-QUANTIZED corpus —
    * the accumulation step behind PCA / whitening / covariance stats on
    * an embedding corpus. Quantizing first (same floor(x/scale + 0.5)
    * arithmetic as q_embedding_quantize, identical doubles cross-engine)
    * makes every product and sum INTEGER — the distributed sum is exact
    * and partitioning-invariant, where a float gram accumulation would
    * be merge-order noise in the low bits on every cluster layout.
    *
    * Plan shape: pair contributions are generated ROW-LOCALLY (nested
    * sequence transform → one explode), then partial aggregation
    * collapses each partition to ≤ d(d+1)/2 rows before the single
    * shuffle — i.e. per-partition gram accumulation then merge, the
    * textbook distributed formulation, expressed declaratively. */
  private def gramMatrix(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val v = transform($"embedding", x => x.cast("double"))
    val scaleCol = array_max(transform(v, x => abs(x))) / lit(127.0)
    val q = when(scaleCol === 0,
        transform(v, _ => lit(0L)))
      .otherwise(transform(v, x => floor(x / scaleCol + lit(0.5)).cast("long")))
    val pairs = flatten(transform(sequence(lit(0), size($"q") - 1), i =>
      transform(sequence(i, size($"q") - 1), j =>
        struct(i.as("i"), j.as("j"),
          (element_at($"q", i + 1) * element_at($"q", j + 1)).as("p")))))
    Tables.spread(Tables.embeddings(s, dir))
      .select(q.as("q"))
      .select(explode(pairs).as("c"))
      .groupBy($"c.i".cast("long").as("i"), $"c.j".cast("long").as("j"))
      .agg(sum($"c.p").as("gram"))
      .orderBy($"i", $"j")
  }

  private val gramMatrixSql =
    """WITH e AS (
      |  SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |  FROM embeddings),
      |s AS (
      |  SELECT v, list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale
      |  FROM e),
      |q AS (
      |  SELECT CASE WHEN scale = 0
      |    THEN list_transform(v, x -> CAST(0 AS BIGINT))
      |    ELSE list_transform(v, x -> CAST(floor(x / scale + 0.5) AS BIGINT))
      |  END AS q FROM s)
      |SELECT i - 1 AS i, j - 1 AS j, CAST(SUM(q[i] * q[j]) AS BIGINT) AS gram
      |FROM q,
      |  unnest(generate_series(1, len(q))) t1(i),
      |  unnest(generate_series(i, len(q))) t2(j)
      |GROUP BY 1, 2 ORDER BY i, j""".stripMargin

  // ------------------------------------------------------------ q_jl_project
  // audited-bnlj(q_jl_project): build side = 1-row global-aggregate broadcast — audited in PlanAuditSpec/BnljAudit
  /** Johnson–Lindenstrauss random projection over the QUANTIZED vector
    * corpus — the dimensionality-reduction step that makes massive-scale
    * candidate generation cheap (project 64-d to 16-d, bucket or index
    * in the small space, rescore survivors in the full space). The sign
    * matrix (Achlioptas ±1 construction) derives from md5 of the (in,
    * out) index pair, so any engine regenerates it from nothing.
    *
    * Exactness: projecting FLOAT vectors sums floats in arbitrary order
    * (merge-order-dependent); projecting the int8-QUANTIZED vectors —
    * which the corpus stores anyway (q_embedding_quantize) — makes every
    * dot product exact 64-bit integer arithmetic on any partitioning.
    * The quantization step itself reproduces bit-for-bit cross-engine
    * (single IEEE ops in index order, the q_embedding_quantize design),
    * so floor(x/scale + 0.5) casts to the identical integer everywhere.
    *
    * Scale shape: the sign matrix is d_in × d_out literals generated
    * row-locally inside the lambda — nothing is joined, nothing
    * shuffles; output is one row per (vector, out-dim) pair, and the
    * whole operator is a single scan-projection. */
  val JlOutDims = 16

  private def jlProject(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val dims = s.range(1, JlOutDims + 1).select($"id".cast("int").as("j"))
    Tables.spread(Tables.embeddings(s, dir))
      .select($"vec_id", $"embedding",
        VectorFunctions.int8QuantStats($"embedding").as("q"))
      .select($"vec_id",
        expr("""transform(embedding, x ->
          |  CASE WHEN q.scale = 0D THEN 0L
          |  ELSE CAST(floor(CAST(x AS DOUBLE) / q.scale + 0.5D) AS BIGINT)
          |  END)""".stripMargin).as("qv"))
      .crossJoin(broadcast(dims))
      .select($"vec_id", $"j",
        aggregate(
          transform($"qv", (x, i) => {
            val sign = graft.functions.TextFunctions.md5Lower64(
              concat(lit("jl:"), $"j".cast("string"), lit(":"),
                (i + 1).cast("string"))).bitwiseAND(lit(1L))
            x * when(sign === 1L, lit(1L)).otherwise(lit(-1L))
          }),
          lit(0L), (acc, v) => acc + v).as("y"))
      .orderBy($"vec_id", $"j")
  }

  private val jlProjectSql =
    s"""WITH q AS (
       |  SELECT vec_id,
       |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |sc AS (
       |  SELECT vec_id, v,
       |    list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale
       |  FROM q),
       |qv AS (
       |  SELECT vec_id,
       |    list_transform(v, x -> CASE WHEN scale = 0 THEN 0
       |      ELSE CAST(floor(x / scale + 0.5) AS BIGINT) END) AS qv
       |  FROM sc)
       |SELECT vec_id, CAST(d.j AS INTEGER) AS j,
       |  CAST(list_sum(list_transform(qv, (x, i) ->
       |    x * (CASE WHEN (md5_number_lower(
       |          'jl:' || CAST(d.j AS VARCHAR) || ':' || CAST(i AS VARCHAR))
       |          & 1::UBIGINT) = 1 THEN 1 ELSE -1 END))) AS BIGINT) AS y
       |FROM qv, generate_series(1, $JlOutDims) AS d(j)
       |ORDER BY vec_id, j""".stripMargin

  // -------------------------------------------------------------- q_knn_graph
  // audited-bnlj(q_knn_graph): build side = 1-row global-aggregate broadcast — audited in PlanAuditSpec/BnljAudit
  /** Mutual k-nearest-neighbor graph over the embedding space — the
    * backbone structure of graph-based dedup/clustering (and of
    * HNSW-style index builds): an undirected edge (a, b) exists iff a
    * is in b's top-k AND b is in a's top-k by cosine. Mutuality is the
    * standard symmetric pruning — it kills hub edges (a point near a
    * cluster center lists many neighbors that don't list it back).
    *
    * This query is the bounded exactness baseline: a deterministic
    * ≤500-vector slice (same slice at every sf), brute-force pairs
    * through the SAME scoreAndRank kernel the LSH/IVF ANN paths use,
    * then the mutual filter; ranking compares ROUNDED similarity (ties
    * by id) so rank order is engine-free. The scale path is
    * `mutualKnn(annCandidateIds(e), e)` — id-only LSH candidates in
    * place of the cross join, identical kernel from there on
    * (SimilaritySpec asserts its edges are a subset of this baseline
    * with ≥80% recall on the fixture). */
  val KnnK = 3
  val KnnBound = 500

  /** Mutual-edge filter over any directed top-k frame (vec_a, vec_b,
    * cos_sim, rank): keep (a, b), a < b, present in both directions. */
  def mutualEdges(top: DataFrame): DataFrame = {
    import top.sparkSession.implicits._
    val fwd = top.select($"vec_a", $"vec_b", $"cos_sim")
    val rev = top.select($"vec_b".as("ra"), $"vec_a".as("rb"))
    fwd.join(rev, $"vec_a" === $"ra" && $"vec_b" === $"rb", "left_semi")
      .filter($"vec_a" < $"vec_b")
      .orderBy($"vec_a", $"vec_b")
  }

  /** Scale path: mutual kNN over candidate ids (LSH/IVF), not n². */
  def mutualKnn(cand: DataFrame, e: DataFrame, k: Int = KnnK): DataFrame =
    mutualEdges(scoreAndRank(cand, e, k))

  private def knnGraph(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = Tables.embeddings(s, dir).filter($"vec_id" < KnnBound)
    val ids = e.select($"vec_id")
    val cand = ids.select($"vec_id".as("vec_a"))
      .crossJoin(ids.select($"vec_id".as("vec_b")))
      .filter($"vec_a" =!= $"vec_b")
    mutualKnn(cand, e)
  }

  private val knnGraphSql =
    s"""WITH e AS (SELECT * FROM embeddings WHERE vec_id < $KnnBound),
       |p AS (
       |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       |    round(
       |      list_sum(list_transform(generate_series(1, len(a.embedding)),
       |                              i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
       |      / (sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
       |         * sqrt(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))),
       |      4) AS cos_sim
       |  FROM e a JOIN e b ON a.vec_id <> b.vec_id),
       |r AS (
       |  SELECT vec_a, vec_b, cos_sim,
       |    row_number() OVER (PARTITION BY vec_a
       |                       ORDER BY cos_sim DESC, vec_b) AS rank
       |  FROM p),
       |t AS (SELECT vec_a, vec_b, cos_sim FROM r WHERE rank <= $KnnK)
       |SELECT t.vec_a, t.vec_b, t.cos_sim
       |FROM t JOIN t t2 ON t.vec_a = t2.vec_b AND t.vec_b = t2.vec_a
       |WHERE t.vec_a < t.vec_b
       |ORDER BY t.vec_a, t.vec_b""".stripMargin

  // --------------------------------------------------- q_ann_{lsh,ivf}_mrr
  /** Rank-aware retrieval quality: Mean Reciprocal Rank of the planted
    * near-duplicate through the REAL candidate + exact-rescore + top-10
    * path. Recall says whether the plant was found at all; MRR says
    * where it LANDED — a scoring or tie-break regression that demotes
    * the true neighbor from rank 1 to rank 3 keeps recall at 100% but
    * drops MRR, so it surfaces as an exact hash mismatch. Reciprocal
    * ranks stay integer-exact via the ×2520 trick (2520 = lcm(1..10),
    * so 2520/rank is an integer for every rank the top-10 can emit);
    * the oracle expects the plant at rank 1 for every query —
    * mrr_ppm = 1,000,000 exactly. Same 2n-row id-only scale shape as
    * the recall gates. */
  private def annMrr(candGen: DataFrame => DataFrame)(
      s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = Tables.embeddings(s, dir)
    requirePlantable(e, "vec_id", "annMrr")
    val planted = plantNearDups(e)
    val plantRank = scoreAndRank(candGen(planted), planted, topK = 10)
      .filter($"vec_a" < PlantOffset && $"vec_b" === $"vec_a" + PlantOffset)
      .select($"vec_a".as("vec_id"), $"rank")
    e.select($"vec_id")
      .join(plantRank, Seq("vec_id"), "left")
      .agg(count(lit(1)).as("n_queries"),
        coalesce(sum(expr("2520 DIV rank")), lit(0L)).as("recip_x2520_sum"))
      .select($"n_queries", $"recip_x2520_sum",
        expr("recip_x2520_sum * 1000000 DIV (2520 * n_queries)").as("mrr_ppm"))
  }

  private val annMrrSql =
    """SELECT COUNT(*) AS n_queries,
      |  CAST(COUNT(*) * 2520 AS BIGINT) AS recip_x2520_sum,
      |  CAST(1000000 AS BIGINT) AS mrr_ppm
      |FROM embeddings""".stripMargin

  // ------------------------------------ q_ann_{lsh,ivf,pq}_recall10
  /** Size of the bounded query roster for the natural-regime recall
    * gates (and the broadcast build side of their exact-baseline pair
    * frame — bounded by this constant, never by the corpus). */
  val NatQueryCount = 200

  /** NATURAL-regime recall@10 — the planted gates (`q_ann_*_recall`)
    * measure the near-dup regime (cos ≈ 0.9997, the easy case ANN dedup
    * targets); this row measures what each index family retrieves on the
    * corpus's OWN similarity structure (natural max cosine ≈ 0.5, the
    * hard case): ONE ROW PER ROSTER VECTOR (`NatQueryCount` queries) of
    * (vec_a, n_exact, n_hits) where n_hits = |ANN top-10 ∩ exact
    * brute-force top-10| over the full corpus.
    *
    * Both sides run the SAME scoring kernel (`scoreAndRank`: exact
    * cosine rounded to the 4dp compare grain, ties by id), so the
    * intersection is deterministic on any partitioning; the exact
    * baseline's pair frame is roster × corpus — the broadcast build side
    * is ≤ NatQueryCount rows BY CONSTRUCTION, the bounded-roster BNLJ
    * shape, while the ANN side is the real production candidate path.
    *
    * Oracle: a FULL INDEPENDENT REPLAY of the deterministic index
    * kernels in DuckDB SQL — splitmix64 plane/centroid generation via
    * 64-bit wrapping arithmetic emulated through HUGEINT split-multiply
    * ([[sqlPlanesCte]]), band/cell/code assignment, bucket-guarded
    * candidate joins, the 4dp-rounded cosine ranking, and the exact
    * brute-force top-10, all recomputed engine-independently per query
    * vector. Nothing is pinned: a drift in bands, probes, codebooks,
    * the mix kernel, or the scoring tail lands as a hash-mismatched
    * per-query row. (Until round 10 these oracles pinned measured hit
    * counts per fixture fingerprint; the replay below reproduced every
    * pinned value — 15/15 across 5 families × 3 shipped scales — before
    * the pins were deleted.) */
  // audited-bnlj(q_ann_lsh_recall10): build side = ≤NatQueryCount-row query-roster broadcast — audited in PlanAuditSpec/BnljAudit
  // audited-bnlj(q_ann_ivf_recall10): build side = ≤NatQueryCount-row query-roster broadcast — audited in PlanAuditSpec/BnljAudit
  // audited-bnlj(q_ann_pq_recall10): build side = ≤NatQueryCount-row query-roster broadcast — audited in PlanAuditSpec/BnljAudit
  // audited-bnlj(q_ann_lsh8_recall10): build side = ≤NatQueryCount-row query-roster broadcast — audited in PlanAuditSpec/BnljAudit
  private def annNaturalRecall10(candGen: DataFrame => DataFrame)(
      s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = Tables.embeddings(s, dir)
    val qIds = e.filter($"vec_id" < NatQueryCount).select($"vec_id".as("vec_a"))
    val exactCand = e.select($"vec_id".as("vec_b"))
      .crossJoin(broadcast(qIds))
      .filter($"vec_a" =!= $"vec_b")
      .select($"vec_a", $"vec_b")
    val exact10 = scoreAndRank(exactCand, e, topK = 10)
    val ann10 = scoreAndRank(candGen(e), e, topK = 10)
      .filter($"vec_a" < NatQueryCount)
    exact10
      .join(ann10.select($"vec_a", $"vec_b", lit(1L).as("__hit")),
        Seq("vec_a", "vec_b"), "left")
      .groupBy($"vec_a")
      .agg(count(lit(1)).as("n_exact"),
        coalesce(sum($"__hit"), lit(0L)).as("n_hits"))
      .orderBy($"vec_a")
  }

  // ---- DuckDB replay of the deterministic index kernels (oracle side) ----

  /** 64-bit WRAPPING multiply in DuckDB SQL: operand `a` (a UBIGINT
    * expression) times constant `c`, mod 2^64 — the JVM `Long` `*`
    * semantics DuckDB's checked arithmetic lacks. Split 32/32: the full
    * 64×64 product can exceed HUGEINT's 2^127−1, so the cross terms
    * reduce mod 2^32 BEFORE the 32-bit shift and only lo×lo (< 2^64)
    * plus the reduced-mid shift (< 2^64) meet in HUGEINT (< 2^65).
    * Validated bit-exact vs `TextImpl.mix64` over the plane-seed
    * domain at all three shipped scales. */
  private def sqlWrapMul(a: String, c: Long): String = {
    val lo = c & 0xFFFFFFFFL
    val hi = c >>> 32
    s"CAST((CAST(($a & 4294967295::UBIGINT) * $lo::UBIGINT AS HUGEINT)" +
      s" + CAST(((($a & 4294967295::UBIGINT) * $hi::UBIGINT) % 4294967296::UBIGINT" +
      s" + (($a >> 32) * $lo::UBIGINT) % 4294967296::UBIGINT) % 4294967296::UBIGINT AS HUGEINT)" +
      s" * 4294967296) % 18446744073709551616 AS UBIGINT)"
  }

  /** CTE generating the deterministic plane/centroid matrix as one
    * ordered DOUBLE list per plane — the engine-independent twin of
    * `VectorImpl.planeComponent`: splitmix64 of the (plane, dim) seed
    * (wrapping add through HUGEINT mod 2^64, the two wrapping multiplies
    * via [[sqlWrapMul]], xor-shifts on UBIGINT — logical, like Long
    * `>>>`), then `(h >>> 11) / 2^53 * 2 − 1` in the exact IEEE op
    * order of the JVM kernel. `planeBase` offsets into the centroid
    * seed space (`1 << 20`, see `VectorImpl.centroidComponent`);
    * `dimExpr` is evaluated against one embedding row (dynamic
    * dimension, like the native kernel's `size(ws)`). */
  private def sqlPlanesCte(name: String, nPlanes: Int, dimExpr: String,
      planeBase: Long = 0L): String = {
    val m1 = sqlWrapMul("z1", 0xbf58476d1ce4e5b9L)
    val m2 = sqlWrapMul("z2", 0x94d049bb133111ebL)
    s"""$name AS MATERIALIZED (
       |  SELECT plane,
       |    list(CAST(hv >> 11 AS DOUBLE) / 9007199254740992.0 * 2.0 - 1.0
       |         ORDER BY dim) AS pl
       |  FROM (
       |    SELECT plane, dim, xor(x3, x3 >> 31) AS hv FROM (
       |      SELECT plane, dim, $m2 AS x3 FROM (
       |        SELECT plane, dim, xor(x2, x2 >> 27) AS z2 FROM (
       |          SELECT plane, dim, $m1 AS x2 FROM (
       |            SELECT plane, dim, xor(x1, x1 >> 30) AS z1 FROM (
       |              SELECT plane, dim,
       |                CAST((CAST(CAST(plane + $planeBase AS BIGINT)*131071
       |                         + CAST(dim AS BIGINT)*524287 + 17 AS HUGEINT)
       |                      + 11400714819323198485)
       |                     % 18446744073709551616 AS UBIGINT) AS x1
       |              FROM generate_series(0, ${nPlanes - 1}) g1(plane)
       |              CROSS JOIN (SELECT unnest(generate_series(1, $dimExpr)) - 1
       |                            AS dim
       |                          FROM (SELECT embedding FROM embeddings LIMIT 1))
       |                         g2))))))
       |  GROUP BY plane)""".stripMargin
  }

  /** The scoring-kernel twin: 4dp-rounded cosine, both list_sums in the
    * native loop's index order (the established rrfSql spelling). */
  private def sqlCosine(a: String, b: String): String =
    s"""round(
       |    list_sum(list_transform(generate_series(1, len($a)),
       |      i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)))
       |    / (sqrt(list_sum(list_transform($a, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
       |       * sqrt(list_sum(list_transform($b, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))),
       |    4)""".stripMargin

  /** Shared recall tail: given a `cand(vec_a, vec_b)` CTE (roster-
    * filtered ANN candidates), score + rank both the ANN side and the
    * exact roster×corpus brute force with the same kernel and emit the
    * per-query (vec_a, n_exact, n_hits) frame the Spark side produces. */
  private def sqlRecall10Tail: String =
    s"""annscored AS MATERIALIZED (
       |  SELECT c.vec_a, c.vec_b, ${sqlCosine("ea.embedding", "eb.embedding")} AS cos_sim
       |  FROM cand c JOIN embeddings ea ON ea.vec_id = c.vec_a
       |              JOIN embeddings eb ON eb.vec_id = c.vec_b),
       |ann10 AS (SELECT vec_a, vec_b FROM (
       |  SELECT vec_a, vec_b,
       |    ROW_NUMBER() OVER (PARTITION BY vec_a ORDER BY cos_sim DESC, vec_b) AS rk
       |  FROM annscored) WHERE rk <= 10),
       |exactscored AS MATERIALIZED (
       |  SELECT q.vec_id AS vec_a, e.vec_id AS vec_b,
       |    ${sqlCosine("q.embedding", "e.embedding")} AS cos_sim
       |  FROM embeddings q CROSS JOIN embeddings e
       |  WHERE q.vec_id < $NatQueryCount AND e.vec_id <> q.vec_id),
       |exact10 AS (SELECT vec_a, vec_b FROM (
       |  SELECT vec_a, vec_b,
       |    ROW_NUMBER() OVER (PARTITION BY vec_a ORDER BY cos_sim DESC, vec_b) AS rk
       |  FROM exactscored) WHERE rk <= 10)
       |SELECT x.vec_a, CAST(COUNT(*) AS BIGINT) AS n_exact,
       |  CAST(SUM(CASE WHEN a.vec_b IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_hits
       |FROM exact10 x LEFT JOIN ann10 a ON a.vec_a = x.vec_a AND a.vec_b = x.vec_b
       |GROUP BY x.vec_a ORDER BY x.vec_a""".stripMargin

  /** Independent replay of `annCandidateIdsWith(e, nPlanes, bits)` +
    * recall tail: regenerate the planes, compute each vector's banded
    * sign signature (integer bit-OR as a SUM of disjoint powers of
    * two), apply the MaxBucket guard over the FULL corpus, join probe
    * (own bucket + all hamming-1 flips) to receptor buckets, then
    * score/rank/intersect. */
  private def lshRecall10Sql(nPlanes: Int, bits: Int): String = {
    val flips = (0 +: (0 until bits).map(1 << _)).mkString(", ")
    s"""WITH ${sqlPlanesCte("planes", nPlanes, "len(embedding)")},
       |sigs AS MATERIALIZED (
       |  SELECT e.vec_id, CAST(p.plane // $bits AS INTEGER) AS band,
       |    CAST(SUM(CASE WHEN list_sum(list_transform(generate_series(1, len(e.embedding)),
       |          i -> CAST(e.embedding[i] AS DOUBLE) * p.pl[i])) > 0
       |        THEN 1 << (p.plane % $bits) ELSE 0 END) AS BIGINT) AS band_val
       |  FROM embeddings e CROSS JOIN planes p
       |  GROUP BY e.vec_id, p.plane // $bits),
       |kept AS MATERIALIZED (
       |  SELECT vec_id, band, band_val FROM (
       |    SELECT vec_id, band, band_val,
       |      COUNT(*) OVER (PARTITION BY band, band_val) AS n
       |    FROM sigs) WHERE n <= $MaxBucket),
       |cand AS (
       |  SELECT DISTINCT p.vec_id AS vec_a, r.vec_id AS vec_b
       |  FROM kept p CROSS JOIN (SELECT unnest([$flips]) AS f) fl
       |  JOIN kept r ON r.band = p.band
       |    AND r.band_val = xor(p.band_val, CAST(fl.f AS BIGINT))
       |  WHERE p.vec_id <> r.vec_id AND p.vec_id < $NatQueryCount),
       |$sqlRecall10Tail""".stripMargin
  }

  /** Independent replay of `ivfCandidateIdsAt(probes)` + recall tail:
    * regenerate the centroids (seed space `1 << 20`), rank cells per
    * vector by dot (ties → lowest cell, the kernel's strict-max loop),
    * receptor = bucket-guarded top-1 cell, probe = roster's top-nprobe
    * cells. */
  private def ivfRecall10Sql(k: Int, nprobe: Int): String =
    s"""WITH ${sqlPlanesCte("cents", k, "len(embedding)", 1L << 20)},
       |dots AS MATERIALIZED (
       |  SELECT e.vec_id, c.plane AS cell,
       |    ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
       |      list_sum(list_transform(generate_series(1, len(e.embedding)),
       |        i -> CAST(e.embedding[i] AS DOUBLE) * c.pl[i])) DESC, c.plane) AS rk
       |  FROM embeddings e CROSS JOIN cents c),
       |recv AS MATERIALIZED (
       |  SELECT cell, vec_id AS vec_b FROM (
       |    SELECT cell, vec_id, COUNT(*) OVER (PARTITION BY cell) AS n
       |    FROM dots WHERE rk = 1) WHERE n <= $MaxBucket),
       |cand AS (
       |  SELECT DISTINCT p.vec_id AS vec_a, r.vec_b
       |  FROM dots p JOIN recv r ON r.cell = p.cell
       |  WHERE p.rk <= $nprobe AND p.vec_id <> r.vec_b
       |    AND p.vec_id < $NatQueryCount),
       |$sqlRecall10Tail""".stripMargin

  /** Independent replay of `pqCandidateIds` + recall tail: per-subspace
    * codes from the same centroid family over the sliced dimension
    * range (subscript arithmetic instead of list slicing — identical
    * index order to the kernel's sliced loop), bucket guard per
    * (m, code), candidates = pairs sharing ≥ minShared codes. */
  private[operators] def pqRecall10Sql(mCnt: Int, k: Int, minShared: Int): String =
    s"""WITH ${sqlPlanesCte("cents", k, s"len(embedding) // $mCnt", 1L << 20)},
       |codes AS MATERIALIZED (
       |  SELECT vec_id, m, cell AS code FROM (
       |    SELECT e.vec_id, ms.m, c.plane AS cell,
       |      ROW_NUMBER() OVER (PARTITION BY e.vec_id, ms.m ORDER BY
       |        list_sum(list_transform(generate_series(1, len(e.embedding) // $mCnt),
       |          i -> CAST(e.embedding[ms.m * (len(e.embedding) // $mCnt) + i]
       |                 AS DOUBLE) * c.pl[i])) DESC, c.plane) AS rk
       |    FROM embeddings e
       |    CROSS JOIN (SELECT unnest(range(0, $mCnt)) AS m) ms
       |    CROSS JOIN cents c) WHERE rk = 1),
       |kept AS MATERIALIZED (
       |  SELECT vec_id, m, code FROM (
       |    SELECT vec_id, m, code, COUNT(*) OVER (PARTITION BY m, code) AS n
       |    FROM codes) WHERE n <= $MaxBucket),
       |cand AS (
       |  SELECT vec_a, vec_b FROM (
       |    SELECT p.vec_id AS vec_a, r.vec_id AS vec_b, COUNT(*) AS n_shared
       |    FROM kept p JOIN kept r ON r.m = p.m AND r.code = p.code
       |    WHERE p.vec_id <> r.vec_id AND p.vec_id < $NatQueryCount
       |    GROUP BY 1, 2) WHERE n_shared >= $minShared),
       |$sqlRecall10Tail""".stripMargin

  // ----------------------------------------------------------------- q_ann_pq
  /** Product quantization — the third ANN index family next to LSH and
    * IVF (FAISS's workhorse): the embedding splits into PqM contiguous
    * subvectors, each quantized to the nearest of PqK deterministic
    * centroids (the IVF quantizer applied per SUBSPACE — same
    * deterministic centroid family, so no new kernel and no RNG; real
    * deployments train per-subspace codebooks with sampled k-means, and
    * the plan shape is identical). Codes are 4x log2(16) = 16 bits per
    * vector — a 128x compression of a 64-dim float32 embedding. The
    * candidate rule is code-block collision: two vectors are candidates
    * when >= PqMinShared of their PqM codes agree in the same subspace —
    * the PQ analogue of MinHash banding — and the same verified-recall /
    * MRR gates as LSH and IVF run over it with the planted expected
    * answer as oracle.
    *
    * Scale shape: codes are id-only (vec_id, m, code) rows — embeddings
    * never ride the exchange; the per-(m, code) bucket guard drops
    * degenerate hot cells; the shared >= threshold is one count
    * aggregation over the collision pairs, exactly the banding plan. */
  val PqM = 4
  val PqK = 16
  val PqMinShared = 2

  /** Per-subspace PQ code array: element m = nearest-centroid id of the
    * m-th contiguous subvector (dynamic subvector width size/PqM — no
    * plan-time dimension constant). Shared kernel with the SQL face's
    * `graft_pq_codes` (one definition in VectorFunctions). */
  def pqCodes(emb: Column): Column =
    VectorFunctions.pqCodes(emb, PqM, PqK)

  /** Directed candidate pairs from PQ code-block collisions (>=
    * PqMinShared of PqM subspace codes equal). Mirrors annCandidateIds:
    * id-only frames, per-bucket skew guard, distinct pairs. */
  def pqCandidateIds(e: DataFrame): DataFrame = {
    import e.sparkSession.implicits._
    import org.apache.spark.sql.expressions.Window
    val coded = e.select($"vec_id",
        posexplode(pqCodes($"embedding")).as(Seq("m", "code")))
      .withColumn("bucket_n",
        count(lit(1)).over(Window.partitionBy($"m", $"code")))
      .filter($"bucket_n" <= MaxBucket)
    val recv = coded.select($"m", $"code", $"vec_id".as("vec_b"))
    val probe = coded.select($"m", $"code", $"vec_id".as("vec_a"))
    probe.join(recv, Seq("m", "code"))
      .filter($"vec_a" =!= $"vec_b")
      .groupBy($"vec_a", $"vec_b")
      .agg(count(lit(1)).as("n_shared"))
      .filter($"n_shared" >= PqMinShared)
      .select($"vec_a", $"vec_b")
  }

  // --------------------------------------------------- q_ann_ivfpq_recall10
  /** IVF-PQ composition — the production ANN index shape (FAISS
    * IndexIVFPQ; Jégou et al. 2011): the coarse quantizer ROUTES and
    * the product codes RE-SCORE inside the routed cells. Routing runs
    * WIDE (nprobe [[IvfProbesWide]] — the recall end of the probe dial)
    * and the PQ prune then keeps only routed pairs agreeing on ≥
    * [[IvfPqMinShared]] of the [[PqM]] subspace codes — the
    * asymmetric-distance-style cheap filter that makes the within-cell
    * scan affordable when cells are millions of vectors. So the
    * composition buys nprobe-16's routing recall at a fraction of its
    * candidate volume: by construction its candidate set is a SUBSET of
    * q_ann_ivf16's and (measured, Round8OpsSpec) a SUPERSET in recall of
    * the nprobe-4 single, landing recall@10 between IVF-alone and exact.
    *
    * No bucket guard on the code agreement here (unlike pqCandidateIds):
    * the routing already bucket-guarded the cells, and the code join is
    * per-routed-pair × PqM rows — there is no collision-pair explosion
    * for a hot code to cause. The oracle replays routing, codes, the
    * agreement count and the scoring tail fully independently. */
  val IvfPqMinShared = 1

  def ivfPqCandidateIds(e: DataFrame): DataFrame = {
    import e.sparkSession.implicits._
    val routed = ivfCandidateIdsAt(IvfProbesWide)(e)
    val codes = e.select($"vec_id",
      posexplode(pqCodes($"embedding")).as(Seq("m", "code")))
    routed
      .join(codes.select($"vec_id".as("vec_a"), $"m",
        $"code".as("code_a")), Seq("vec_a"))
      .join(codes.select($"vec_id".as("vec_b"), $"m",
        $"code".as("code_b")), Seq("vec_b", "m"))
      .filter($"code_a" === $"code_b")
      .groupBy($"vec_a", $"vec_b")
      .agg(count(lit(1)).as("n_shared"))
      .filter($"n_shared" >= IvfPqMinShared)
      .select($"vec_a", $"vec_b")
  }

  /** Independent replay of [[ivfPqCandidateIds]] + recall tail: the
    * ivfRecall10Sql routing block (nprobe-wide) intersected with the
    * pqRecall10Sql code block (guardless, per the composition's
    * contract), agreement counted per routed pair. */
  private def ivfPqRecall10Sql(k: Int, nprobe: Int, mCnt: Int, pqK: Int,
      minShared: Int): String =
    s"""WITH ${sqlPlanesCte("cents", k, "len(embedding)", 1L << 20)},
       |dots AS MATERIALIZED (
       |  SELECT e.vec_id, c.plane AS cell,
       |    ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
       |      list_sum(list_transform(generate_series(1, len(e.embedding)),
       |        i -> CAST(e.embedding[i] AS DOUBLE) * c.pl[i])) DESC, c.plane) AS rk
       |  FROM embeddings e CROSS JOIN cents c),
       |recv AS MATERIALIZED (
       |  SELECT cell, vec_id AS vec_b FROM (
       |    SELECT cell, vec_id, COUNT(*) OVER (PARTITION BY cell) AS n
       |    FROM dots WHERE rk = 1) WHERE n <= $MaxBucket),
       |routed AS (
       |  SELECT DISTINCT p.vec_id AS vec_a, r.vec_b
       |  FROM dots p JOIN recv r ON r.cell = p.cell
       |  WHERE p.rk <= $nprobe AND p.vec_id <> r.vec_b
       |    AND p.vec_id < $NatQueryCount),
       |${sqlPlanesCte("pqcents", pqK, s"len(embedding) // $mCnt", 1L << 20)},
       |codes AS MATERIALIZED (
       |  SELECT vec_id, m, cell AS code FROM (
       |    SELECT e.vec_id, ms.m, c.plane AS cell,
       |      ROW_NUMBER() OVER (PARTITION BY e.vec_id, ms.m ORDER BY
       |        list_sum(list_transform(generate_series(1, len(e.embedding) // $mCnt),
       |          i -> CAST(e.embedding[ms.m * (len(e.embedding) // $mCnt) + i]
       |                 AS DOUBLE) * c.pl[i])) DESC, c.plane) AS rk
       |    FROM embeddings e
       |    CROSS JOIN (SELECT unnest(range(0, $mCnt)) AS m) ms
       |    CROSS JOIN pqcents c) WHERE rk = 1),
       |cand AS (
       |  SELECT vec_a, vec_b FROM (
       |    SELECT r.vec_a, r.vec_b, COUNT(*) AS n_shared
       |    FROM routed r
       |    JOIN codes ca ON ca.vec_id = r.vec_a
       |    JOIN codes cb ON cb.vec_id = r.vec_b AND cb.m = ca.m
       |    WHERE ca.code = cb.code
       |    GROUP BY 1, 2) WHERE n_shared >= $minShared),
       |$sqlRecall10Tail""".stripMargin

  // --------------------------------------------------------------------- q_rrf
  // audited-bnlj(q_rrf): build side = 1-row query-vector broadcast — audited in PlanAuditSpec/BnljAudit
  /** Reciprocal rank fusion — the standard hybrid-retrieval combiner:
    * the BM25 lexical ranking (TextAnalysis.bm25Score, fixed term
    * query) and the embedding-cosine semantic ranking (query vector
    * vec_id = 0) each contribute 1/(60 + rank) for their top-50, and
    * documents are re-ranked by the sum. Ranks are deterministic
    * (score DESC, doc_id; cosine at the established 4dp compare grain)
    * and the fused score is a two-term IEEE sum in fixed order — no
    * rounding needed for the oracle hash. Documents outside a list
    * contribute 0 from it (the standard RRF convention).
    *
    * Scale shape: both rankers end in TakeOrderedAndProject top-50s;
    * each 50-row frame collapses to ONE row via sort_array +
    * posexplode for rank assignment (no unpartitioned window), and the
    * fusion is a full outer join of two 50-row frames. */
  val RrfTopK = 50
  val RrfC = 60

  /** (doc_id, 1-based rank) of a <=k-row frame ordered by (skey asc,
    * doc_id asc) — windowless rank via single-row array collapse. */
  private def rankByCollapse(top: DataFrame, rankCol: String): DataFrame = {
    import top.sparkSession.implicits._
    top.agg(sort_array(collect_list(struct($"skey", $"doc_id"))).as("a"))
      .select(posexplode($"a"))
      .select($"col.doc_id".as("doc_id"),
        ($"pos" + 1).cast("long").as(rankCol))
  }

  private def rrf(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val lexTop = TextAnalysis
      .bm25Score(Tables.documents(s, dir), TextAnalysis.Bm25Terms)
      .select((-$"score").as("skey"), $"doc_id")
      .orderBy($"skey", $"doc_id").limit(RrfTopK)
    val e = Tables.embeddings(s, dir)
    val q = e.filter($"vec_id" === 0).select($"embedding".as("q_emb"))
    val semTop = e.filter($"vec_id" =!= 0)
      .crossJoin(broadcast(q))
      .select(
        (-round(VectorFunctions.cosine($"embedding", $"q_emb"), 4)).as("skey"),
        $"vec_id".as("doc_id"))
      .orderBy($"skey", $"doc_id").limit(RrfTopK)
    rankByCollapse(lexTop, "rank_lex")
      .join(rankByCollapse(semTop, "rank_sem"), Seq("doc_id"), "full_outer")
      .select($"doc_id", $"rank_lex", $"rank_sem",
        (coalesce(lit(1.0) / ($"rank_lex" + RrfC), lit(0.0)) +
          coalesce(lit(1.0) / ($"rank_sem" + RrfC), lit(0.0))).as("rrf_score"))
      .orderBy($"rrf_score".desc, $"doc_id")
      .limit(20)
  }

  private val rrfSql =
    s"""WITH lex AS (
       |  SELECT doc_id, ROW_NUMBER() OVER (ORDER BY score DESC, doc_id)
       |      AS rank_lex
       |  FROM ${TextAnalysis.bm25ScoredSubquerySql} AS scored
       |  ORDER BY score DESC, doc_id LIMIT $RrfTopK),
       |qv AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 0),
       |cos AS (
       |  SELECT e.vec_id AS doc_id,
       |    round(
       |      list_sum(list_transform(generate_series(1, len(e.embedding)),
       |        i -> CAST(e.embedding[i] AS DOUBLE) * CAST(qv.q_emb[i] AS DOUBLE)))
       |      / (sqrt(list_sum(list_transform(e.embedding,
       |            x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
       |         * sqrt(list_sum(list_transform(qv.q_emb,
       |            x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 4) AS c
       |  FROM embeddings e CROSS JOIN qv WHERE e.vec_id <> 0),
       |sem AS (
       |  SELECT doc_id, ROW_NUMBER() OVER (ORDER BY c DESC, doc_id)
       |      AS rank_sem
       |  FROM cos ORDER BY c DESC, doc_id LIMIT $RrfTopK)
       |SELECT COALESCE(l.doc_id, s.doc_id) AS doc_id,
       |  l.rank_lex, s.rank_sem,
       |  COALESCE(1.0e0 / (l.rank_lex + $RrfC), 0.0e0)
       |    + COALESCE(1.0e0 / (s.rank_sem + $RrfC), 0.0e0) AS rrf_score
       |FROM lex l FULL OUTER JOIN sem s ON l.doc_id = s.doc_id
       |ORDER BY rrf_score DESC, doc_id LIMIT 20""".stripMargin

  // Natural-regime recall context (measured, now verified live by the
  // independent replay oracles rather than pinned): the ordering
  // LSH < PQ < IVF is the honest story on natural-cosine structure at
  // these budgets — 4×16-bit sign bands + 1-bit multiprobe collide
  // reliably only in the near-dup regime (recall@10 ≈ 1.2-2%), 2-of-4
  // shared PQ codes ≈ 10-12%, 4-of-64 probed IVF cells ≈ 18-22%; the
  // re-cut 8×8 LSH point reaches ≈ 56-66% and nprobe=16 IVF ≈ 52-57%.
  // Round8OpsSpec asserts these floors and orderings on the LIVE
  // per-query frames.

  val all: Seq[NamedQuery] = Seq(
    NamedQuery("q_rrf", rrf, Some(rrfSql), bench = true),
    NamedQuery("q_knn_graph", knnGraph, Some(knnGraphSql)),
    NamedQuery("q_jl_project", jlProject, Some(jlProjectSql), bench = true),
    NamedQuery("q_gram_matrix", gramMatrix, Some(gramMatrixSql), bench = true),
    // q_hard_negatives is the deliberate bounded O(n²) oracle baseline for
    // hardNegativesIvf — benching it would time the brute force, not an
    // engine path (same rationale as q_dedup_embedding)
    NamedQuery("q_hard_negatives", hardNegatives, Some(hardNegativesSql)),
    NamedQuery("q_embedding_quantize", embeddingQuantize,
      Some(embeddingQuantizeSql), bench = true),
    NamedQuery("q_embedding_centroids", embeddingCentroids,
      Some(embeddingCentroidsSql), bench = true),
    NamedQuery("q_embedding_cosine_topk", cosineTopk, Some(cosineTopkSql), bench = true),
    NamedQuery("q_ann_lsh", annPlantedTop1(annCandidateIds),
      Some(annPlantedTop1Sql), bench = true),
    NamedQuery("q_ann_ivf", annPlantedTop1(ivfCandidateIds),
      Some(annPlantedTop1Sql), bench = true),
    NamedQuery("q_ann_lsh_recall", annRecall(annCandidateIds),
      Some(annRecallSql), bench = true),
    NamedQuery("q_ann_ivf_recall", annRecall(ivfCandidateIds),
      Some(annRecallSql), bench = true),
    // rate rows ride the same kernel as the recall gates — unbenched
    NamedQuery("q_ann_lsh_rate", annRecallRate(annCandidateIds),
      Some(annRecallRateSql)),
    NamedQuery("q_ann_ivf_rate", annRecallRate(ivfCandidateIds),
      Some(annRecallRateSql)),
    NamedQuery("q_ann_lsh_mrr", annMrr(annCandidateIds), Some(annMrrSql),
      bench = true),
    // benched for symmetry with q_ann_lsh_mrr: same MRR kernel over the
    // IVF candidate path, so the bench covers both index families
    NamedQuery("q_ann_ivf_mrr", annMrr(ivfCandidateIds), Some(annMrrSql),
      bench = true),
    // the PQ family rides the same planted gates as LSH and IVF
    NamedQuery("q_ann_pq_recall", annRecall(pqCandidateIds),
      Some(annRecallSql), bench = true),
    NamedQuery("q_ann_pq_rate", annRecallRate(pqCandidateIds),
      Some(annRecallRateSql)),
    NamedQuery("q_ann_pq_mrr", annMrr(pqCandidateIds), Some(annMrrSql),
      bench = true),
    // natural-regime recall@10 rows — verified by a FULL independent
    // DuckDB replay of the index kernels (see annNaturalRecall10
    // Scaladoc); benched: the ANN side is the real production candidate
    // path and the exact side is roster-bounded, so the timing reflects
    // engine work, not an unbounded brute force
    NamedQuery("q_ann_lsh_recall10", annNaturalRecall10(annCandidateIds),
      Some(lshRecall10Sql(NumPlanes, BandBits)), bench = true),
    NamedQuery("q_ann_ivf_recall10", annNaturalRecall10(ivfCandidateIds),
      Some(ivfRecall10Sql(IvfK, IvfProbes)), bench = true),
    NamedQuery("q_ann_pq_recall10", annNaturalRecall10(pqCandidateIds),
      Some(pqRecall10Sql(PqM, PqK, PqMinShared)), bench = true),
    NamedQuery("q_ann_lsh8_recall10", annNaturalRecall10(annCandidateIdsTuned),
      Some(lshRecall10Sql(NumPlanes, TunedBandBits)), bench = true),
    // audited-bnlj(q_ann_ivf16_recall10): build side = ≤NatQueryCount-row query-roster broadcast — audited in PlanAuditSpec/BnljAudit
    NamedQuery("q_ann_ivf16_recall10",
      annNaturalRecall10(ivfCandidateIdsAt(IvfProbesWide)),
      Some(ivfRecall10Sql(IvfK, IvfProbesWide)), bench = true),
    // audited-bnlj(q_ann_ivfpq_recall10): build side = ≤NatQueryCount-row query-roster broadcast — audited in PlanAuditSpec/BnljAudit
    NamedQuery("q_ann_ivfpq_recall10", annNaturalRecall10(ivfPqCandidateIds),
      Some(ivfPqRecall10Sql(IvfK, IvfProbesWide, PqM, PqK, IvfPqMinShared)),
      bench = true))
}
