package graft.operators

import graft.{NamedQuery, Tables}
import graft.functions.{TextImpl, VectorFunctions}
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
  *    OR-amplification — signatures are computed scan-side, candidates
  *    come from equi-joining on (band, bandBits), cosine is verified only
  *    within buckets. This is the all-pairs / large-query-set path: cost
  *    ~ sum(bucket^2) instead of n^2.
  */
object Similarity {

  /** Deterministic pseudo-random hyperplane component for (plane, dim):
    * splitmix64 of the index pair mapped to (-1, 1). No RNG state — every
    * executor regenerates identical planes, nothing is shipped. */
  def planeComponent(plane: Int, dim: Int): Double = {
    val h = TextImpl.mix64(plane.toLong * 131071L + dim.toLong * 524287L + 17L)
    // top 53 bits -> [0,1) -> (-1,1)
    (h >>> 11).toDouble / (1L << 53).toDouble * 2.0 - 1.0
  }

  val NumPlanes = 24
  val BandBits = 6 // 4 bands of 6 bits -> 64 buckets per band

  /** Dot product of an embedding column with a constant hyperplane,
    * spelled with built-in higher-order functions (zip_with + aggregate)
    * so it stays codegen-friendly and needs no custom state. */
  private def planeDot(emb: Column, plane: Int, d: Int): Column = {
    val planeArr = array((0 until d).map(i => lit(planeComponent(plane, i))): _*)
    aggregate(
      zip_with(emb, planeArr, (x, h) => x.cast("double") * h),
      lit(0.0), (acc, x) => acc + x)
  }

  /** Per-row LSH signature bits, one int per band (BandBits sign bits). */
  def bandColumns(emb: Column, d: Int): Seq[Column] = {
    val bits = (0 until NumPlanes).map(p => when(planeDot(emb, p, d) > 0, 1).otherwise(0))
    (0 until NumPlanes / BandBits).map { band =>
      (0 until BandBits).map(j => bits(band * BandBits + j) * (1 << j))
        .reduce(_ + _).as(s"band_$band")
    }
  }

  // ----------------------------------------------------- q_embedding_cosine_topk
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
  /** LSH-bucketed ANN: top-3 neighbors per vector among candidates that
    * collide in >=1 band. Deterministic; recall vs brute force asserted
    * in SimilaritySpec. */
  def annLsh(s: SparkSession, dir: String, dim: Int = 64, topK: Int = 3): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val e = Tables.embeddings(s, dir)
    val sig = e.select(($"vec_id" +: $"embedding" +: bandColumns($"embedding", dim)): _*)
    val numBands = NumPlanes / BandBits
    val banded = sig.select($"vec_id", $"embedding",
      posexplode(array((0 until numBands).map(b => col(s"band_$b")): _*)))
      .withColumnsRenamed(Map("pos" -> "band", "col" -> "band_val"))
    val l = banded.select($"band", $"band_val", $"vec_id".as("vec_a"), $"embedding".as("emb_a"))
    val r = banded.select($"band", $"band_val", $"vec_id".as("vec_b"), $"embedding".as("emb_b"))
    val cand = l.join(r, Seq("band", "band_val"))
      .filter($"vec_a" =!= $"vec_b")
      .select($"vec_a", $"vec_b", $"emb_a", $"emb_b")
      .distinct()
    val scored = cand.select($"vec_a", $"vec_b",
      round(VectorFunctions.cosine($"emb_a", $"emb_b"), 4).as("cos_sim"))
    val w = Window.partitionBy($"vec_a").orderBy($"cos_sim".desc, $"vec_b")
    scored.withColumn("rank", row_number().over(w))
      .filter($"rank" <= topK)
      .select($"vec_a", $"vec_b", $"cos_sim", $"rank")
      .orderBy($"vec_a", $"rank")
  }

  val all: Seq[NamedQuery] = Seq(
    NamedQuery("q_embedding_cosine_topk", cosineTopk, Some(cosineTopkSql), bench = true),
    NamedQuery("q_ann_lsh", (s, d) => annLsh(s, d), None, bench = true))
}
