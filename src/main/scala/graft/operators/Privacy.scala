package graft.operators

import graft.{NamedQuery, Tables}
import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Differential-privacy release mechanics, exact-integer and
  * cross-engine replayable.
  *
  * Production DP noise is drawn fresh per release; a correctness
  * harness needs the OPPOSITE — noise both engines can replay
  * bit-for-bit. The binomial mechanism does that here: noise =
  * popcount(md5(key)) − 32 is centered Binomial(64, ½) (σ = 4), a
  * legitimate (ε, δ)-DP mechanism family (the binomial mechanism of
  * Dwork et al. 2006, analyzed tightly in cpSGD, Agarwal et al. 2018)
  * with the seed swapped for a deterministic hash so the DuckDB oracle
  * reproduces every released value (`bit_count(md5_number_lower(...))`
  * — verified to match JVM `Long.bitCount` on the same 64-bit
  * pattern). The plumbing under audit — contribution clipping,
  * sensitivity-scaled noise, count/sum composition, suppression
  * thresholds — is exactly what a production pipeline ships; only the
  * noise source swaps.
  *
  * True values ride along in the outputs (n_true columns): these rows
  * are release AUDITS — utility-loss accounting a pipeline owner reads
  * — not the release itself.
  */
object Privacy {

  /** Binomial-mechanism trials (bits per hash). */
  val NoiseBits = 64
  /** Stability-histogram suppression threshold. */
  val SuppressTau = 20L
  /** Per-user contribution clip for the DP mean, in cents. */
  val ClipCents = 100000L

  /** Centered binomial noise from a tagged key: popcount(md5) − 32.
    * Unmasked on purpose — popcount of the two's-complement pattern
    * equals DuckDB's popcount of the same UBIGINT bits. */
  private def noiseExpr(tag: String, key: Column): Column =
    (bit_count(TextFunctions.md5Lower64(concat(lit(tag),
      key.cast("string")))).cast("long") - lit(NoiseBits / 2L))

  private def noiseLit(tag: String): Column = noiseExpr(tag, lit("x"))

  private val sqlNoise: (String, String) => String = (tag, key) =>
    s"""CAST(bit_count(md5_number_lower('$tag' || CAST($key AS VARCHAR)))
       |    AS BIGINT) - ${NoiseBits / 2}""".stripMargin

  // -------------------------------------------------------- q_dp_counts
  /** Per-event-type counts under the binomial mechanism: each category
    * releases count + noise, noise keyed by the category so the
    * release is deterministic per category (one release per key — the
    * standard parallel-composition setup; sensitivity 1 per user-event).
    *
    * Scale shape: one map-side-partial keyed aggregation over the
    * type vocabulary; noise is row-local codegen on the 5-row result. */
  private def dpCounts(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_true"))
      .select($"event_type", $"n_true",
        noiseExpr("dp:", $"event_type").as("noise"))
      .select($"event_type", $"n_true", $"noise",
        ($"n_true" + $"noise").as("n_noisy"))
      .orderBy($"event_type")
  }

  private val dpCountsSql =
    s"""WITH c AS (
       |  SELECT event_type, COUNT(*) AS n_true,
       |    ${sqlNoise("dp:", "event_type")} AS noise
       |  FROM events GROUP BY event_type)
       |SELECT event_type, n_true, noise, n_true + noise AS n_noisy
       |FROM c ORDER BY event_type""".stripMargin

  // ----------------------------------------------------- q_dp_histogram
  /** Stability histogram: (event_type, $20-value-bucket) cells release
    * noisy counts, and cells whose NOISY count falls below τ are
    * suppressed entirely — the mechanism that lets a histogram over a
    * data-dependent domain stay DP (releasing which cells exist leaks;
    * the threshold buys the δ). The released set is exactly the rows of
    * this query; suppressed-cell accounting is what the spec checks.
    *
    * Scale shape: one keyed aggregation over the bounded
    * (type × value-bucket) axis; threshold filter is row-local. */
  private def dpHistogram(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .select($"event_type",
        expr("CAST(round(value * 100) AS BIGINT) DIV 2000").as("bucket"))
      .groupBy($"event_type", $"bucket")
      .agg(count(lit(1)).as("n_true"))
      .select($"event_type", $"bucket", $"n_true",
        ($"n_true" + noiseExpr("dph:",
          concat($"event_type", lit(":"), $"bucket"))).as("n_noisy"))
      .filter($"n_noisy" >= SuppressTau)
      .orderBy($"event_type", $"bucket")
  }

  private val dpHistogramSql =
    s"""WITH c AS (
       |  SELECT event_type,
       |    CAST(round(value * 100) AS BIGINT) // 2000 AS bucket,
       |    COUNT(*) AS n_true
       |  FROM events GROUP BY 1, 2),
       |r AS (
       |  SELECT event_type, bucket, n_true,
       |    n_true + (${sqlNoise("dph:",
      "event_type || ':' || CAST(bucket AS VARCHAR)")}) AS n_noisy
       |  FROM c)
       |SELECT event_type, bucket, n_true, n_noisy
       |FROM r WHERE n_noisy >= $SuppressTau
       |ORDER BY event_type, bucket""".stripMargin

  // ---------------------------------------------------------- q_dp_mean
  /** DP mean with contribution clipping: each user's spend total clips
    * at ClipCents (bounding any one user's influence — the sensitivity
    * contract every DP aggregate at scale lives or dies by), then the
    * clipped sum releases with noise scaled by the sensitivity
    * (× ClipCents/64 per trial) and the count releases with unit noise;
    * the released mean is their integer quotient. Clip accounting
    * (users clipped, mass removed) rides along — the utility-loss
    * audit.
    *
    * Scale shape: one user-keyed aggregation (map-side partials), one
    * global 1-row reduce; clipping is row-local `least`. */
  private def dpMean(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .select($"user_id", round($"value" * 100).cast("long").as("cents"))
      .groupBy($"user_id")
      .agg(sum($"cents").as("total"))
      .select($"user_id",
        least($"total", lit(ClipCents)).as("clipped"),
        ($"total" > ClipCents).cast("long").as("was_clipped"),
        ($"total" - least($"total", lit(ClipCents))).as("excess"))
      .agg(count(lit(1)).as("n_users"),
        sum($"was_clipped").as("n_clipped"),
        sum($"excess").as("clipped_mass"),
        sum($"clipped").as("sum_clipped"))
      .select($"n_users", $"n_clipped", $"clipped_mass", $"sum_clipped",
        (noiseLit("dpm:sum") * lit(ClipCents / NoiseBits)).as("noise_sum"),
        noiseLit("dpm:n").as("noise_n"))
      .select($"n_users", $"n_clipped", $"clipped_mass", $"sum_clipped",
        $"noise_sum", $"noise_n",
        expr("(sum_clipped + noise_sum) DIV (n_users + noise_n)")
          .as("mean_noisy_cents"),
        expr("sum_clipped DIV n_users").as("mean_clipped_cents"))
  }

  private val dpMeanSql =
    s"""WITH per AS (
       |  SELECT user_id,
       |    CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS total
       |  FROM events GROUP BY user_id),
       |clipped AS (
       |  SELECT least(total, $ClipCents) AS clipped,
       |    CASE WHEN total > $ClipCents THEN 1 ELSE 0 END AS was_clipped,
       |    total - least(total, $ClipCents) AS excess
       |  FROM per),
       |agg AS (
       |  SELECT COUNT(*) AS n_users,
       |    CAST(SUM(was_clipped) AS BIGINT) AS n_clipped,
       |    CAST(SUM(excess) AS BIGINT) AS clipped_mass,
       |    CAST(SUM(clipped) AS BIGINT) AS sum_clipped,
       |    (${sqlNoise("dpm:sum", "'x'")}) * ${ClipCents / NoiseBits}
       |      AS noise_sum,
       |    (${sqlNoise("dpm:n", "'x'")}) AS noise_n
       |  FROM clipped)
       |SELECT n_users, n_clipped, clipped_mass, sum_clipped, noise_sum,
       |  noise_n,
       |  (sum_clipped + noise_sum) // (n_users + noise_n)
       |    AS mean_noisy_cents,
       |  sum_clipped // n_users AS mean_clipped_cents
       |FROM agg""".stripMargin

  // -------------------------------------------------------- q_rr_debias
  /** Randomized response, the local-DP classic (Warner 1965): each user
    * reports their true purchase bit only when an md5 coin says so,
    * otherwise a second md5 coin's uniform bit. The server never sees
    * true bits in a real deployment; here the estimator
    * (4·observed − n) / 2n debiases the aggregate, and the row audits
    * estimator error against the ground truth the fixture still has.
    * Keep probability ½ → ε = ln 3 local DP.
    *
    * Scale shape: one user-keyed aggregation, row-local coins, one
    * global reduce. */
  private def rrDebias(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val per = Tables.events(s, dir)
      .select($"user_id",
        ($"event_type" === "purchase").cast("long").as("p"))
      .groupBy($"user_id")
      .agg(max($"p").as("true_bit"))
      .select($"user_id", $"true_bit",
        (TextFunctions.md5Lower64(concat(lit("rr:"),
          $"user_id".cast("string")))
          .bitwiseAND(lit(Long.MaxValue))).as("h"))
      .selectExpr("true_bit",
        "CASE WHEN h % 2 = 1 THEN true_bit ELSE (h DIV 2) % 2 END" +
          " AS reported")
    per.agg(count(lit(1)).as("n"),
      sum($"true_bit").as("n_true"),
      sum($"reported").as("n_reported"))
      .select($"n", $"n_true", $"n_reported",
        expr("n_true * 1000000 DIV n").as("rate_true_ppm"),
        expr("(4 * n_reported - n) * 500000 DIV n").as("rate_est_ppm"))
      .select($"n", $"n_true", $"n_reported", $"rate_true_ppm",
        $"rate_est_ppm",
        ($"rate_est_ppm" - $"rate_true_ppm").as("err_ppm"))
  }

  private val rrDebiasSql =
    s"""WITH per AS (
       |  SELECT user_id,
       |    CAST(MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
       |      AS BIGINT) AS true_bit
       |  FROM events GROUP BY user_id),
       |coin AS (
       |  SELECT true_bit,
       |    CAST(md5_number_lower('rr:' || CAST(user_id AS VARCHAR))
       |      & 9223372036854775807::UBIGINT AS BIGINT) AS h
       |  FROM per),
       |rep AS (
       |  SELECT true_bit,
       |    CASE WHEN h % 2 = 1 THEN true_bit ELSE (h // 2) % 2 END
       |      AS reported
       |  FROM coin)
       |SELECT COUNT(*) AS n, CAST(SUM(true_bit) AS BIGINT) AS n_true,
       |  CAST(SUM(reported) AS BIGINT) AS n_reported,
       |  CAST(SUM(true_bit) AS BIGINT) * 1000000 // COUNT(*)
       |    AS rate_true_ppm,
       |  (4 * CAST(SUM(reported) AS BIGINT) - COUNT(*)) * 500000
       |    // COUNT(*) AS rate_est_ppm,
       |  (4 * CAST(SUM(reported) AS BIGINT) - COUNT(*)) * 500000
       |    // COUNT(*)
       |    - CAST(SUM(true_bit) AS BIGINT) * 1000000 // COUNT(*)
       |    AS err_ppm
       |FROM rep""".stripMargin

  val all: Seq[NamedQuery] = Seq(
    NamedQuery("q_dp_counts", dpCounts, Some(dpCountsSql), bench = true),
    NamedQuery("q_dp_histogram", dpHistogram, Some(dpHistogramSql),
      bench = true),
    NamedQuery("q_dp_mean", dpMean, Some(dpMeanSql), bench = true),
    NamedQuery("q_rr_debias", rrDebias, Some(rrDebiasSql), bench = true))
}
