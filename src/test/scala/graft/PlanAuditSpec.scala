package graft

/** Global anti-pattern gate over the ENTIRE query inventory: a
  * CartesianProduct (the non-broadcast cartesian — both sides big, the
  * plan that cannot survive any scale-up) must never appear in any
  * registered query. Deliberate one-row cross joins plan as
  * BroadcastNestedLoopJoin with a single-row build side and are allowed;
  * a plain CartesianProduct is always a regression. */
class PlanAuditSpec extends GraftSuite {

  test("no registered query plans a non-broadcast CartesianProduct") {
    val offenders = SparkEntry.all.flatMap { q =>
      // physical plan without executing the query's jobs (iterative
      // operators still materialize their loop-internal checkpoints)
      val plan =
        try q.fn(spark, sf).queryExecution.sparkPlan.toString
        catch { case e: Throwable => s"PLANNING-FAILED: $e" }
      if (plan.contains("CartesianProduct") || plan.startsWith("PLANNING-FAILED"))
        Some(q.name -> plan.linesIterator.take(3).mkString(" | "))
      else None
    }
    assert(offenders.isEmpty,
      offenders.map { case (n, p) => s"$n: $p" }.mkString("\n"))
  }

  /** Queries whose plans legitimately carry an unpartitioned WindowExec,
    * audited one by one: every frame below is BOUNDED BY CONTRACT — a
    * calendar/month grid, a log2/decile/quintile/score bucket axis, a
    * value histogram over a finite value domain, or a seller/source
    * roster — never a frame that grows linearly with corpus rows.
    * (The `__pid`-keyed offsets window inside Corpus.globalIndex — a
    * partition-count frame — is auto-allowed structurally, not listed.)
    * A query NOT in this set that plans an unpartitioned window FAILS:
    * a node-/customer-/document-sized global window serializes through
    * one task at scale (the q_kcore p25 lesson, fixed round 6). */
  private val auditedBoundedWindowQueries: Set[String] = Set.empty ++
    UnpartitionedWindowAudit.allowed

  /** BNLJ gate, the q_active_users lesson made permanent: a
    * BroadcastNestedLoopJoin is legitimate exactly twice here — a
    * single-row broadcast frame (a global aggregate crossed back onto a
    * keyed frame; build side is 1 row by construction) and the
    * calendar²-bounded pair frames of the rank statistics. A BNLJ whose
    * build side GROWS WITH THE DATA pays O(stream × build) compute — at
    * 100× scale that's the first thing to melt, and unlike a
    * CartesianProduct it hides behind the word "broadcast". Every query
    * below is audited as one of the two legitimate shapes; anything new
    * fails until audited. */
  private val auditedBnljQueries: Set[String] = BnljAudit.allowed

  test("no BroadcastNestedLoopJoin outside the audited set") {
    val found = SparkEntry.all.flatMap { q =>
      val plan =
        try q.fn(spark, sf).queryExecution.sparkPlan.toString
        catch { case _: Throwable => null } // planning failures caught above
      if (plan != null && plan.contains("BroadcastNestedLoopJoin")) Some(q.name)
      else None
    }.toSet
    val unaudited = found -- auditedBnljQueries
    val stale = auditedBnljQueries -- found
    assert(unaudited.isEmpty,
      s"unaudited BroadcastNestedLoopJoin in: ${unaudited.toSeq.sorted.mkString(", ")} — " +
        "verify the build side is a single-row frame or a calendar-bounded " +
        "grid (graft.NljAudit lists occurrences), then whitelist")
    assert(stale.isEmpty,
      s"stale BNLJ whitelist entries: ${stale.toSeq.sorted.mkString(", ")}")
  }

  test("no unpartitioned WindowExec outside the audited bounded-frame set") {
    import org.apache.spark.sql.execution.window.WindowExecBase
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    val found = SparkEntry.all.flatMap { q =>
      val plan =
        try q.fn(spark, sf).queryExecution.sparkPlan
        catch { case _: Throwable => null } // planning failures caught above
      if (plan == null) None
      else {
        // main-tree collect only: collectWithSubqueries descends into
        // subquery expressions that still hold LOGICAL plans before
        // execution and class-casts; all audited window sites are
        // main-tree operators
        val bare = plan.collect {
          case w: WindowExecBase if w.partitionSpec.isEmpty => w
        }.filterNot { w =>
          // globalIndex offsets shape: the window's input aggregates by
          // spark_partition_id (`__pid`) — a #partitions-row frame
          w.child.collectFirst {
            case a: BaseAggregateExec
                if a.groupingExpressions.exists(_.toString.contains("__pid")) => ()
          }.isDefined
        }
        if (bare.nonEmpty) Some(q.name) else None
      }
    }.toSet
    val unaudited = found -- auditedBoundedWindowQueries
    val stale = auditedBoundedWindowQueries -- found
    assert(unaudited.isEmpty,
      s"unaudited unpartitioned WindowExec in: ${unaudited.toSeq.sorted.mkString(", ")} — " +
        "audit the frame's bound (or partition the window) before whitelisting")
    assert(stale.isEmpty,
      s"stale whitelist entries (no unpartitioned window found): ${stale.toSeq.sorted.mkString(", ")}")
  }

  /** The audited-contract tags: every allow-listed query must carry its
    * bound as a comment AT THE OPERATOR SITE (a greppable
    * `audited-global-window(q_x)` / `audited-bnlj(q_x)` line in main
    * source), so the contract is visible where the plan is authored —
    * not only in this spec's allow-lists. Sync is enforced both ways:
    * a listed query without a tag fails, and a tag for a query no
    * longer listed fails (stale contract). */
  test("every allow-listed query carries its audited-contract tag at the operator site") {
    import java.nio.file.{Files, Path}
    import scala.jdk.CollectionConverters._
    val root = Path.of("src/main/scala/graft")
    val src = Files.walk(root).iterator().asScala
      .filter(p => p.toString.endsWith(".scala"))
      .map(Files.readString)
      .mkString("\n")
    def tagged(kind: String): Set[String] =
      s"""$kind\\((q_\\w+)\\)""".r.findAllMatchIn(src).map(_.group(1)).toSet
    val winTags = tagged("audited-global-window")
    val bnljTags = tagged("audited-bnlj")
    val winMissing = UnpartitionedWindowAudit.allowed -- winTags
    val winStale = winTags -- UnpartitionedWindowAudit.allowed
    val bnljMissing = BnljAudit.allowed -- bnljTags
    val bnljStale = bnljTags -- BnljAudit.allowed
    assert(winMissing.isEmpty && winStale.isEmpty,
      s"audited-global-window tags out of sync — missing: ${winMissing.toSeq.sorted.mkString(", ")}; " +
        s"stale: ${winStale.toSeq.sorted.mkString(", ")}")
    assert(bnljMissing.isEmpty && bnljStale.isEmpty,
      s"audited-bnlj tags out of sync — missing: ${bnljMissing.toSeq.sorted.mkString(", ")}; " +
        s"stale: ${bnljStale.toSeq.sorted.mkString(", ")}")
  }
}

/** The audited BroadcastNestedLoopJoin allow-list. Shape legend:
  * "1-row" = global-aggregate frame (count/sum/max totals, fences,
  * thresholds) crossed back onto a keyed frame — build side is one row
  * by construction; "pair" = the calendar²-bounded month-pair frame of
  * the rank statistics (broadcast side is the month grid); "roster" =
  * a constant-bounded query roster (≤ Similarity.NatQueryCount rows by
  * construction — the exact-baseline side of the natural-regime recall
  * gates; the corpus side streams, never builds). Audited via
  * graft.NljAudit over every registered plan (round 6; roster shape
  * round 8). */
object BnljAudit {
  val allowed: Set[String] = Set(
    // bounded query-roster broadcasts (natural-regime ANN recall gates)
    "q_ann_lsh_recall10", "q_ann_ivf_recall10", "q_ann_pq_recall10",
    "q_ann_lsh8_recall10", "q_ann_ivf16_recall10", "q_ann_ivfpq_recall10",
    "q_sql_face_pq_recall10", // same roster shape, SQL spelling
    // constant-bounded geo rosters (25-row POI / 5-row fence broadcasts)
    "q_nearest_poi", "q_geofence",
    // 1-row global-aggregate broadcasts
    "q_abc_analysis", "q_kn_bigram",
    "q_acf", "q_basket_rules", "q_bm25", "q_collocations", "q_conductance",
    "q_conversion_latency", "q_cross_corr", "q_data_freshness",
    "q_date_window", "q_dedup_embedding", "q_degree_dist",
    "q_discount_elasticity", "q_dsir_weights", "q_embedding_cosine_topk",
    "q_filter_funnel", "q_sql_face_filter_funnel",
    "q_fingerprint", "q_funnel", "q_hard_negatives", "q_heavy_hitters",
    "q_hits", // 1-row MAX normalizer; final round uncut in bcast mode (r12)
    "q_jl_project", "q_kcore", "q_kcore_converged", "q_kmeans", "q_ks_test",
    "q_kll_quantiles", // 1-row threshold/stat frames + 6-row pct axis
    "q_negative_sampling", "q_rate_smoothing", "q_class_balance",
    "q_pref_transitivity", "q_mix_anneal", "q_kto_pairs",
    "q_conformal_interval", "q_cuped",
    "q_lift",
    "q_lm_surprisal", "q_mann_whitney", "q_seasonal_anomalies",
    "q_simhash_recall", "q_tpch_q11", "q_tpch_q22", "q_vocab_growth",
    "q_weekday_profile", "q_customer_concentration",
    "q_chi_square", "q_cluster_purity", "q_knn_graph",
    "q_modularity", "q_ndcg", "q_rrf", "q_semdedup", "q_t_closeness",
    "q_decile_share",
    "q_forget_cascade", "q_survival", "q_dataset_card", "q_rfm",
    "q_tfidf", "q_kmv_jaccard",
    // calendar²-bounded month-pair frames
    "q_kendall_tau", "q_theil_sen", "q_mann_kendall")
}

/** The audited allow-list, one line per query with the bounded frame the
  * window runs over. Kept out of the spec body so the list reads as the
  * audit record it is. */
object UnpartitionedWindowAudit {
  val allowed: Set[String] = Set(
    // calendar grids: one row per month/year of data lifetime
    "q_acf",                // month-lag grid
    "q_peaks",              // month grid
    "q_seasonality",        // month grid
    "q_seasonal_decompose", // month grid
    "q_running_distinct",   // YEAR offset frame (day cum is partitioned by year)
    "q_kendall_tau",        // month grid (pair frame is calendar²-bounded)
    "q_theil_sen",          // month grid + calendar²-bounded slope-pair rank
    "q_runs_test",          // month grid lag/run scan
    "q_cross_corr",         // month grid (q_acf shape)
    "q_changepoint",        // month grid prefix sums + splits argmin
    "q_ols_trend",          // month grid index + sufficient statistics
    "q_mann_kendall",       // month grid (calendar²-bounded pair frame)
    "q_wilcoxon",           // month grid + |diff| value-grid midranks
    "q_partial_corr",       // month grid (q_acf shape, 3 series)
    "q_vocab_growth",       // <=10-row decile frame cumulative
    "q_seasonal_anomalies", // month grid + residual value histogram
    "q_conversion_latency", // latency-minute grid (calendar-span-bounded)
    // fixed bucket/score axes
    "q_benford",            // 9-row leading-digit grid
    "q_degree_dist",        // <=64-row log2 bucket axis
    "q_lift",               // decile axis
    "q_path_ngrams",        // type-vocab³-bounded trigram axis
    "q_conformal_interval", // residual value histogram (cents-domain-bounded)
    "q_auc",                // integer-ppm score grid (<=1e6+1 distinct)
    "q_bootstrap",          // fixed replicate count frame
    // value histograms over finite value domains
    "q_ks_test",            // metric-value grid (capped doc metrics)
    "q_quantile_transform", // metric-value grid
    "q_drift_tvd",          // shared histogram bucket axis
    "q_chi_square",         // contingency-cell grid (category x category)
    "q_spearman",           // value grid; mann-whitney fallback documented
    "q_survival",           // tenure-duration grid (calendar-bounded days)
    "q_rfm",                // R day-grid, F count-grid; M fallback documented
    // roster-sized frames
    "q_zipf",               // 20-row top-k frame after LIMIT
    "q_kmv_jaccard",        // union-sketch rank over <=2k sketch hashes
    "q_kll_quantiles",      // <=63-row level histogram + <=KllK kept sample
    "q_mix_sample",         // per-source weight frame (#sources)
    "q_mix_weights",        // per-source weight frame (#sources)
    "q_dataset_card",       // datasheet summary rows (fixed section count)
    "q_embargo_split",      // calendar day grid (index rank + grid count)
  )
}
