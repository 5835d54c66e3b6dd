package graft.operators

import graft.{NamedQuery, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The SQL FACE of the engine: flagship queries whose Spark side is
  * `spark.sql(...)` ONLY — temp views over the shared tables plus the
  * registered native functions (`GraftFunctionRegistry`: `graft_*`
  * codegen expressions), no DataFrame combinators. This is how a
  * dashboard author (the reference's `Frontend.py:28-79` persona, which
  * issues raw SQL strings) would drive the engine; these rows prove the
  * inventory composes from pure SQL — Catalyst plans the identical
  * physical query from either spelling, so every plan-shape audit on
  * the column-API sibling covers the SQL face too.
  *
  * Each row REUSES its sibling's DuckDB oracle verbatim
  * (`industryAvgSql` / `minhashDedupSql` / `filterFunnelSql`) — one
  * expected answer, two independent Spark spellings, one hash gate.
  *
  * Unbenched by design: each face plans the same physical query as its
  * benched sibling (q_industry_avg / q_minhash_dedup /
  * q_filter_funnel), so benching would double-count identical plans.
  */
object SqlFace {

  /** Register the named tables of `dir` as session temp views. Views
    * are session-scoped metadata over the parquet scan — re-planned per
    * query, so filter/column pushdown behaves exactly as the direct
    * DataFrame read (same PushedFilters, same ReadSchema). */
  private def views(s: SparkSession, dir: String, names: String*): Unit =
    names.foreach {
      case n @ "documents" => Tables.documents(s, dir).createOrReplaceTempView(n)
      case n @ "customer" => Tables.customer(s, dir).createOrReplaceTempView(n)
      case n @ "orders" => Tables.orders(s, dir).createOrReplaceTempView(n)
      case n @ "lineitem" => Tables.lineitem(s, dir).createOrReplaceTempView(n)
      case n @ "events" => Tables.events(s, dir).createOrReplaceTempView(n)
      case n @ "embeddings" => Tables.embeddings(s, dir).createOrReplaceTempView(n)
      case n => throw new IllegalArgumentException(s"no view recipe for $n")
    }

  // ------------------------------------------------------ q_sql_face_industry_avg
  /** The flagship J5+A2 query (`Frontend.py:60-69` silhouette) in pure
    * Spark SQL — same decimal-routed exact aggregation spelling as the
    * column API (`Exact.dsum/davg/iavg`), so the doubles are
    * bit-identical to both the sibling row and the oracle. */
  private def sqlIndustryAvg(s: SparkSession, dir: String): DataFrame = {
    views(s, dir, "customer", "orders", "lineitem")
    s.sql("""
      WITH fs AS (
        SELECT o_custkey,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE) AS total_spend,
          COUNT(*) AS n_orders
        FROM orders GROUP BY o_custkey),
      r AS (
        SELECT o.o_custkey,
          CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(28,4))) AS DOUBLE) AS revenue,
          CAST(SUM(CAST(l.l_quantity AS DECIMAL(28,2))) AS DOUBLE) AS total_qty
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        GROUP BY o.o_custkey)
      SELECT c.c_mktsegment AS segment,
        COUNT(*) AS n_customers,
        CAST(SUM(CAST(c.c_acctbal AS DECIMAL(28,2))) AS DOUBLE)/COUNT(c.c_acctbal) AS avg_acctbal,
        CAST(SUM(CAST(fs.total_spend AS DECIMAL(28,2))) AS DOUBLE)/COUNT(fs.total_spend) AS avg_spend,
        CAST(SUM(fs.n_orders) AS DOUBLE)/COUNT(fs.n_orders) AS avg_orders,
        CAST(SUM(CAST(r.revenue AS DECIMAL(28,4))) AS DOUBLE)/COUNT(r.revenue) AS avg_revenue,
        CAST(SUM(CAST(r.total_qty AS DECIMAL(28,2))) AS DOUBLE)/COUNT(r.total_qty) AS avg_qty
      FROM customer c
      LEFT JOIN fs ON c.c_custkey = fs.o_custkey
      LEFT JOIN r ON c.c_custkey = r.o_custkey
      GROUP BY c.c_mktsegment
      ORDER BY segment""")
  }

  // ---------------------------------------------------- q_sql_face_minhash_dedup
  /** The MinHash near-dup decision kernel (`Dedup.minhashVerifiedPairs`)
    * in pure Spark SQL over the registered native expressions:
    * `graft_trigram_minhash` (one-pass banded signatures) and
    * `graft_trigram_hashes` (exact shingle sets for the Jaccard
    * verifier). Same constants as the sibling (16 hashes x 8 bands of
    * 2, bucket guard 2..MaxBucket, j >= MinHashRecallJaccard, plants at
    * doc_id + PlantOffset), same id-only band shuffle — the LATERAL
    * VIEW + window + self-join spelling of the identical plan. */
  private def sqlMinhashDedup(s: SparkSession, dir: String): DataFrame = {
    views(s, dir, "documents")
    s.sql(s"""
      WITH t AS (SELECT doc_id, split(text, ' ', -1) AS w FROM documents),
      planted AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + ${Similarity.PlantOffset} AS doc_id,
          array_join(slice(w, 1, greatest(size(w) - ${Dedup.TruncateWords}, 3)), ' ') AS text
        FROM t),
      sig AS (
        SELECT doc_id, graft_trigram_minhash(text, 16) AS sig FROM planted),
      banded AS (
        SELECT doc_id, band, xxhash64(slice(sig, band * 2 + 1, 2)) AS band_hash
        FROM sig LATERAL VIEW explode(sequence(0, 7)) bt AS band),
      kept AS (
        SELECT * FROM (
          SELECT doc_id, band, band_hash,
            COUNT(*) OVER (PARTITION BY band, band_hash) AS bucket_n
          FROM banded)
        WHERE bucket_n BETWEEN 2 AND ${Dedup.MaxBucket}),
      cand AS (
        SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b
        FROM kept l JOIN kept r
          ON l.band = r.band AND l.band_hash = r.band_hash
        WHERE l.doc_id < r.doc_id),
      hs AS (SELECT doc_id, graft_trigram_hashes(text) AS hs FROM planted),
      scored AS (
        SELECT c.doc_a, c.doc_b,
          CAST(size(array_intersect(a.hs, b.hs)) AS DOUBLE)
            / (size(a.hs) + size(b.hs) - size(array_intersect(a.hs, b.hs))) AS jaccard
        FROM cand c
        JOIN hs a ON c.doc_a = a.doc_id
        JOIN hs b ON c.doc_b = b.doc_id)
      SELECT doc_a, doc_b, jaccard FROM scored
      WHERE jaccard >= ${Dedup.MinHashRecallJaccard}
      ORDER BY doc_a, doc_b""")
  }

  // ---------------------------------------------------- q_sql_face_filter_funnel
  // audited-bnlj(q_sql_face_filter_funnel): build side = 1-row total frame + <=4-row rule-grid drops frame (same shape as q_filter_funnel) — audited in PlanAuditSpec/BnljAudit
  /** The C4/Gopher-style ordered filter funnel (`PretrainOps
    * .filterFunnel`) in pure Spark SQL: row-local first-fail
    * classification, a <=5-row grid aggregation, and the triangular
    * join cumulative — identical integer rules and plan shape. */
  private def sqlFilterFunnel(s: SparkSession, dir: String): DataFrame = {
    views(s, dir, "documents")
    s.sql("""
      WITH flags AS (
        SELECT CASE
          WHEN nw < 20 THEN 1L
          WHEN nw > 80 THEN 2L
          WHEN alpha < nw * 2 OR alpha > nw * 12 THEN 3L
          WHEN nd * 5 > nc THEN 4L
          ELSE 0L END AS first_fail
        FROM (
          SELECT nw, nc, nc - (nw - 1) AS alpha, nd
          FROM (
            SELECT CAST(size(split(text, ' ', -1)) AS BIGINT) AS nw,
              CAST(length(text) AS BIGINT) AS nc,
              CAST(length(regexp_replace(text, '[^0-9]', '')) AS BIGINT) AS nd
            FROM documents))),
      drops AS (
        SELECT first_fail, COUNT(*) AS n_dropped FROM flags
        WHERE first_fail > 0 GROUP BY first_fail),
      total AS (SELECT COUNT(*) AS n_total FROM flags),
      rules AS (
        SELECT * FROM VALUES
          (1L, 'min_words'), (2L, 'max_words'),
          (3L, 'avg_word_len'), (4L, 'digit_ratio') AS rules(rule_idx, rule))
      SELECT rule_idx, rule,
        n_total - dropped_before AS n_in,
        n_dropped,
        n_total - dropped_before - n_dropped AS n_out
      FROM (
        SELECT r.rule_idx, r.rule, t.n_total,
          COALESCE(SUM(CASE WHEN d.first_fail < r.rule_idx THEN d.n_dropped END), 0L)
            AS dropped_before,
          COALESCE(SUM(CASE WHEN d.first_fail = r.rule_idx THEN d.n_dropped END), 0L)
            AS n_dropped
        FROM rules r
        CROSS JOIN total t
        LEFT JOIN drops d ON d.first_fail <= r.rule_idx
        GROUP BY r.rule_idx, r.rule, t.n_total)
      ORDER BY rule_idx""")
  }

  // ---------------------------------------------------- q_sql_face_random_walk
  /** The deterministic random walks (`Graph.randomWalkQuery`) as ONE
    * pure-SQL statement on Spark 4's `WITH RECURSIVE` — the iterative
    * driver loop of the column-API sibling re-expressed as a recursive
    * CTE (Catalyst's UnionLoop), with the registered
    * `graft_md5_lower64` supplying the engine-portable next-hop hash.
    * This face is deliberately a DIFFERENT execution strategy from its
    * sibling (recursive-union plan vs per-step checkpointed joins);
    * both must land the exact same walks against the same recursive-CTE
    * oracle — three engines/strategies, one bit-exact answer. */
  private def sqlRandomWalk(s: SparkSession, dir: String): DataFrame = {
    views(s, dir, "orders", "lineitem")
    s.sql(s"""
      WITH RECURSIVE pairs AS (
        SELECT DISTINCT o_custkey AS a,
          l_suppkey + ${Graph.SupplierOffset} AS b
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
      edges AS (
        SELECT a AS src, b AS dst FROM pairs
        UNION ALL SELECT b AS src, a AS dst FROM pairs),
      adj AS (
        SELECT src, dst,
          CAST(ROW_NUMBER() OVER (PARTITION BY src ORDER BY dst) - 1
            AS BIGINT) AS rnk,
          COUNT(*) OVER (PARTITION BY src) AS deg
        FROM edges),
      starts AS (
        SELECT DISTINCT src AS walker FROM adj
        WHERE src < ${Graph.SupplierOffset}
          AND src % ${Graph.WalkStartMod} = 1),
      walk(walker, step, node, path) AS (
        SELECT walker, 0, walker, CAST(walker AS STRING) FROM starts
        UNION ALL
        SELECT w.walker, w.step + 1, a.dst,
          w.path || ',' || CAST(a.dst AS STRING)
        FROM walk w JOIN adj a ON a.src = w.node
          AND a.rnk = (graft_md5_lower64(
              'walk:' || CAST(w.walker AS STRING) || ':' ||
              CAST(w.step + 1 AS STRING))
            & ${Long.MaxValue}L) % a.deg
        WHERE w.step < ${Graph.WalkSteps})
      SELECT walker, node AS final_node, path FROM walk
      WHERE step = ${Graph.WalkSteps} ORDER BY walker""")
  }

  // --------------------------------------------------------- q_sql_face_ohlc
  /** The market-indicator family's daily-bar sub-plan
    * (`Indicators.bars`) in pure Spark SQL — the dashboard author's
    * spelling of the OHLC chart query. Dialect deltas vs the shared
    * DuckDB oracle: `date_format`/`unix_micros` for
    * `strftime`/`epoch_us`; the ROW_NUMBER open/close order statistics
    * and the conditional-MAX rollup are identical text. */
  private def sqlOhlc(s: SparkSession, dir: String): DataFrame = {
    views(s, dir, "events")
    s.sql("""
      WITH t AS (
        SELECT event_type, date_format(ts, 'yyyy-MM-dd') AS day,
          unix_micros(ts) AS us, event_id,
          CAST(round(value * 100) AS BIGINT) AS cents,
          ROW_NUMBER() OVER (
            PARTITION BY event_type, date_format(ts, 'yyyy-MM-dd')
            ORDER BY unix_micros(ts), event_id) AS ra,
          ROW_NUMBER() OVER (
            PARTITION BY event_type, date_format(ts, 'yyyy-MM-dd')
            ORDER BY unix_micros(ts) DESC, event_id DESC) AS rd
        FROM events)
      SELECT event_type, day,
        MAX(CASE WHEN ra = 1 THEN cents END) AS open_cents,
        MAX(cents) AS high_cents,
        MIN(cents) AS low_cents,
        MAX(CASE WHEN rd = 1 THEN cents END) AS close_cents,
        COUNT(*) AS n_ticks,
        SUM(cents) AS notional_cents
      FROM t GROUP BY event_type, day
      ORDER BY event_type, day""")
  }

  // -------------------------------------------------- q_sql_face_sharpe
  /** The risk family's Sharpe/Sortino screen in pure Spark SQL — close
    * bars → lagged diffs → cleared-denominator ratios under the integer
    * sqrt, exactly the Indicators2 pipeline as a SQL author would spell
    * it. Dialect deltas vs the shared DuckDB oracle: `date_format`/
    * `unix_micros`/`DIV` for `strftime`/`epoch_us`/`//`; the isqrt
    * spelling (FLOOR(SQRT(CAST(.. AS DOUBLE)))) is byte-identical. */
  private def sqlSharpe(s: SparkSession, dir: String): DataFrame = {
    views(s, dir, "events")
    s.sql("""
      WITH t AS (
        SELECT event_type, date_format(ts, 'yyyy-MM-dd') AS day,
          CAST(round(value * 100) AS BIGINT) AS cents,
          ROW_NUMBER() OVER (
            PARTITION BY event_type, date_format(ts, 'yyyy-MM-dd')
            ORDER BY unix_micros(ts) DESC, event_id DESC) AS rd
        FROM events),
      bars AS (
        SELECT event_type, day,
          MAX(CASE WHEN rd = 1 THEN cents END) AS close_cents
        FROM t GROUP BY event_type, day),
      d0 AS (
        SELECT event_type, day,
          close_cents - LAG(close_cents) OVER (
            PARTITION BY event_type ORDER BY day) AS x
        FROM bars),
      diffs AS (SELECT * FROM d0 WHERE x IS NOT NULL),
      stats AS (
        SELECT event_type, COUNT(*) AS n_days,
          SUM(x) AS sx, SUM(x * x) AS sxx,
          SUM(CASE WHEN x < 0 THEN x * x ELSE 0 END) AS sdd
        FROM diffs GROUP BY event_type)
      SELECT event_type, n_days, sx AS sum_diff_cents,
        sx * 1000 DIV nullif(CAST(FLOOR(SQRT(
          CAST(n_days * sxx - sx * sx AS DOUBLE))) AS BIGINT), 0)
          AS sharpe_milli,
        sx * 1000 DIV nullif(CAST(FLOOR(SQRT(
          CAST(n_days * sdd AS DOUBLE))) AS BIGINT), 0)
          AS sortino_milli
      FROM stats ORDER BY event_type""")
  }

  // ------------------------------------------------- q_sql_face_unpivot
  /** The reshape corner's (§2.8) pure-SQL spelling: Spark SQL's
    * `UNPIVOT` clause over the entity-vs-average comparison frame —
    * the dashboard's wide→long transpose (`Frontend.py:96-97`) as the
    * SQL author would write it. `INCLUDE NULLS` matches
    * `Dataset.unpivot` exactly (the SQL clause defaults to EXCLUDE
    * NULLS — a silent row-drop divergence on any entity with a null
    * measure, e.g. a customer with no orders). Shares
    * `q_unpivot_compare`'s UNION-ALL DuckDB oracle; Round8OpsSpec
    * proves the two Spark spellings bit-identical. */
  private def sqlUnpivotCompare(s: SparkSession, dir: String): DataFrame = {
    views(s, dir, "customer", "orders")
    s.sql("""
      WITH spend AS (
        SELECT o_custkey,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE) AS total_spend
        FROM orders GROUP BY o_custkey),
      enriched AS (
        SELECT c.*, s.total_spend
        FROM customer c LEFT JOIN spend s ON c.c_custkey = s.o_custkey),
      base AS (
        SELECT c_name AS entity, c_acctbal AS acctbal, total_spend
        FROM enriched WHERE c_custkey = 42
        UNION ALL
        SELECT 'Segment Average',
          CAST(SUM(CAST(c_acctbal AS DECIMAL(28,2))) AS DOUBLE)
            / COUNT(c_acctbal),
          CAST(SUM(CAST(total_spend AS DECIMAL(28,2))) AS DOUBLE)
            / COUNT(total_spend)
        FROM enriched
        WHERE c_mktsegment =
          (SELECT c_mktsegment FROM customer WHERE c_custkey = 42))
      SELECT entity, metric, value
      FROM base UNPIVOT INCLUDE NULLS (value FOR metric IN (acctbal, total_spend))
      ORDER BY entity, metric""")
  }

  // --------------------------------------------------- q_sql_face_pivot
  /** The reshape corner's other direction in pure SQL: Spark SQL's
    * `PIVOT` clause over the long (key, attr, value) frame — the
    * `pd.Series(ticker.info)` → transpose ingest shape
    * (`retrieval.py:16-24`) as the SQL author writes it. The IN list is
    * explicit with aliases, pinning deterministic output columns
    * exactly like the column-API spelling's explicit value list (and
    * skipping the distinct-collection job at scale). Shares
    * `q_pivot_attrs`' conditional-MAX DuckDB oracle; Round8OpsSpec
    * proves the two Spark spellings bit-identical. */
  private def sqlPivotAttrs(s: SparkSession, dir: String): DataFrame = {
    views(s, dir, "customer")
    s.sql("""
      SELECT * FROM (
        SELECT c_custkey AS custkey, 'name' AS attr, c_name AS value
        FROM customer
        UNION ALL
        SELECT c_custkey, 'mktsegment', c_mktsegment FROM customer
        UNION ALL
        SELECT c_custkey, 'nationkey', CAST(c_nationkey AS STRING)
        FROM customer)
      PIVOT (first(value) FOR attr
             IN ('mktsegment' AS mktsegment, 'name' AS name,
                 'nationkey' AS nationkey))
      ORDER BY custkey""")
  }

  // ---------------------------------------------------------- q_sql_face_cms
  /** The count-min sketch (`Analytics.cms`) in pure Spark SQL over the
    * registered `graft_cms_bucket` (the q_cms row-hash spelling:
    * md5-lower-64 of 'cms<i>:<key>', sign-masked, mod width). Same
    * D×W counter table, same min-over-rows estimate, same probe roster;
    * the explode(sequence(...)) spelling keeps the build a Generate
    * node (no join), exactly the sibling's explode(array(...)) plan.
    * Shares q_cms's DuckDB oracle. */
  private def sqlCms(s: SparkSession, dir: String): DataFrame = {
    views(s, dir, "orders")
    s.sql(s"""
      WITH ks AS (SELECT o_custkey AS key FROM orders),
      counters AS (
        SELECT i, graft_cms_bucket(key, i, ${Analytics.CmsWidth}) AS b,
          COUNT(*) AS n
        FROM (SELECT key, explode(sequence(0, ${Analytics.CmsDepth - 1})) AS i
              FROM ks)
        GROUP BY 1, 2),
      exact AS (
        SELECT key, COUNT(*) AS exact_n FROM ks
        WHERE key < ${Analytics.CmsProbeMaxKey} GROUP BY 1),
      est AS (
        SELECT p.key, p.exact_n, MIN(c.n) AS est_n
        FROM (SELECT key, exact_n,
                explode(sequence(0, ${Analytics.CmsDepth - 1})) AS i
              FROM exact) p
        JOIN counters c
          ON c.i = p.i
          AND c.b = graft_cms_bucket(p.key, p.i, ${Analytics.CmsWidth})
        GROUP BY 1, 2)
      SELECT key, exact_n, est_n, est_n - exact_n AS overcount
      FROM est ORDER BY key""")
  }

  // ------------------------------------------------------ q_sql_face_unigram
  /** The trained unigram-LM tokenizer (`Tokenize.unigramLm`) served from
    * SQL: training still runs the corpus-scale EM pipeline (that is a
    * pipeline, not a scalar function), and the LEARNED VOCABULARY ships
    * into the query text as an array literal — exactly how a trained
    * tokenizer reaches a SQL serving layer — where the registered
    * `graft_unigram_segment` runs the same maximal-munch codegen kernel
    * as the Column API's reference-object spelling. Shares
    * q_unigram_lm's full recursive-CTE oracle. */
  private def sqlUnigramLm(s: SparkSession, dir: String): DataFrame = {
    views(s, dir, "documents")
    val (_, vocab2) = Tokenize.trainUnigram(Tables.documents(s, dir))
    val vocabLit = vocab2.map(p =>
        "'" + p.replace("\\", "\\\\").replace("'", "\\'") + "'")
      .mkString("array(", ", ", ")")
    s.sql(s"""
      WITH words AS (
        SELECT w, COUNT(*) AS c FROM (
          SELECT explode(split(text, ' ', -1)) AS w FROM documents)
        WHERE length(w) > 0 GROUP BY w),
      seg AS (
        SELECT w, c, explode(graft_unigram_segment(w, $vocabLit)) AS p
        FROM words)
      SELECT p, length(p) AS piece_len, SUM(c) AS cnt,
        COUNT(DISTINCT w) AS n_words
      FROM seg GROUP BY p ORDER BY cnt DESC, p""")
  }

  // -------------------------------------------------- q_sql_face_pq_recall10
  // audited-bnlj(q_sql_face_pq_recall10): build side = ≤NatQueryCount-row
  // query-roster broadcast — the sibling q_ann_pq_recall10's audited shape
  /** The natural-regime PQ recall gate (`annNaturalRecall10 ∘
    * pqCandidateIds`) in pure Spark SQL: `graft_pq_codes` produces the
    * subspace codes (same composed kernel as the Column API — one
    * definition in VectorFunctions), `graft_cosine` scores, windows
    * rank. Same bucket guard, same ≥-shared collision rule, same
    * rank-then-filter order as the sibling. Shares the sibling's
    * independent DuckDB replay oracle. */
  private def sqlPqRecall10(s: SparkSession, dir: String): DataFrame = {
    views(s, dir, "embeddings")
    s.sql(s"""
      WITH q AS (SELECT vec_id AS vec_a FROM embeddings
                 WHERE vec_id < ${Similarity.NatQueryCount}),
      exact_ranked AS (
        SELECT c.vec_a, c.vec_b,
          ROW_NUMBER() OVER (PARTITION BY c.vec_a
            ORDER BY round(graft_cosine(ea.embedding, eb.embedding), 4) DESC,
                     c.vec_b) AS rank
        FROM (SELECT q.vec_a, e.vec_id AS vec_b
              FROM embeddings e CROSS JOIN q
              WHERE e.vec_id <> q.vec_a) c
        JOIN embeddings ea ON ea.vec_id = c.vec_a
        JOIN embeddings eb ON eb.vec_id = c.vec_b),
      exact10 AS (SELECT vec_a, vec_b FROM exact_ranked WHERE rank <= 10),
      coded AS (
        SELECT vec_id, m, code FROM (
          SELECT vec_id, m, code,
            COUNT(*) OVER (PARTITION BY m, code) AS bucket_n
          FROM embeddings
          LATERAL VIEW posexplode(graft_pq_codes(embedding,
            ${Similarity.PqM}, ${Similarity.PqK})) t AS m, code)
        WHERE bucket_n <= ${Similarity.MaxBucket}),
      cand AS (
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
        FROM coded a JOIN coded b ON a.m = b.m AND a.code = b.code
        WHERE a.vec_id <> b.vec_id
        GROUP BY 1, 2
        HAVING COUNT(*) >= ${Similarity.PqMinShared}),
      ann_ranked AS (
        SELECT c.vec_a, c.vec_b,
          ROW_NUMBER() OVER (PARTITION BY c.vec_a
            ORDER BY round(graft_cosine(ea.embedding, eb.embedding), 4) DESC,
                     c.vec_b) AS rank
        FROM cand c
        JOIN embeddings ea ON ea.vec_id = c.vec_a
        JOIN embeddings eb ON eb.vec_id = c.vec_b),
      ann10 AS (
        SELECT vec_a, vec_b FROM ann_ranked
        WHERE rank <= 10 AND vec_a < ${Similarity.NatQueryCount})
      SELECT x.vec_a, COUNT(*) AS n_exact,
        COALESCE(SUM(CASE WHEN a.vec_b IS NOT NULL THEN 1L END), 0L) AS n_hits
      FROM exact10 x
      LEFT JOIN ann10 a ON x.vec_a = a.vec_a AND x.vec_b = a.vec_b
      GROUP BY x.vec_a ORDER BY x.vec_a""")
  }

  val all: Seq[NamedQuery] = Seq(
    NamedQuery("q_sql_face_cms", sqlCms, Some(Analytics.cmsSql)),
    NamedQuery("q_sql_face_unigram", sqlUnigramLm,
      Some(Tokenize.unigramLmSql)),
    NamedQuery("q_sql_face_pq_recall10", sqlPqRecall10,
      Some(Similarity.pqRecall10Sql(
        Similarity.PqM, Similarity.PqK, Similarity.PqMinShared))),
    NamedQuery("q_sql_face_pivot", sqlPivotAttrs,
      Some(Relational.pivotAttrsSql)),
    NamedQuery("q_sql_face_unpivot", sqlUnpivotCompare,
      Some(Relational.unpivotCompareSql)),
    NamedQuery("q_sql_face_ohlc", sqlOhlc, Some(Indicators.ohlcSql)),
    NamedQuery("q_sql_face_sharpe", sqlSharpe, Some(Indicators2.sharpeSql)),
    NamedQuery("q_sql_face_random_walk", sqlRandomWalk,
      Some(Graph.randomWalkSql)),
    NamedQuery("q_sql_face_industry_avg", sqlIndustryAvg,
      Some(Relational.industryAvgSql)),
    NamedQuery("q_sql_face_minhash_dedup", sqlMinhashDedup,
      Some(Dedup.minhashDedupSql)),
    NamedQuery("q_sql_face_filter_funnel", sqlFilterFunnel,
      Some(PretrainOps.filterFunnelSql)))
}
