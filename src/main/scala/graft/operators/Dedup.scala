package graft.operators

import graft.LineageCut._
import graft.{NamedQuery, Tables}
import graft.functions.{TextFunctions, VectorFunctions}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators over `documents` / `embeddings`:
  * exact (hash-groupBy), word-shingle Jaccard, MinHash+LSH, and
  * embedding-cosine near-dup.
  *
  * Scale design (100 TB):
  *  - exact dedup is one hash-shuffle on a 16-byte digest (never on the
  *    raw text) — the classic first pass;
  *  - MinHash+LSH replaces the O(n^2) pair space with
  *    explode(bands) -> groupBy(band, bandHash) -> within-bucket pairs:
  *    cost ~ sum(bucket^2), bounded by capping pathological buckets
  *    (skew guard below) — this is the only formulation that survives
  *    a 1000-executor corpus;
  *  - brute-force pair scans are kept ONLY as small-scale oracles for the
  *    LSH path (q_ngram_jaccard / q_dedup_embedding run bucketed by
  *    metadata or at bounded n).
  */
object Dedup {

  /** Buckets with more members than this are dropped from candidate
    * generation (LSH skew guard — a degenerate band value, e.g. from
    * boilerplate/empty docs, would otherwise quadratically explode one
    * reducer; standard practice in web-scale dedup). */
  val MaxBucket = 1000

  /** Words dropped from the tail of each planted near-dup copy (3-word
    * floor) — word-shingle Jaccard of a typical 40-60-word doc against
    * its truncation lands ≈ 0.9. Declared HERE, above the oracle-SQL
    * vals that interpolate it (object init order: a val referenced
    * before its declaration line reads as 0). */
  val TruncateWords = 5

  /** Exact-Jaccard admission threshold for verified near-dup pairs —
    * shared by the pair, cluster, and recall gates and their oracles. */
  val MinHashRecallJaccard = 0.8

  /** Exact Jaccard similarity of two set-valued (distinct-element) array
    * columns: |a ∩ b| / |a ∪ b|. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b))
    inter.cast("double") / (size(a) + size(b) - inter)
  }

  /** Shared guard for the deliberate O(n²) oracle baselines: refuse
    * unbounded inputs loudly instead of launching a quadratic plan. */
  private[operators] def requireBounded(df: DataFrame, what: String,
      alternative: String): Unit = {
    val n = df.count()
    require(n <= MaxBruteForceRows,
      s"$what is an O(n²) oracle baseline bounded to $MaxBruteForceRows " +
        s"rows; got $n — use $alternative at scale")
  }

  // --------------------------------------------------------------- q_dedup_exact
  /** Exact dedup: group by content digest, keep the smallest doc_id.
    * The digest (16 bytes) is what shuffles, not the document. */
  private def dedupExact(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .groupBy(md5($"text").as("text_hash"))
      .agg(count(lit(1)).as("n_copies"), min($"doc_id").as("keep_id"))
      .orderBy($"text_hash")
  }

  private val dedupExactSql =
    """SELECT md5(text) AS text_hash, COUNT(*) AS n_copies, MIN(doc_id) AS keep_id
      |FROM documents GROUP BY 1 ORDER BY text_hash""".stripMargin

  // ------------------------------------------------------------- q_ngram_jaccard
  /** Word-3-gram shingle Jaccard for all doc pairs inside a (lang, source)
    * bucket — the exact-similarity verifier that LSH candidates feed at
    * scale (here bucketed by metadata so the oracle stays SQL-expressible). */
  /** The token array BINDS AS A LAMBDA VARIABLE (`transform(array(...))`
    * wrapper): a plain `val w = split(...)` alias gets inlined by
    * CollapseProject into every element lambda, re-splitting the text
    * once per shingle — the q_winnow PERF NOTE's measured 200× trap. */
  private def shingles(text: Column): Column =
    element_at(transform(array(split(text, " ", -1)), w =>
      array_distinct(
        when(size(w) >= 3,
          transform(sequence(lit(1), size(w) - 2), i =>
            concat_ws(" ", element_at(w, i), element_at(w, i + 1),
              element_at(w, i + 2))))
          .otherwise(array(concat_ws(" ", w))))), 1)

  private def ngramJaccard(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // deliberate all-pairs-per-bucket oracle baseline for the LSH path —
    // quadratic per (lang, source) bucket, so refuse unbounded inputs
    val docs = Tables.documents(s, dir)
    requireBounded(docs, "ngramJaccard", "minhashCandidateIds")
    val d = docs
      .select($"doc_id", $"lang", $"source", shingles($"text").as("sh"))
    val a = d.select($"doc_id".as("doc_a"), $"lang", $"source", $"sh".as("sh_a"))
    val b = d.select($"doc_id".as("doc_b"), $"lang", $"source", $"sh".as("sh_b"))
    a.join(b, Seq("lang", "source"))
      .filter($"doc_a" < $"doc_b")
      .select($"lang", $"source", $"doc_a", $"doc_b",
        jaccard($"sh_a", $"sh_b").as("jaccard"))
      .orderBy($"doc_a", $"doc_b")
  }

  private val ngramJaccardSql =
    """WITH d AS (
      |  SELECT doc_id, lang, source,
      |    list_distinct(CASE WHEN len(w) >= 3
      |      THEN list_transform(generate_series(1, len(w) - 2),
      |                          i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
      |      ELSE [array_to_string(w, ' ')] END) AS sh
      |  FROM (SELECT doc_id, lang, source, string_split(text, ' ') AS w FROM documents))
      |SELECT a.lang, a.source, a.doc_id AS doc_a, b.doc_id AS doc_b,
      |  CAST(len(list_filter(a.sh, x -> list_contains(b.sh, x))) AS DOUBLE)
      |    / (len(a.sh) + len(b.sh) - len(list_filter(a.sh, x -> list_contains(b.sh, x)))) AS jaccard
      |FROM d a JOIN d b ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
      |ORDER BY doc_a, doc_b""".stripMargin

  // ------------------------------------------------------------ q_edit_distance
  /** Character-level edit-distance verifier (record-linkage / fuzzy-match
    * family) over 40-char document prefixes within (lang, source)
    * buckets: levenshtein is integer-valued, so the oracle is exact with
    * zero rounding, and the normalized similarity divides two small ints
    * — also bit-exact. Like q_ngram_jaccard this is the deliberate
    * bounded all-pairs ORACLE BASELINE: at corpus scale the pair stream
    * comes from the LSH/SimHash candidate generators and this scoring is
    * the per-pair verification tail (levenshtein is O(len²) per pair —
    * the reason real pipelines gate it behind cheap candidates and
    * prefixes). */
  val EditPrefixChars = 40

  private def editDistance(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
    requireBounded(docs, "editDistance", "minhashCandidateIds + per-pair scoring")
    val d = docs.select($"doc_id", $"lang", $"source",
      substring($"text", 1, EditPrefixChars).as("prefix"))
    val a = d.select($"doc_id".as("doc_a"), $"lang", $"source", $"prefix".as("pa"))
    val b = d.select($"doc_id".as("doc_b"), $"lang", $"source", $"prefix".as("pb"))
    a.join(b, Seq("lang", "source"))
      .filter($"doc_a" < $"doc_b")
      .select($"lang", $"source", $"doc_a", $"doc_b",
        levenshtein($"pa", $"pb").as("edit_dist"),
        // two empty prefixes are identical (sim 1.0), not NULL via 0/0
        when(greatest(length($"pa"), length($"pb")) === 0, 1.0)
          .otherwise(lit(1.0) - levenshtein($"pa", $"pb").cast("double") /
            greatest(length($"pa"), length($"pb"))).as("prefix_sim"))
      .orderBy($"doc_a", $"doc_b")
  }

  private val editDistanceSql =
    s"""WITH d AS (
       |  SELECT doc_id, lang, source, substring(text, 1, $EditPrefixChars) AS prefix
       |  FROM documents)
       |SELECT a.lang, a.source, a.doc_id AS doc_a, b.doc_id AS doc_b,
       |  levenshtein(a.prefix, b.prefix) AS edit_dist,
       |  CASE WHEN greatest(length(a.prefix), length(b.prefix)) = 0 THEN 1.0
       |    ELSE 1.0 - CAST(levenshtein(a.prefix, b.prefix) AS DOUBLE)
       |      / greatest(length(a.prefix), length(b.prefix)) END AS prefix_sim
       |FROM d a JOIN d b ON a.lang = b.lang AND a.source = b.source
       |  AND a.doc_id < b.doc_id
       |ORDER BY doc_a, doc_b""".stripMargin

  // ------------------------------------------------------------- q_minhash_dedup
  /** Undirected candidate id pairs (doc_a < doc_b) from MinHash + LSH
    * banding. ID-ONLY: after signature computation, everything that moves
    * through the band shuffle, pair join, and `distinct()` is (doc_id,
    * band, band_hash) / (doc_a, doc_b) — shingle arrays never enter an
    * exchange here (asserted in DedupSpec).
    *
    * numHashes=16 grouped into 8 bands of 2: a pair lands in a candidate
    * bucket with prob 1-(1-j^2)^8 (≥97% for j≥0.5), while the full pair
    * matrix is never materialized. */
  def minhashCandidateIds(docs: DataFrame, numHashes: Int, rowsPerBand: Int): DataFrame = {
    import docs.sparkSession.implicits._
    import org.apache.spark.sql.expressions.Window
    val numBands = numHashes / rowsPerBand
    // one-pass native signature (TextExprs.TriGramMinHash) — the HOF
    // formulation re-evaluates the shingle array per hash after projection
    // collapse; the native call is a single text scan per row.
    // spread: the signature pipeline otherwise fuses into a single-task
    // single-row-group scan (Tables.spread)
    val sig = Tables.spread(docs).select($"doc_id",
      TextFunctions.trigramMinhash($"text", numHashes).as("sig"))
    // band value = hash of the band's slice of the signature; sig is
    // consumed here, so only (doc_id, band, band_hash) survives
    val banded = sig.select($"doc_id",
      posexplode(transform(sequence(lit(0), lit(numBands - 1)), b =>
        xxhash64(slice($"sig", b * rowsPerBand + 1, lit(rowsPerBand))))))
      .withColumnsRenamed(Map("pos" -> "band", "col" -> "band_hash"))
    // skew guard: drop degenerate buckets before the quadratic step
    // (n >= 2 also prunes singleton buckets that can't produce pairs).
    // A window over the id-only banded frame shares its exchange with the
    // pair self-join below (ReuseExchange), so the signature scan runs
    // ONCE — a groupBy-semi-join guard would add a second scan.
    val kept = banded
      .withColumn("bucket_n",
        count(lit(1)).over(Window.partitionBy($"band", $"band_hash")))
      .filter($"bucket_n".between(2, MaxBucket))
    val l = kept.select($"band", $"band_hash", $"doc_id".as("doc_a"))
    val r = kept.select($"band", $"band_hash", $"doc_id".as("doc_b"))
    l.join(r, Seq("band", "band_hash"))
      .filter($"doc_a" < $"doc_b")
      .select($"doc_a", $"doc_b")
      .distinct()
  }

  /** ASYMMETRIC banded candidates — the incremental near-dup shape: a
    * NEW batch probes the HISTORY side's band index, so only (band,
    * band_hash, id) rows of the new batch meet the pre-bucketed history
    * frame; history text never reshuffles per batch (at production
    * scale the banded history lives as a bucketed table keyed on
    * (band, band_hash) and this join is exchange-free on that side).
    * Directed (new -> history); the skew guard bounds HISTORY buckets
    * (a degenerate history bucket would quadratically amplify every
    * future batch — the guard is an index-build-time decision). */
  def incrementalMinhashCandidateIds(history: DataFrame, newDocs: DataFrame,
      numHashes: Int, rowsPerBand: Int): DataFrame = {
    import history.sparkSession.implicits._
    import org.apache.spark.sql.expressions.Window
    val numBands = numHashes / rowsPerBand
    def banded(docs: DataFrame, idAs: String) = Tables.spread(docs).select(
        col("doc_id").as(idAs),
        TextFunctions.trigramMinhash($"text", numHashes).as("sig"))
      .select(col(idAs),
        posexplode(transform(sequence(lit(0), lit(numBands - 1)), b =>
          xxhash64(slice($"sig", b * rowsPerBand + 1, lit(rowsPerBand))))))
      .withColumnsRenamed(Map("pos" -> "band", "col" -> "band_hash"))
    val histIdx = banded(history, "hist_doc")
      .withColumn("bucket_n",
        count(lit(1)).over(Window.partitionBy($"band", $"band_hash")))
      .filter($"bucket_n" <= MaxBucket)
      .select($"band", $"band_hash", $"hist_doc")
    banded(newDocs, "new_doc")
      .join(histIdx, Seq("band", "band_hash"))
      .select($"new_doc", $"hist_doc")
      .distinct()
  }

  /** Candidate pairs with shingle-SET hashes re-attached for exact-Jaccard
    * verification: ONE re-join per side after the id-level `distinct()` —
    * the only point where arrays are shuffled, proportional to the
    * candidate set, not bands x corpus. */
  def minhashCandidates(docs: DataFrame, numHashes: Int, rowsPerBand: Int): DataFrame = {
    import docs.sparkSession.implicits._
    val hs = Tables.spread(docs)
      .select($"doc_id", TextFunctions.trigramHashes($"text").as("hs"))
    minhashCandidateIds(docs, numHashes, rowsPerBand)
      .join(hs.select($"doc_id".as("doc_a"), $"hs".as("hs_a")), "doc_a")
      .join(hs.select($"doc_id".as("doc_b"), $"hs".as("hs_b")), "doc_b")
      .select($"doc_a", $"doc_b", $"hs_a", $"hs_b")
  }

  /** Resolve near-dup PAIRS into duplicate GROUPS: connected components
    * by iterative min-label propagation — each doc's label becomes the
    * smallest doc_id reachable from it; one keep-doc per component is
    * then `label == doc_id`. This is the step real dedup pipelines run
    * after LSH pair generation (pairs are not transitive-closed: A~B,
    * B~C must collapse to one cluster even when A~C was never emitted).
    *
    * Scale shape: each round is one equi-join (edges x labels, keyed on
    * id) + one min-aggregation — all hash-partitioned on doc_id, no
    * payload. Rounds needed = cluster diameter, and near-dup components
    * are shallow (dup clusters are cliques-ish through their LSH
    * buckets), so the default cap is generous; lineage is cut per round
    * with localCheckpoint so the plan doesn't grow with iterations.
    * (For adversarial long-chain graphs the large-star/small-star
    * variant converges in O(log n) rounds; not needed for dedup.) */
  /** How often resolveClusters polls for convergence. Both the
    * changed-count and the lineage-cutting localCheckpoint are driver
    * barriers, so they run once per `checkEvery` propagation rounds
    * instead of every round (~3× fewer barriers on deep components).
    * Sound because min-label propagation is monotone: a round that
    * changes nothing is followed only by rounds that change nothing, so
    * a zero changed-count at ANY round proves convergence. */
  val ConvergenceCheckEvery = 3

  def resolveClusters(pairs: DataFrame, maxIter: Int = 20,
      checkEvery: Int = ConvergenceCheckEvery): DataFrame = {
    import pairs.sparkSession.implicits._
    require(maxIter >= 1, s"maxIter must be >= 1, got $maxIter")
    // upper bound too: checkEvery uncheckpointed rounds stack join+agg
    // lineage between barriers, and unbounded plan growth is exactly what
    // the per-batch localCheckpoint exists to prevent
    require(checkEvery >= 1 && checkEvery <= 10,
      s"checkEvery must be in [1, 10], got $checkEvery")
    val edges = pairs.select($"doc_a".as("src"), $"doc_b".as("dst"))
      .unionByName(pairs.select($"doc_b".as("src"), $"doc_a".as("dst")))
      .distinct()
      .lineageCut(true)
    var labels = edges.select($"src".as("doc_id")).distinct()
      .withColumn("cluster_id", $"doc_id")
      .lineageCut(true)
    var converged = false
    var i = 0
    var lastMat: DataFrame = null
    while (!converged && i < maxIter) {
      val neighborMin = edges
        .join(labels.withColumnRenamed("doc_id", "src"), Seq("src"))
        .groupBy($"dst".as("doc_id"))
        .agg(min($"cluster_id").as("neighbor_min"))
      // carry the old label through the update so convergence detection
      // is a filter over the SAME frame — no extra join per round
      val updated = labels.join(neighborMin, Seq("doc_id"), "left")
        .select($"doc_id",
          least($"cluster_id", coalesce($"neighbor_min", $"cluster_id"))
            .as("cluster_id"),
          $"cluster_id".as("__old_id"))
      i += 1
      if (i % checkEvery == 0 || i == maxIter) {
        // batch barrier: cut lineage AND poll convergence (one round's
        // zero-change implies a fixed point, see ConvergenceCheckEvery)
        val mat = updated.lineageCut(true)
        // the previous boundary's blocks are dead once this one is
        // materialized — release them so live label storage is one
        // boundary, not maxIter/checkEvery of them (the kcore sf10
        // eviction-thrash lesson, round 12)
        if (lastMat ne null) lastMat.unpersist(blocking = false)
        lastMat = mat
        converged = mat.filter($"cluster_id" < $"__old_id").count() == 0
        labels = mat.drop("__old_id")
      } else {
        labels = updated.drop("__old_id")
      }
    }
    // partially-propagated labels are silently WRONG output (a split
    // cluster whose id is not its min member) — fail loudly instead
    if (!converged) throw new IllegalStateException(
      s"resolveClusters did not converge in $maxIter rounds — a component's " +
        s"diameter exceeds the cap; raise maxIter")
    labels
  }

  // ------------------------------------------------------------ q_dedup_clusters
  /** MinHash pairs -> exact-Jaccard verification -> connected components:
    * the full near-dup dedup decision, end to end. Runs over the planted
    * corpus (see [[minhashVerifiedPairs]]) so the expected answer is
    * derivable: the oracle brute-forces the same ≥-threshold pair set in
    * SQL and replays the connected components with a recursive-CTE
    * min-label propagation — components here mix natural near-dup pairs,
    * planted (doc, trunc) pairs, and cross pairs, so a split or merged
    * component from EITHER the candidate generator or the resolver
    * surfaces as a hash mismatch. Output is one row per clustered doc
    * with its cluster id (= smallest member, the keep-doc) and size. */
  private def dedupClusters(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(s, dir)
    Similarity.requirePlantable(docs, "doc_id", "dedupClusters")
    val verified = minhashVerifiedPairs(docs).select($"doc_a", $"doc_b")
    resolveClusters(verified)
      .withColumn("cluster_size",
        count(lit(1)).over(Window.partitionBy($"cluster_id")))
      .orderBy($"cluster_id", $"doc_id")
  }

  /** Fixed propagation depth for the oracle's recursive CTE. Spark's
    * resolveClusters iterates to a VERIFIED fixed point; SQL recursion
    * can't poll, so the oracle runs a depth comfortably above the
    * largest component diameter the planted fixture can produce
    * (near-dup components are clique-ish: diameters stay ≤ ~4). A too-
    * shallow depth would show up as a mismatch, never a false pass. */
  private val ClusterOracleIters = 10

  /** Recursive min-label propagation over the verified pair graph —
    * shared by the cluster and canonical-selection oracles. Expects the
    * `verified` CTE in scope; yields `final(doc_id, cluster_id)`. */
  private def minhashClusterGraphSql: String =
    s"""e0 AS (SELECT doc_a, doc_b FROM verified),
       |edges AS MATERIALIZED (
       |  SELECT doc_a AS src, doc_b AS dst FROM e0
       |  UNION SELECT doc_b, doc_a FROM e0
       |  UNION SELECT doc_a, doc_a FROM e0
       |  UNION SELECT doc_b, doc_b FROM e0),
       |nodes AS MATERIALIZED (SELECT DISTINCT src AS node FROM edges),
       |lp(iter, node, label) AS (
       |  SELECT 0, node, node FROM nodes
       |  UNION ALL
       |  SELECT lp.iter + 1, e.dst, MIN(lp.label)
       |  FROM lp JOIN edges e ON lp.node = e.src
       |  WHERE lp.iter < $ClusterOracleIters
       |  GROUP BY lp.iter + 1, e.dst),
       |final AS (
       |  SELECT node AS doc_id, label AS cluster_id
       |  FROM lp WHERE iter = $ClusterOracleIters)""".stripMargin

  private val dedupClustersSql =
    s"""WITH RECURSIVE ${minhashPlantedSetsSql},
       |${minhashClusterGraphSql}
       |SELECT doc_id, cluster_id,
       |  COUNT(*) OVER (PARTITION BY cluster_id) AS cluster_size
       |FROM final ORDER BY cluster_id, doc_id""".stripMargin

  // ------------------------------------------------------ q_incremental_neardup
  /** Incremental NEAR-dup of a new batch against the historical corpus
    * — the production mode of MinHash dedup (full-corpus re-pairing per
    * ingest is unaffordable; each batch probes the standing band
    * index): history = the base documents, new batch = the planted
    * truncated mirrors, candidates from [[incrementalMinhashCandidateIds]]
    * (directed new -> history), verified by exact shingle-set Jaccard >=
    * the admission threshold. The oracle BRUTE-FORCES the complete
    * new x history >= threshold pair set in SQL, so banding recall on
    * the asymmetric path, the directedness, and the verifier are all
    * hash-checked — complementing q_incremental_dedup (exact digests)
    * with the near-dup tier of the same incremental contract. */
  private def incrementalNearDup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
    Similarity.requirePlantable(docs, "doc_id", "incrementalNearDup")
    val history = docs.select($"doc_id", $"text")
    val w = split($"text", " ", -1)
    val newBatch = docs.select(
      ($"doc_id" + Similarity.PlantOffset).as("doc_id"),
      concat_ws(" ",
        slice(w, lit(1), greatest(size(w) - TruncateWords, lit(3))))
        .as("text"))
    val hs = Tables.spread(history.unionByName(newBatch))
      .select($"doc_id", TextFunctions.trigramHashes($"text").as("hs"))
    incrementalMinhashCandidateIds(history, newBatch,
        numHashes = 16, rowsPerBand = 2)
      .join(hs.select($"doc_id".as("new_doc"), $"hs".as("hs_n")), "new_doc")
      .join(hs.select($"doc_id".as("hist_doc"), $"hs".as("hs_h")), "hist_doc")
      .select($"new_doc", $"hist_doc",
        jaccard($"hs_n", $"hs_h").as("jaccard"))
      .filter($"jaccard" >= MinHashRecallJaccard)
      .orderBy($"new_doc", $"hist_doc")
  }

  private val incrementalNearDupSql =
    s"""WITH ${minhashPlantedSetsSql}
       |SELECT n.doc_id AS new_doc, h.doc_id AS hist_doc,
       |  CAST(len(list_filter(n.sh, x -> list_contains(h.sh, x))) AS DOUBLE)
       |    / (len(n.sh) + len(h.sh)
       |       - len(list_filter(n.sh, x -> list_contains(h.sh, x))))
       |    AS jaccard
       |FROM d n JOIN d h
       |  ON n.doc_id >= ${Similarity.PlantOffset}
       |  AND h.doc_id < ${Similarity.PlantOffset}
       |WHERE CAST(len(list_filter(n.sh, x -> list_contains(h.sh, x))) AS DOUBLE)
       |    / (len(n.sh) + len(h.sh)
       |       - len(list_filter(n.sh, x -> list_contains(h.sh, x))))
       |    >= $MinHashRecallJaccard
       |ORDER BY new_doc, hist_doc""".stripMargin

  // ------------------------------------------------------------ q_canonical_docs
  /** Survivorship selection after near-dup clustering — the step a
    * dedup pipeline runs LAST: within each resolved near-dup cluster,
    * keep the canonical member (longest text; doc_id breaks ties —
    * near-dup clusters mix originals with truncated mirrors, and
    * "longest survives" is the standard keep rule since truncation only
    * loses content) and account for what the drop costs. Emits one row
    * per cluster: canonical doc + length, member count, total vs
    * dropped chars. The canonical election is a single exact
    * `min(struct(-len, doc_id))` aggregate — no window, no shuffle
    * beyond the cluster_id groupBy, deterministic under any tie.
    *
    * Scale shape: cluster resolution is the audited iterative resolver;
    * the election adds ONE keyed aggregation over (doc, cluster) rows —
    * lengths ride as a single long, text never shuffles. */
  private def canonicalDocs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
    Similarity.requirePlantable(docs, "doc_id", "canonicalDocs")
    val planted = plantedNearDupDocs(docs)
      .select($"doc_id", length($"text").cast("long").as("len"))
    val verified = minhashVerifiedPairs(docs).select($"doc_a", $"doc_b")
    resolveClusters(verified)
      .join(planted, Seq("doc_id"))
      .groupBy($"cluster_id")
      .agg(count(lit(1)).as("n_members"),
        sum($"len").as("total_chars"),
        min(struct((-$"len").as("neg_len"), $"doc_id")).as("__c"))
      .select($"cluster_id", $"__c.doc_id".as("canonical_doc"),
        (-$"__c.neg_len").as("canonical_len"), $"n_members",
        $"total_chars", ($"total_chars" + $"__c.neg_len").as("dropped_chars"))
      .orderBy($"cluster_id")
  }

  private val canonicalDocsSql =
    s"""WITH RECURSIVE ${minhashPlantedSetsSql},
       |${minhashClusterGraphSql},
       |lens AS (
       |  SELECT doc_id, CAST(length(array_to_string(w, ' ')) AS BIGINT) AS len
       |  FROM planted),
       |joined AS (
       |  SELECT f.cluster_id, f.doc_id, l.len
       |  FROM final f JOIN lens l USING (doc_id)),
       |ranked AS (
       |  SELECT cluster_id, doc_id, len,
       |    ROW_NUMBER() OVER (PARTITION BY cluster_id
       |                       ORDER BY len DESC, doc_id) AS rn
       |  FROM joined),
       |agg AS (
       |  SELECT cluster_id, COUNT(*) AS n_members,
       |    CAST(SUM(len) AS BIGINT) AS total_chars
       |  FROM joined GROUP BY cluster_id)
       |SELECT a.cluster_id, r.doc_id AS canonical_doc,
       |  r.len AS canonical_len, a.n_members, a.total_chars,
       |  a.total_chars - r.len AS dropped_chars
       |FROM agg a JOIN ranked r ON a.cluster_id = r.cluster_id AND r.rn = 1
       |ORDER BY a.cluster_id""".stripMargin

  // ------------------------------------------------------ q_cluster_propagation
  /** Driver-visible gate for the iterative cluster resolver — the
    * planted-expected-answer pattern (same contract as the recall
    * gates): plant a COPY CHAIN per document, `1 + doc_id % 3` copies at
    * id + k·PlantOffset linked as a PATH (original—copy1—copy2—…), and
    * run the REAL `resolveClusters` rounds over those edges. Paths are
    * the worst case for min-label propagation (diameter = chain length,
    * vs 1 for the clique a digest group would form), so diameters 1–3
    * exercise multi-round convergence through the genuine
    * localCheckpoint/batched-polling path. The expected answer is pure
    * id arithmetic — cluster id = original doc_id, size = 2 + doc_id % 3
    * — so a split or merged component (the propagation failure mode
    * kernel specs can miss) surfaces as a hash-mismatched CORRECTNESS
    * row. Complements q_dedup_clusters, whose LSH pair generation is
    * not SQL-expressible. */
  private def clusterPropagation(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
    Similarity.requirePlantable(docs, "doc_id", "clusterPropagation")
    val P = Similarity.PlantOffset
    // edge k links copy k-1 (k=1: the original) to copy k
    val edges = docs.select($"doc_id",
        explode(sequence(lit(1L), lit(1L) + pmod($"doc_id", lit(3L)))).as("k"))
      .select(($"doc_id" + ($"k" - 1) * P).as("doc_a"),
        ($"doc_id" + $"k" * P).as("doc_b"))
    resolveClusters(edges)
      .groupBy($"cluster_id")
      .agg(count(lit(1)).as("cluster_size"))
      .orderBy($"cluster_id")
  }

  private val clusterPropagationSql =
    """SELECT doc_id AS cluster_id,
      |  CAST(2 + doc_id % 3 AS BIGINT) AS cluster_size
      |FROM documents ORDER BY cluster_id""".stripMargin

  /** Connected components in O(log d) rounds: alternating
    * large-star/small-star contraction (Kiveris et al., "Connected
    * Components in MapReduce and Beyond", SoCC'14 — public algorithm).
    * Same contract as [[resolveClusters]] (labels = smallest reachable
    * id), different round complexity: min-label propagation needs
    * diameter-many rounds, star contraction roughly halves the diameter
    * every round, so path-shaped components of length d converge in
    * ~2·log₂(d) rounds instead of d. This is the resolver to reach for
    * when components are NOT shallow — e.g. chained near-dup editions
    * (v1~v2~v3~…) or URL/redirect graphs — where propagation's
    * per-round barrier count would dominate the job.
    *
    * Round shape (all id-only, no payload):
    *  - large-star: one shuffle keyed on the node (window MIN over the
    *    symmetrized neighbor list) — every neighbor larger than u links
    *    to u's minimum; components stay connected, long tails fold in
    *    half;
    *  - small-star: one shuffle keyed on the LARGER endpoint of each
    *    edge — a node and its smaller neighbors all link to their
    *    minimum;
    *  - one distinct per star op bounds the edge multiset (emitted
    *    stars overlap), and a per-round localCheckpoint cuts lineage
    *    exactly like the propagation resolver.
    * Convergence: LS∘SS is deterministic and monotone in the paper's
    * potential, so "round output == round input" IS the fixed point —
    * checked with a count + one-sided exceptAll at `checkEvery`
    * boundaries. At the fixed point every component is a star rooted at
    * its minimum id, so labels fall out of the edge list directly; a
    * final left-join re-attaches nodes whose only edges were
    * self-loops (stars drop them, the propagation resolver keeps them). */
  def resolveClustersStar(pairs: DataFrame, maxIter: Int = 16,
      checkEvery: Int = 2): DataFrame = {
    import pairs.sparkSession.implicits._
    import org.apache.spark.sql.expressions.Window
    require(maxIter >= 1, s"maxIter must be >= 1, got $maxIter")
    require(checkEvery >= 1 && checkEvery <= 10,
      s"checkEvery must be in [1, 10], got $checkEvery")
    // every node ever seen, including self-loop-only ones — re-attached
    // at the end so the output node set matches resolveClusters exactly
    val nodes = pairs.select($"doc_a".as("doc_id"))
      .unionByName(pairs.select($"doc_b".as("doc_id")))
      .distinct()
      .lineageCut(true)
    // canonical undirected state: (lo, hi), lo < hi, set-valued
    var canon = pairs
      .select(least($"doc_a", $"doc_b").as("lo"),
        greatest($"doc_a", $"doc_b").as("hi"))
      .filter($"lo" =!= $"hi")
      .distinct()
      .lineageCut(true)

    // large-star: per node u over the SYMMETRIZED neighbor list, every
    // strictly-larger neighbor v links to m = min(Γ(u) ∪ {u}); m ≤ u < v,
    // so (m, v) is already canonical and never a self-loop
    def largeStar(e: DataFrame): DataFrame = {
      val sym = e.select($"lo".as("u"), $"hi".as("v"))
        .unionByName(e.select($"hi".as("u"), $"lo".as("v")))
      sym
        .withColumn("m", least(min($"v").over(Window.partitionBy($"u")), $"u"))
        .filter($"v" > $"u")
        .select($"m".as("lo"), $"v".as("hi"))
      // no distinct here: small-star dedups at round end, and the input
      // was a set, so LS emits each (m, v) at most twice (once per
      // endpoint's star) — one exchange per round saved for a <=2x
      // transient multiset, which the very next window absorbs
    }

    // small-star: per node u over its SMALLER neighbors (each canonical
    // edge processed once, at its larger endpoint), u and all of Γ<(u)
    // link to m = min(Γ<(u)); emits (m, x) for x ∈ Γ<(u) ∪ {u}, x ≠ m
    def smallStar(e: DataFrame): DataFrame = {
      val w = Window.partitionBy($"u")
      e.select($"hi".as("u"), $"lo".as("v"))
        .withColumn("m", min($"v").over(w))
        .select(
          explode(array(
            struct($"m".as("lo"), $"u".as("hi")),
            struct(least($"v", $"m").as("lo"), greatest($"v", $"m").as("hi"))))
            .as("e"))
        .select($"e.lo", $"e.hi")
        .filter($"lo" =!= $"hi")
        .distinct()
    }

    // convergence is detected by comparing CONSECUTIVE MATERIALIZED
    // BOUNDARIES (round b vs round b - checkEvery), never adjacent
    // rounds: comparing round b to b-1 would aggregate the
    // UNCHECKPOINTED b-1 frame and silently re-execute a full round's
    // shuffles per boundary. Gap equality is still a sound fixed-point
    // proof: the round function is deterministic, and Kiveris et al.
    // prove LS∘SS converges (a potential strictly decreases until the
    // fixed point) — so output(b) == output(b-k) would otherwise be a
    // period-k cycle, which convergence rules out; equality across any
    // gap therefore pins the fixed point. Costs at most checkEvery
    // extra (cheap) rounds of detection lag, in exchange for boundaries
    // that only ever touch checkpointed data.
    // The (count, hash-sum) signature is a CHEAP NEGATIVE FILTER — two
    // tiny aggregates vs exceptAll's shuffle — so the exact set check
    // runs once, at the true fixed point; a colliding signature merely
    // costs one extra exceptAll, never a wrong answer.
    def sig(df: DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)),
        coalesce(sum(xxhash64($"lo", $"hi")), lit(0L))).head()
      (r.getLong(0), r.getLong(1))
    }
    var lastBoundary: Option[(DataFrame, (Long, Long))] = None
    var converged = false
    var i = 0
    // loop-scoped execution sizing (LoopTune): the per-round frames only
    // SHRINK from the initial canonical edge set (the LS∘SS potential),
    // so sizing the loop's exchanges from the materialized initial frame
    // is an upper bound for every round; 32 B/row covers (lo, hi) plus
    // row overhead. AQE off inside the scope turns each boundary's 6-7
    // per-exchange stage-jobs into one job (see LoopTune's profile note).
    val spark = pairs.sparkSession
    val loopParts = graft.LoopTune.partitionsForRows(
      spark, canon.count(), 32L)
    graft.LoopTune.scoped(spark, loopParts) {
      while (!converged && i < maxIter) {
        val next = smallStar(largeStar(canon))
        i += 1
        if (i % checkEvery == 0 || i == maxIter) {
          val mat = next.lineageCut(true)
          val matSig = sig(mat)
          converged = lastBoundary.exists { case (prev, prevSig) =>
            prevSig == matSig && mat.exceptAll(prev).isEmpty
          }
          // the superseded boundary's edge-scale blocks are dead after
          // the exceptAll above — release them so live storage is two
          // boundaries (mat + the new lastBoundary), not maxIter/
          // checkEvery of them (the kcore sf10 eviction-thrash lesson)
          lastBoundary.foreach(_._1.unpersist(blocking = false))
          lastBoundary = Some((mat, matSig))
          canon = mat
        } else {
          canon = next
        }
      }
    }
    if (!converged) throw new IllegalStateException(
      s"resolveClustersStar did not converge in $maxIter rounds — raise " +
        s"maxIter (rounds needed ≈ 2·log₂(component diameter))")
    // fixed point = stars rooted at component minima: edge (lo, hi) IS
    // the label assignment hi -> lo; roots and self-loop-only nodes
    // label themselves
    val labels = canon.select($"hi".as("doc_id"), $"lo".as("cluster_id"))
    nodes.join(labels, Seq("doc_id"), "left")
      .select($"doc_id", coalesce($"cluster_id", $"doc_id").as("cluster_id"))
  }

  // ------------------------------------------------------------- q_cluster_star
  /** Driver-visible gate for the star resolver, on the graph shape that
    * motivates it: per document a planted copy CHAIN of 24 + doc_id % 8
    * copies (ids doc_id + k·PlantOffset, consecutive edges only) — path
    * components of diameter 24-32, beyond the propagation resolver's
    * default 20-round cap, resolved here in ≤ 16 star rounds. The
    * expected answer is pure id arithmetic (cluster id = original
    * doc_id, size = 25 + doc_id % 8), so a split, merged, or mis-rooted
    * component surfaces as a hash-mismatched CORRECTNESS row.
    * DedupSpec asserts propagation at the default cap refuses exactly
    * this graph while the star resolver labels it identically to
    * uncapped propagation. */
  val StarChainBase = 24
  val StarChainMod = 8

  private def clusterStar(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
    Similarity.requirePlantable(docs, "doc_id", "clusterStar")
    val P = Similarity.PlantOffset
    val edges = docs.select($"doc_id",
        explode(sequence(lit(1L),
          lit(StarChainBase.toLong) + pmod($"doc_id", lit(StarChainMod.toLong))))
          .as("k"))
      .select(($"doc_id" + ($"k" - 1) * P).as("doc_a"),
        ($"doc_id" + $"k" * P).as("doc_b"))
    resolveClustersStar(edges, checkEvery = 1)
      .groupBy($"cluster_id")
      .agg(count(lit(1)).as("cluster_size"))
      .orderBy($"cluster_id")
  }

  private val clusterStarSql =
    s"""SELECT doc_id AS cluster_id,
       |  CAST(${StarChainBase + 1} + doc_id % $StarChainMod AS BIGINT)
       |    AS cluster_size
       |FROM documents ORDER BY cluster_id""".stripMargin

  /** The shared planted corpus behind the MinHash pair/cluster/recall
    * gates: base docs ∪ one truncated near-dup per doc (last
    * `TruncateWords` words dropped, 3-word floor) at id + PlantOffset.
    * Truncation is a list slice, so a SQL oracle can replay the copies
    * — and their exact Jaccard — from the base table alone. */
  def plantedNearDupDocs(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    val w = split($"text", " ", -1)
    val trunc = concat_ws(" ",
      slice(w, lit(1), greatest(size(w) - TruncateWords, lit(3))))
    docs.select($"doc_id", $"text")
      .unionByName(docs.select(
        ($"doc_id" + Similarity.PlantOffset).as("doc_id"), trunc.as("text")))
  }

  /** The full MinHash near-dup DECISION kernel over the planted corpus:
    * real banded candidate generation → one payload re-join → exact
    * shingle-set Jaccard ≥ `MinHashRecallJaccard` admission. The output
    * pair set mixes three deterministic populations — the corpus's
    * NATURAL near-dup pairs (the fixture ships ~25 at j ≥ 0.9), the 414
    * planted (doc, trunc) self-pairs, and cross pairs (doc_i, trunc_j)
    * where i's text nearly duplicates j's — all of which a brute-force
    * SQL oracle enumerates exactly. */
  def minhashVerifiedPairs(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    minhashCandidates(plantedNearDupDocs(docs), numHashes = 16, rowsPerBand = 2)
      .select($"doc_a", $"doc_b", jaccard($"hs_a", $"hs_b").as("jaccard"))
      .filter($"jaccard" >= MinHashRecallJaccard)
  }

  /** Verified near-dup PAIRS through the production path, oracle-pinned:
    * the DuckDB side recomputes the complete ≥-threshold pair set by
    * brute force (fixture-bounded), so banding recall, the hash re-join,
    * and the exact-Jaccard verifier are all on the hook — a single
    * missed or spurious pair, or one wrong Jaccard double, fails the
    * hash compare. (Formerly emitted the raw top-100 candidate list,
    * which no SQL oracle can replay — a rows-only CORRECTNESS row.) */
  private def minhashDedup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
    Similarity.requirePlantable(docs, "doc_id", "minhashDedup")
    minhashVerifiedPairs(docs).orderBy($"doc_a", $"doc_b")
  }

  /** Shingle-set CTE shared by the pair and cluster oracles: word lists,
    * truncated word lists, the planted union, and per-doc shingle sets. */
  /** Oracle cost notes (sf0.1 is the binding scale): every CTE the
    * recursive label propagation references is `AS MATERIALIZED` —
    * DuckDB otherwise INLINES the whole chain into each recursive
    * iteration, re-running the O(n²) brute force once per round (the
    * two cluster oracles timed out the default 600s sweep budget that
    * way; materialized they run in ~1 min). The pair join also carries
    * a PROVABLY LOSSLESS size prefilter: J(A,B) = |A∩B|/|A∪B| ≤
    * min(|A|,|B|)/max(|A|,|B|), so J ≥ t requires each shingle-set
    * length ≥ t× the other — a cheap integer compare that prunes most
    * of the n² grid BEFORE the expensive list intersection, without
    * depending on the banding path under test. */
  private def minhashPlantedSetsSql: String =
    s"""t AS (
       |  SELECT doc_id, w, w[1:greatest(len(w) - $TruncateWords, 3)] AS wt
       |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)),
       |planted AS (
       |  SELECT doc_id, w FROM t
       |  UNION ALL
       |  SELECT doc_id + ${Similarity.PlantOffset}, wt FROM t),
       |d AS MATERIALIZED (
       |  SELECT doc_id,
       |    list_distinct(CASE WHEN len(w) >= 3
       |      THEN list_transform(generate_series(1, len(w) - 2),
       |                          i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
       |      ELSE [array_to_string(w, ' ')] END) AS sh
       |  FROM planted),
       |pairs AS MATERIALIZED (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |    CAST(len(list_filter(a.sh, x -> list_contains(b.sh, x))) AS DOUBLE)
       |      / (len(a.sh) + len(b.sh)
       |         - len(list_filter(a.sh, x -> list_contains(b.sh, x)))) AS jaccard
       |  FROM d a JOIN d b ON a.doc_id < b.doc_id
       |    AND len(a.sh) >= $MinHashRecallJaccard * len(b.sh)
       |    AND len(b.sh) >= $MinHashRecallJaccard * len(a.sh)),
       |verified AS MATERIALIZED (
       |  SELECT doc_a, doc_b, jaccard FROM pairs
       |  WHERE jaccard >= $MinHashRecallJaccard)""".stripMargin

  private[operators] val minhashDedupSql =
    s"""WITH ${minhashPlantedSetsSql}
       |SELECT doc_a, doc_b, jaccard FROM verified
       |ORDER BY doc_a, doc_b""".stripMargin

  // ----------------------------------------------------------- q_minhash_recall
  /** Driver-visible recall gate for the MinHash+LSH path: plant one
    * near-duplicate per document (the text truncated by its last
    * `TruncateWords` words → word-shingle Jaccard ≈ 0.9), run the REAL
    * banded candidate generator over the union frame, and emit every
    * planted pair with exact Jaccard >= `MinHashRecallJaccard` plus a
    * `found` boolean. Truncation is a list slice, so the oracle computes
    * the full expected answer in SQL — the pair set, the Jaccard values,
    * and found=TRUE throughout. Margin math, honestly: per-pair banding
    * MISS probability is (1-j²)⁸ — ~1.7e-6 at the planted j ≈ 0.9 of a
    * typical 40-60-word doc, but up to 2.8e-4 at the gate's j = 0.8
    * admission floor (docs of 27-35 words land there). The gate is
    * deterministic (fixed hashes, fixed corpus — no flake), and is
    * verified green at every contract scale; a corpus revision that
    * introduces a miss surfaces as an explicit found=false row, the
    * signal the gate exists to give. Planting also doubles each text's
    * copy count, so a text with > MaxBucket/2 exact copies would
    * overflow its band bucket and drop — run exact dedup first (as any
    * real pipeline does) before pointing this gate at such a corpus.
    * A MinHash recall miss or an exact-Jaccard bug both surface as hash
    * mismatches. Same scale shape as the path it checks: 2n-row id-only
    * banding. (TruncateWords / MinHashRecallJaccard are declared at the
    * top of the object — init-order contract of the oracle vals.) */
  private def minhashRecall(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
    Similarity.requirePlantable(docs, "doc_id", "minhashRecall")
    val w = split($"text", " ", -1)
    val trunc = concat_ws(" ",
      slice(w, lit(1), greatest(size(w) - TruncateWords, lit(3))))
    val planted = plantedNearDupDocs(docs)
    // exact side over the native one-pass shingle-hash sets — the same
    // basis the minhash verifier uses, and value-identical to the
    // oracle's string-shingle Jaccard (64-bit hashes: a within-doc
    // collision altering the ratio is ~1e-17). The string-shingle
    // spelling here would hit the CollapseProject HOF-recompute trap:
    // `shingles(trunc)` inlines the split+slice+concat chain into every
    // lambda element — O(len²) per doc, 30s+ at sf0.1.
    val exact = Tables.spread(docs)
      .select($"doc_id",
        jaccard(TextFunctions.trigramHashes($"text"),
          TextFunctions.trigramHashes(trunc)).as("jaccard"))
      .filter($"jaccard" >= MinHashRecallJaccard)
    val found = minhashCandidateIds(planted, numHashes = 16, rowsPerBand = 2)
      .filter($"doc_b" === $"doc_a" + Similarity.PlantOffset)
      .select($"doc_a".as("doc_id"))
      .withColumn("__hit", lit(true))
    exact.join(found, Seq("doc_id"), "left")
      .select($"doc_id", $"jaccard", coalesce($"__hit", lit(false)).as("found"))
      .orderBy($"doc_id")
  }

  private val minhashRecallSql =
    s"""WITH t AS (
       |  SELECT doc_id, w, w[1:greatest(len(w) - $TruncateWords, 3)] AS wt
       |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)),
       |sh AS (
       |  SELECT doc_id,
       |    list_distinct(CASE WHEN len(w) >= 3
       |      THEN list_transform(generate_series(1, len(w) - 2),
       |                          i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
       |      ELSE [array_to_string(w, ' ')] END) AS sh_a,
       |    list_distinct(CASE WHEN len(wt) >= 3
       |      THEN list_transform(generate_series(1, len(wt) - 2),
       |                          i -> wt[i] || ' ' || wt[i+1] || ' ' || wt[i+2])
       |      ELSE [array_to_string(wt, ' ')] END) AS sh_b
       |  FROM t)
       |SELECT * FROM (
       |  SELECT doc_id,
       |    CAST(len(list_filter(sh_a, x -> list_contains(sh_b, x))) AS DOUBLE)
       |      / (len(sh_a) + len(sh_b)
       |         - len(list_filter(sh_a, x -> list_contains(sh_b, x)))) AS jaccard,
       |    TRUE AS found
       |  FROM sh)
       |WHERE jaccard >= $MinHashRecallJaccard
       |ORDER BY doc_id""".stripMargin

  // ------------------------------------------------------------ q_simhash_dedup
  /** SimHash near-dup detection: one 64-bit fingerprint per document
    * (sign-aggregated token hashes — SimHash64 codegen expression), then
    * banded candidate generation: 4 x 16-bit bands of the fingerprint; by
    * pigeonhole, any pair within hamming distance 3 shares at least one
    * exact band, so banding has recall 1.0 for the <=3-bit threshold
    * AMONG buckets within the `MaxBucket` skew cap (asserted against
    * brute force in DedupSpec at test scale, where no bucket is hot).
    * A band bucket larger than MaxBucket means >1000 near-identical
    * fingerprints — i.e. a mass-duplicate cluster that the exact-dedup
    * pass (q_dedup_exact) is the right tool for; run it first, as every
    * web-scale dedup pipeline does, and the cap only drops pairs exact
    * dedup already collapsed. The join carries only (doc_id, fp) — two
    * longs — and hamming verification is `bit_count(fp_a XOR fp_b)`,
    * no payload re-join needed at all. */
  val SimHashMaxHamming = 3

  def simhashPairs(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    import org.apache.spark.sql.expressions.Window
    val fp = docs.select($"doc_id",
      TextFunctions.simhash64(split($"text", " ", -1)).as("fp"))
    val banded = fp.select($"doc_id", $"fp",
      posexplode(array((0 until 4).map(b =>
        shiftrightunsigned($"fp", b * 16).bitwiseAND(lit(0xFFFFL))): _*)))
      .withColumnsRenamed(Map("pos" -> "band", "col" -> "band_val"))
    val kept = banded
      .withColumn("bucket_n",
        count(lit(1)).over(Window.partitionBy($"band", $"band_val")))
      .filter($"bucket_n".between(2, MaxBucket))
    val l = kept.select($"band", $"band_val", $"doc_id".as("doc_a"), $"fp".as("fp_a"))
    val r = kept.select($"band", $"band_val", $"doc_id".as("doc_b"), $"fp".as("fp_b"))
    l.join(r, Seq("band", "band_val"))
      .filter($"doc_a" < $"doc_b")
      .select($"doc_a", $"doc_b", $"fp_a", $"fp_b")
      .distinct()
      .select($"doc_a", $"doc_b",
        bit_count($"fp_a".bitwiseXOR($"fp_b")).as("hamming"))
      .filter($"hamming" <= SimHashMaxHamming)
  }

  /** Banded SimHash near-dup pairs with their hamming distances, FULLY
    * oracle-pinned: the token hash is md5-lower-64 (= DuckDB's
    * `md5_number_lower`), so the oracle recomputes every fingerprint
    * from raw text, brute-forces the complete ≤-`SimHashMaxHamming`
    * pair set (fixture-bounded), and the banded path must reproduce it
    * exactly — banding recall is structural (pigeonhole over 4 16-bit
    * bands), so equality holds whenever no bucket overflows `MaxBucket`.
    * A wrong fingerprint bit, a dropped band, or a hamming off-by-one
    * all fail the hash compare. (Formerly rows-only: the FNV-based
    * fingerprint was not SQL-replayable.) */
  private def simhashDedup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    simhashPairs(Tables.documents(s, dir))
      .orderBy($"doc_a", $"doc_b")
  }

  /** Per-doc SimHash fingerprint CTE (UBIGINT) — the exact replay of
    * TextImpl.simhash: md5_number_lower per word (empty tokens kept,
    * matching split(text, ' ', -1)), ±1 per bit lane, bit = sign>0. */
  private def simhashFpSql: String =
    """w AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS word
      |  FROM documents),
      |h AS (SELECT doc_id, md5_number_lower(word) AS h FROM w),
      |bits AS (
      |  SELECT doc_id, b,
      |    CASE WHEN SUM(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) > 0
      |         THEN (1::UBIGINT << b) ELSE 0::UBIGINT END AS bitval
      |  FROM h CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS b) t
      |  GROUP BY doc_id, b),
      |fp AS (SELECT doc_id, SUM(bitval)::UBIGINT AS fp FROM bits GROUP BY doc_id)""".stripMargin

  private val simhashDedupSql =
    s"""WITH $simhashFpSql
       |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |  CAST(bit_count(xor(a.fp, b.fp)) AS INTEGER) AS hamming
       |FROM fp a JOIN fp b ON a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.fp, b.fp)) <= $SimHashMaxHamming
       |ORDER BY doc_a, doc_b""".stripMargin

  // ----------------------------------------------------------- q_simhash_recall
  // audited-bnlj(q_simhash_recall): build side = 1-row global-aggregate broadcast — audited in PlanAuditSpec/BnljAudit
  /** Driver-visible equivalence gate for the banded SimHash path, as a
    * NON-VACUOUS one-row count summary: the banded pair set must equal
    * the brute-force all-pairs hamming ≤ `SimHashMaxHamming` set
    * (pigeonhole: ≤3 differing bits across 4 16-bit bands leave at
    * least one band equal — recall is structural, not probabilistic,
    * absent hot-bucket drops; and banding post-filters on the same
    * hamming bound, so it can't over-report). The row carries both set
    * sizes and both one-sided difference counts; the ORACLE recomputes
    * the brute count INDEPENDENTLY from replayed md5 fingerprints, so
    * a simhashPairs regression to the empty set (the failure mode a
    * bare empty-symmetric-difference check would miss) now mismatches
    * on n_banded_pairs, and the fixture's non-zero pair count is
    * pinned by data, not assumption. The brute-force side is the
    * deliberate O(n²) baseline — bounded below, unbenched; the banded
    * side is the 100 TB path. */
  val MaxBruteForceRows = 100000L

  private def simhashRecall(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
    val fp = docs.select($"doc_id",
      TextFunctions.simhash64(split($"text", " ", -1)).as("fp"))
    requireBounded(fp, "simhashRecall's brute-force side", "simhashPairs alone")
    val a = fp.select($"doc_id".as("doc_a"), $"fp".as("fp_a"))
    val b = fp.select($"doc_id".as("doc_b"), $"fp".as("fp_b"))
    val brute = a.join(b, $"doc_a" < $"doc_b")
      .filter(bit_count($"fp_a".bitwiseXOR($"fp_b")) <= SimHashMaxHamming)
      .select($"doc_a", $"doc_b")
      .withColumn("__in_brute", lit(true))
    val banded = simhashPairs(docs).select($"doc_a", $"doc_b")
      .withColumn("__in_banded", lit(true))
    banded.join(brute, Seq("doc_a", "doc_b"), "full_outer")
      .agg(
        count($"__in_banded").as("n_banded_pairs"),
        count($"__in_brute").as("n_brute_pairs"),
        coalesce(sum(when($"__in_brute".isNull, 1L).otherwise(0L)), lit(0L))
          .as("n_only_banded"),
        coalesce(sum(when($"__in_banded".isNull, 1L).otherwise(0L)), lit(0L))
          .as("n_only_brute"))
  }

  private val simhashRecallSql =
    s"""WITH $simhashFpSql,
       |cnt AS (
       |  SELECT COUNT(*) AS n
       |  FROM fp a JOIN fp b ON a.doc_id < b.doc_id
       |  WHERE bit_count(xor(a.fp, b.fp)) <= $SimHashMaxHamming)
       |SELECT n AS n_banded_pairs, n AS n_brute_pairs,
       |  CAST(0 AS BIGINT) AS n_only_banded,
       |  CAST(0 AS BIGINT) AS n_only_brute
       |FROM cnt""".stripMargin

  // ---------------------------------------------------------- q_dedup_embedding
  // audited-bnlj(q_dedup_embedding): build side = 1-row global-aggregate broadcast — audited in PlanAuditSpec/BnljAudit
  /** Embedding-cosine near-dup: top-100 most similar embedding pairs.
    * Brute-force formulation (the small-scale oracle baseline; the scale
    * path is the LSH-bucketed join in Similarity.annLsh). */
  private def dedupEmbedding(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // deliberate all-pairs oracle baseline for the ANN paths (annLsh /
    // annIvf are the scale formulations) — refuse unbounded inputs
    val e = Tables.embeddings(s, dir)
    requireBounded(e, "dedupEmbedding", "annLsh/annIvf")
    val a = e.select($"vec_id".as("vec_a"), $"embedding".as("emb_a"))
    val b = e.select($"vec_id".as("vec_b"), $"embedding".as("emb_b"))
    a.join(b, $"vec_a" < $"vec_b")
      .select($"vec_a", $"vec_b",
        round(VectorFunctions.cosine($"emb_a", $"emb_b"), 4).as("cos_sim"))
      .orderBy($"cos_sim".desc, $"vec_a", $"vec_b")
      .limit(100)
  }

  private val dedupEmbeddingSql =
    """WITH p AS (
      |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
      |    round(
      |      list_sum(list_transform(generate_series(1, len(a.embedding)),
      |                              i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
      |      / (sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
      |         * sqrt(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))),
      |      4) AS cos_sim
      |  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id)
      |SELECT vec_a, vec_b, cos_sim FROM p
      |ORDER BY cos_sim DESC, vec_a, vec_b LIMIT 100""".stripMargin

  // -------------------------------------------------------------- q_dup_ngrams
  /** Cross-document duplicated-n-gram fraction — the substring-level dedup
    * signal (the corpus-wide complement of q_repetition's within-doc
    * ratios): for each document, the share of its distinct word-8-grams
    * that also occur in at least one OTHER document. Docs dominated by
    * shared boilerplate score high and get filtered or substring-trimmed.
    *
    * Scale shape: the text is scanned ONCE — the native WordNGramHashes
    * emits the distinct 64-bit shingle-hash set per doc in one pass, so
    * what explodes and shuffles is 8-byte longs, never shingle strings.
    * Per-gram document counts come from a window COUNT over the single
    * gram-keyed exchange (not a groupBy + re-join, which would scan and
    * shuffle the gram frame twice), then one (doc_id)-keyed aggregation
    * computes total and duplicated gram counts together. Cross-doc
    * equality on 64-bit hashes admits a ~2^-64-per-pair false positive —
    * negligible, and only ever OVERcounts duplication.
    *
    * A doc repeating a gram internally does not make that gram
    * "duplicated" (per-doc sets, COUNT counts docs); the window's frame is
    * the whole partition (no ORDER BY), so no sort-order tie-break can
    * affect the count. */
  val DupNgramWidth = 8

  /** Kernel: (id, n_grams, n_dup_grams, dup_fraction) for every doc in
    * `docs` with at least `n` words. */
  def dupNgramFractions(docs: DataFrame, textCol: String, idCol: String,
      n: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // word count via space count (empty-token convention of
    // split(text, ' ', -1)): a text of >= n words has >= n-1 spaces
    val longEnough =
      (length(col(textCol)) - length(replace(col(textCol), lit(" "), lit("")))) >=
        n - 1
    val grams = docs
      .filter(longEnough)
      .select(col(idCol),
        explode(TextFunctions.wordNgramHashes(col(textCol), n)).as("__g"))
    val nDocs = count(lit(1)).over(Window.partitionBy(col("__g")))
    grams.withColumn("__n_docs_with_gram", nDocs)
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_grams"),
        sum(when(col("__n_docs_with_gram") >= 2, 1L).otherwise(0L))
          .as("n_dup_grams"))
      .select(col(idCol), col("n_grams"), col("n_dup_grams"),
        (col("n_dup_grams").cast("double") / col("n_grams"))
          .as("dup_fraction"))
  }

  private def dupNgrams(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    dupNgramFractions(Tables.documents(s, dir), "text", "doc_id",
      DupNgramWidth)
      .orderBy($"doc_id")
  }

  private val dupNgramsSql = {
    val w = DupNgramWidth
    s"""WITH g AS (
       |  SELECT doc_id,
       |    unnest(list_distinct(list_transform(
       |      generate_series(1, len(w) - ${w - 1}),
       |      i -> ${(0 until w).map(k => s"w[i+$k]").mkString(" || ' ' || ")}))) AS shingle
       |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
       |  WHERE len(w) >= $w),
       |c AS (SELECT shingle, COUNT(*) AS nd FROM g GROUP BY 1)
       |SELECT g.doc_id, COUNT(*) AS n_grams,
       |  CAST(SUM(CASE WHEN c.nd >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_grams,
       |  CAST(SUM(CASE WHEN c.nd >= 2 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)
       |    AS dup_fraction
       |FROM g JOIN c USING (shingle)
       |GROUP BY g.doc_id ORDER BY g.doc_id""".stripMargin
  }

  // ------------------------------------------------------------------ q_line_dedup
  /** Passage-level exact dedup with document reassembly — the C4/
    * RefinedWeb "line dedup" step: documents are cut into fixed
    * `SegWords`-word segments (the corpus has no newlines, so the
    * segment stands in for the line), each segment survives only at its
    * corpus-globally FIRST occurrence (min (doc_id, seg_idx)), and every
    * document is rebuilt from its surviving segments.
    *
    * Scale design: the winner election is one window pass partitioned by
    * the 16-byte segment digest — segment text rides that single shuffle
    * here; at 100 TB the same plan runs digest-only ((md5, doc_id,
    * seg_idx) ~40 bytes/row) with winners semi-joined back against the
    * deterministically re-segmented corpus, trading one extra map pass
    * for never shuffling text. Reassembly is the second shuffle
    * (groupBy doc_id), emitting counts + a digest of the cleaned text,
    * never the full text. */
  val SegWords = 12

  /** Per-doc segment survival after corpus-wide first-occurrence dedup:
    * (doc_id, n_segs, n_kept, clean_md5) where clean_md5 hashes the
    * document rebuilt from surviving segments in order. */
  def lineDedup(docs: DataFrame, textCol: String, idCol: String,
      segWords: Int = SegWords): DataFrame = {
    val segs = docs
      .select(col(idCol), split(col(textCol), " ", -1).as("__words"))
      .select(col(idCol),
        posexplode(sequence(lit(0),
          expr(s"(size(__words) - 1) div $segWords"))).as(Seq("__i", "__s")),
        col("__words"))
      .select(col(idCol), col("__i").as("seg_idx"),
        concat_ws(" ", slice(col("__words"), col("__s") * segWords + 1, lit(segWords)))
          .as("seg_text"))
    val wFirst = Window.partitionBy(md5(col("seg_text")))
      .orderBy(col(idCol), col("seg_idx"))
    segs
      .withColumn("__rk", row_number().over(wFirst))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_segs"),
        sum(when(col("__rk") === 1, 1L).otherwise(0L)).as("n_kept"),
        md5(concat_ws(" ",
          sort_array(collect_list(when(col("__rk") === 1,
            struct(col("seg_idx"), col("seg_text"))))).getField("seg_text")))
          .as("clean_md5"))
  }

  private def lineDedupQuery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    lineDedup(Tables.documents(s, dir), "text", "doc_id").orderBy($"doc_id")
  }

  private val lineDedupSql =
    s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
       |segs AS (
       |  SELECT doc_id, i AS seg_idx,
       |    array_to_string(
       |      words[i * $SegWords + 1 : i * $SegWords + $SegWords], ' ') AS seg_text
       |  FROM w, unnest(generate_series(0, (len(words) - 1) // $SegWords)) t(i)),
       |ranked AS (
       |  SELECT doc_id, seg_idx, seg_text,
       |    ROW_NUMBER() OVER (PARTITION BY md5(seg_text)
       |                       ORDER BY doc_id, seg_idx) AS rk
       |  FROM segs)
       |SELECT doc_id, COUNT(*) AS n_segs,
       |  CAST(SUM(CASE WHEN rk = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       |  md5(COALESCE(string_agg(CASE WHEN rk = 1 THEN seg_text END, ' '
       |                          ORDER BY seg_idx), '')) AS clean_md5
       |FROM ranked GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // -------------------------------------------------------------- q_golden_record
  /** Survivorship — the step AFTER dedup finds a duplicate group: merge
    * the group's conflicting metadata into one golden record under
    * explicit, deterministic rules (here: smallest id is the surviving
    * key, lexicographically-first source wins, provenance keeps the
    * sorted source list — every rule an order statistic or a sorted set,
    * so both engines agree bit-for-bit; "first non-null by recency"
    * would be the same shape over a timestamp order).
    *
    * The fixture corpus has no exact text duplicates (dedupExact plants
    * its own), so conflicts are planted: every 10th document gets a
    * byte-identical copy under a DIFFERENT source ('mirror') at
    * id + PlantOffset — through the REAL digest grouping, with the full
    * expected answer (ids, source sets, winners) replayed by the oracle.
    * Only (digest, doc_id, source, n_chars) shuffles — never the text. */
  private def goldenRecord(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
    Similarity.requirePlantable(docs, "doc_id", "goldenRecord")
    val base = docs.select($"doc_id", $"source", $"n_chars", $"text")
    val withCopies = base.unionByName(
      base.filter($"doc_id" % 10 === 0)
        .select(($"doc_id" + Similarity.PlantOffset).as("doc_id"),
          lit("mirror").as("source"), $"n_chars", $"text"))
    withCopies
      .select(md5($"text").as("digest"), $"doc_id", $"source", $"n_chars")
      .groupBy($"digest")
      .agg(
        min($"doc_id").as("keep_id"),
        count(lit(1)).as("n_records"),
        min($"source").as("source_won"),
        concat_ws("|", sort_array(collect_set($"source"))).as("sources"),
        max($"n_chars").as("n_chars"))
      .filter($"n_records" >= 2)
      .select($"keep_id", $"n_records", $"source_won", $"sources", $"n_chars")
      .orderBy($"keep_id")
  }

  private val goldenRecordSql =
    s"""WITH a AS (
       |  SELECT doc_id, source, n_chars, text
       |  FROM documents
       |  UNION ALL
       |  SELECT doc_id + ${Similarity.PlantOffset}, 'mirror', n_chars, text
       |  FROM documents WHERE doc_id % 10 = 0)
       |SELECT MIN(doc_id) AS keep_id, COUNT(*) AS n_records,
       |  MIN(source) AS source_won,
       |  list_aggregate(list_sort(list_distinct(list(source))), 'string_agg', '|') AS sources,
       |  MAX(n_chars) AS n_chars
       |FROM a GROUP BY text HAVING COUNT(*) >= 2
       |ORDER BY keep_id""".stripMargin

  // -------------------------------------------------------------- q_containment
  /** ASYMMETRIC n-gram containment — |grams(A) ∩ grams(B)| / |grams(A)|
    * — the near-dup signal Jaccard structurally misses: a short doc
    * fully quoted inside a long one has tiny Jaccard (union is large)
    * but containment ≈ 1 on the short side. This is the scalable
    * SHARED-GRAM JOIN formulation, not an all-pairs scan: grams hash to
    * md5-lower-64 (8 bytes on the wire, = DuckDB md5_number_lower so
    * the oracle replays them), a df-cap drops boilerplate hub grams
    * (bounding per-gram join fanout to DfCap² pairs — the same
    * truncation contract as q_inverted_index), and only pairs sharing
    * at least one informative gram ever materialize. Both containment
    * directions are reported in exact integer ppm over the CAPPED gram
    * universe (denominator = informative grams of that side, stated
    * contract — mirrored in the oracle).
    *
    * Scale shape: explode grams once, one gram-keyed shuffle for df +
    * pair generation, per-doc gram counts broadcast back; output is
    * threshold-filtered so only near-containment pairs survive. */
  val ContainmentDfCap = 20L
  val ContainmentMinPpm = 500000L

  private def containment(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val grams = Tables.spread(Tables.documents(s, dir))
      .select($"doc_id", explode(shingles($"text")).as("gram"))
      .select($"doc_id", TextFunctions.md5Lower64($"gram").as("g"))
      .distinct()
    val informative = grams
      .withColumn("df", count(lit(1)).over(Window.partitionBy($"g")))
      .filter($"df" <= ContainmentDfCap)
      .select($"doc_id", $"g")
    val sizes = informative.groupBy($"doc_id").agg(count(lit(1)).as("n_g"))
    val shared = informative.select($"doc_id".as("doc_a"), $"g")
      .join(informative.select($"doc_id".as("doc_b"), $"g"), Seq("g"))
      .filter($"doc_a" < $"doc_b")
      .groupBy($"doc_a", $"doc_b").agg(count(lit(1)).as("n_shared"))
    shared
      .join(broadcast(sizes.select($"doc_id".as("doc_a"), $"n_g".as("n_a"))),
        Seq("doc_a"))
      .join(broadcast(sizes.select($"doc_id".as("doc_b"), $"n_g".as("n_b"))),
        Seq("doc_b"))
      .withColumn("cont_a_ppm", expr("n_shared * 1000000 DIV n_a"))
      .withColumn("cont_b_ppm", expr("n_shared * 1000000 DIV n_b"))
      .filter($"cont_a_ppm" >= ContainmentMinPpm ||
        $"cont_b_ppm" >= ContainmentMinPpm)
      .select($"doc_a", $"doc_b", $"n_a", $"n_b", $"n_shared",
        $"cont_a_ppm", $"cont_b_ppm")
      .orderBy($"doc_a", $"doc_b")
  }

  private val containmentSql =
    s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       |grams AS (
       |  -- g is ONLY a join key (never output), so the UBIGINT stays
       |  -- uncast: any bijection of md5-lower-64 joins identically
       |  SELECT DISTINCT doc_id, md5_number_lower(gram) AS g
       |  FROM (
       |    SELECT doc_id, unnest(list_distinct(CASE WHEN len(w) >= 3
       |      THEN list_transform(generate_series(1, len(w) - 2),
       |                          i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
       |      ELSE [array_to_string(w, ' ')] END)) AS gram
       |    FROM w)),
       |informative AS (
       |  SELECT doc_id, g FROM (
       |    SELECT doc_id, g, COUNT(*) OVER (PARTITION BY g) AS df FROM grams)
       |  WHERE df <= $ContainmentDfCap),
       |sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_g
       |          FROM informative GROUP BY 1),
       |shared AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |    CAST(COUNT(*) AS BIGINT) AS n_shared
       |  FROM informative a JOIN informative b
       |    ON a.g = b.g AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)
       |SELECT doc_a, doc_b, sa.n_g AS n_a, sb.n_g AS n_b, n_shared,
       |  n_shared * 1000000 // sa.n_g AS cont_a_ppm,
       |  n_shared * 1000000 // sb.n_g AS cont_b_ppm
       |FROM shared
       |JOIN sizes sa ON shared.doc_a = sa.doc_id
       |JOIN sizes sb ON shared.doc_b = sb.doc_id
       |WHERE n_shared * 1000000 // sa.n_g >= $ContainmentMinPpm
       |   OR n_shared * 1000000 // sb.n_g >= $ContainmentMinPpm
       |ORDER BY doc_a, doc_b""".stripMargin

  // --------------------------------------------------------------- q_dup_spans
  /** Longest SHARED TOKEN SPAN per document pair — the span-level
    * diagnostic behind exact-substring dedup (Lee et al. 2021): two
    * docs sharing one 8-gram might be coincidence; sharing a 40-token
    * run is copied text, and the span length tells a dedup policy where
    * to cut. Shared 8-gram occurrences become points (pos_a, pos_b);
    * copied text lies on DIAGONALS (pos_a − pos_b constant), so maximal
    * runs are gaps-and-islands per (pair, diagonal) ordered by pos_a —
    * one window pass (the q_islands recipe), no quadratic alignment.
    * Span = run length + 7 tokens; pairs below [[DupSpanMinTokens]] are
    * noise and dropped; the longest span per pair (ties: smallest
    * start_a, start_b, diagonal) is reported with both start offsets.
    *
    * Scale shape: gram hashes are md5-lower-64 join keys (8 bytes on
    * the wire, never output — the q_containment contract) with the same
    * df cap bounding per-gram fanout; the only corpus-keyed shuffles
    * are the gram join and the pair-diagonal window. */
  val DupSpanDfCap = 10L
  val DupSpanMinTokens = 12L

  private def dupSpans(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // token array bound as a lambda variable (see `shingles`); the
    // size guard lives INSIDE the lambda because Spark's sequence(1, n)
    // DESCENDS for n < 1 instead of returning empty
    val grams = Tables.documents(s, dir)
      .select($"doc_id", explode(element_at(
        transform(array(split($"text", " ", -1)), w =>
          when(size(w) >= 8,
            transform(sequence(lit(1), size(w) - 7), i =>
              struct(i.as("pos"), array_join(slice(w, i, lit(8)), " ").as("gram"))))
            .otherwise(array().cast("array<struct<pos:int,gram:string>>"))),
        1)).as("pg"))
      .select($"doc_id", $"pg.pos".as("pos"),
        TextFunctions.md5Lower64($"pg.gram").as("g"))
    val informative = grams
      .withColumn("df", count(lit(1)).over(Window.partitionBy($"g")))
      .filter($"df" <= DupSpanDfCap)
      .select($"doc_id", $"pos", $"g")
    val points = informative.select($"doc_id".as("doc_a"), $"pos".as("pos_a"), $"g")
      .join(informative.select($"doc_id".as("doc_b"), $"pos".as("pos_b"), $"g"),
        Seq("g"))
      .filter($"doc_a" < $"doc_b")
      .select($"doc_a", $"doc_b", $"pos_a", $"pos_b",
        ($"pos_a" - $"pos_b").as("diag"))
    val wd = Window.partitionBy($"doc_a", $"doc_b", $"diag").orderBy($"pos_a")
    val runs = points
      .withColumn("new_run",
        when($"pos_a" - lag($"pos_a", 1).over(wd) === 1, 0L).otherwise(1L))
      .withColumn("run_id", sum($"new_run").over(
        wd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy($"doc_a", $"doc_b", $"diag", $"run_id")
      .agg(min($"pos_a").cast("long").as("start_a"),
        min($"pos_b").cast("long").as("start_b"),
        (count(lit(1)) + 7).as("span_tokens"))
    val wp = Window.partitionBy($"doc_a", $"doc_b")
      .orderBy($"span_tokens".desc, $"start_a", $"start_b", $"diag")
    runs.withColumn("rk", row_number().over(wp))
      .filter($"rk" === 1 && $"span_tokens" >= DupSpanMinTokens)
      .select($"doc_a", $"doc_b", $"start_a", $"start_b", $"span_tokens")
      .orderBy($"doc_a", $"doc_b")
  }

  private val dupSpansSql =
    s"""WITH t AS (
       |  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       |g AS (
       |  SELECT doc_id, pos,
       |    md5_number_lower(array_to_string(w[pos:pos+7], ' ')) AS g
       |  FROM (SELECT doc_id, w,
       |          unnest(generate_series(1, len(w) - 7)) AS pos
       |        FROM t WHERE len(w) >= 8)),
       |informative AS (
       |  SELECT doc_id, pos, g FROM (
       |    SELECT doc_id, pos, g, COUNT(*) OVER (PARTITION BY g) AS df FROM g)
       |  WHERE df <= $DupSpanDfCap),
       |pts AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |    a.pos AS pos_a, b.pos AS pos_b, a.pos - b.pos AS diag
       |  FROM informative a JOIN informative b
       |    ON a.g = b.g AND a.doc_id < b.doc_id),
       |flagged AS (
       |  SELECT *, CASE WHEN pos_a - lag(pos_a) OVER
       |      (PARTITION BY doc_a, doc_b, diag ORDER BY pos_a) = 1
       |    THEN 0 ELSE 1 END AS new_run
       |  FROM pts),
       |runs AS (
       |  SELECT doc_a, doc_b, diag,
       |    MIN(pos_a) AS start_a, MIN(pos_b) AS start_b,
       |    CAST(COUNT(*) + 7 AS BIGINT) AS span_tokens
       |  FROM (
       |    SELECT *, SUM(new_run) OVER
       |        (PARTITION BY doc_a, doc_b, diag ORDER BY pos_a) AS run_id
       |    FROM flagged)
       |  GROUP BY doc_a, doc_b, diag, run_id),
       |best AS (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_a, doc_b
       |      ORDER BY span_tokens DESC, start_a, start_b, diag) AS rk
       |  FROM runs)
       |SELECT doc_a, doc_b, start_a, start_b, span_tokens
       |FROM best WHERE rk = 1 AND span_tokens >= $DupSpanMinTokens
       |ORDER BY doc_a, doc_b""".stripMargin

  // ------------------------------------------------------------------ q_novelty
  /** Per-document n-gram NOVELTY — the fraction of a doc's distinct
    * 8-grams not seen in any LOWER-ID document: the marginal-content
    * curve a corpus accumulation pipeline watches (novelty collapsing
    * toward 0 means new ingest is re-crawling what it already has).
    * First-seen is an aggregation (gram → min doc_id), not a sequential
    * scan, so the "temporal" semantics stay one shuffle. Docs shorter
    * than the gram width carry no evidence and are excluded by contract
    * (mirrored in the oracle).
    *
    * Scale shape: one distinct (doc, gram-hash) explode (md5-lower-64
    * keys, never output — the q_containment contract), one gram-keyed
    * min aggregation, broadcast-back-free second aggregation keyed by
    * doc — two slim shuffles total. */
  private def novelty(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val grams = Tables.documents(s, dir)
      .select($"doc_id", explode(element_at(
        transform(array(split($"text", " ", -1)), w =>
          when(size(w) >= 8,
            transform(sequence(lit(1), size(w) - 7), i =>
              array_join(slice(w, i, lit(8)), " ")))
            .otherwise(array().cast("array<string>"))), 1)).as("gram"))
      .select($"doc_id", TextFunctions.md5Lower64($"gram").as("g"))
      .distinct()
    val firstSeen = grams.groupBy($"g").agg(min($"doc_id").as("first_doc"))
    grams.join(firstSeen, Seq("g"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(when($"first_doc" === $"doc_id", 1L).otherwise(0L)).as("n_novel"))
      .withColumn("novelty_ppm", expr("n_novel * 1000000 DIV n_grams"))
      .orderBy($"doc_id")
  }

  private val noveltySql =
    """WITH g AS (
      |  SELECT DISTINCT doc_id,
      |    md5_number_lower(array_to_string(w[pos:pos+7], ' ')) AS g
      |  FROM (SELECT doc_id, w,
      |          unnest(generate_series(1, len(w) - 7)) AS pos
      |        FROM (SELECT doc_id, string_split(text, ' ') AS w
      |              FROM documents)
      |        WHERE len(w) >= 8)),
      |fs AS (SELECT g, MIN(doc_id) AS first_doc FROM g GROUP BY 1)
      |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
      |  CAST(SUM(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_novel,
      |  CAST(SUM(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END) AS BIGINT)
      |    * 1000000 // COUNT(*) AS novelty_ppm
      |FROM g JOIN fs USING (g)
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  val all: Seq[NamedQuery] = Seq(
    NamedQuery("q_novelty", novelty, Some(noveltySql), bench = true),
    NamedQuery("q_dup_spans", dupSpans, Some(dupSpansSql), bench = true),
    NamedQuery("q_containment", containment, Some(containmentSql),
      bench = true),
    NamedQuery("q_golden_record", goldenRecord, Some(goldenRecordSql),
      bench = true),
    NamedQuery("q_line_dedup", lineDedupQuery, Some(lineDedupSql), bench = true),
    NamedQuery("q_dedup_exact", dedupExact, Some(dedupExactSql), bench = true),
    NamedQuery("q_dup_ngrams", dupNgrams, Some(dupNgramsSql), bench = true),
    // q_ngram_jaccard / q_dedup_embedding are the deliberate bounded O(n²)
    // oracle baselines for the LSH paths and q_simhash_recall contains one —
    // benching them would time the brute force, not an engine path
    NamedQuery("q_ngram_jaccard", ngramJaccard, Some(ngramJaccardSql)),
    NamedQuery("q_edit_distance", editDistance, Some(editDistanceSql)),
    NamedQuery("q_minhash_dedup", minhashDedup, Some(minhashDedupSql),
      bench = true),
    NamedQuery("q_minhash_recall", minhashRecall, Some(minhashRecallSql),
      bench = true),
    NamedQuery("q_canonical_docs", canonicalDocs, Some(canonicalDocsSql),
      bench = true),
    NamedQuery("q_incremental_neardup", incrementalNearDup,
      Some(incrementalNearDupSql), bench = true),
    NamedQuery("q_dedup_clusters", dedupClusters, Some(dedupClustersSql),
      bench = true),
    NamedQuery("q_cluster_propagation", clusterPropagation,
      Some(clusterPropagationSql), bench = true),
    NamedQuery("q_cluster_star", clusterStar, Some(clusterStarSql),
      bench = true),
    NamedQuery("q_simhash_dedup", simhashDedup, Some(simhashDedupSql),
      bench = true),
    NamedQuery("q_simhash_recall", simhashRecall, Some(simhashRecallSql)),
    NamedQuery("q_dedup_embedding", dedupEmbedding, Some(dedupEmbeddingSql)))
}
