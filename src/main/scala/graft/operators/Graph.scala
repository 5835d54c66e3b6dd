package graft.operators

import graft.LineageCut._
import graft.{NamedQuery, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Iterative graph analytics over the relational tables — PageRank as
  * the representative fixed-iteration "Pregel-lite" workload (entity
  * importance over an interaction graph; in a corpus pipeline the same
  * loop scores link/citation importance for document quality).
  *
  * Scale design (100 TB):
  *  - each iteration is ONE shuffle pair: join ranks onto the
  *    (edge, out-degree) frame keyed by src, then aggregate
  *    contributions keyed by dst — the textbook distributed PageRank
  *    round, nothing touches node payloads;
  *  - the degree-annotated edge frame is iteration-invariant: built
  *    once, localCheckpoint'd, reused every round (no per-round
  *    recomputation of degrees, no growing lineage);
  *  - arithmetic is INTEGER micro-units (1e6 per node seed, DIV for
  *    shares, 85/100 damping) — sums of longs are associative, so
  *    ranks are bit-identical on any partitioning and any engine, and
  *    the DuckDB oracle replays the exact iteration in a recursive
  *    CTE with zero tolerance. Float PageRank would be merge-order
  *    dependent; integer truncation loses < 100 units/node/round,
  *    irrelevant for ranking and fully deterministic. */
object Graph {

  /** Row-local unordered pair generation over a SORTED array column —
    * (arr[i], arr[j]) for i < j as struct(f1, f2), entirely inside
    * codegen (1-based slice arithmetic: element i+1 onward follows the
    * i-th lambda element). Shared by triangleCount's co-purchase build
    * and Analytics.basketRules so the off-by-one-prone bounds live once. */
  private[operators] def sortedPairsExpr(arrayCol: String,
      f1: String, f2: String): String =
    s"""flatten(transform($arrayCol, (x, i) ->
       |  transform(slice($arrayCol, i + 2, size($arrayCol) - i - 1),
       |    y -> struct(x AS $f1, y AS $f2))))""".stripMargin

  /** Symmetrize a distinct pair frame (columns `a`, `b`) into the
    * both-directions edge list `(src, dst)` with ONE pass over the
    * input: each row explodes into its two orientations inside codegen.
    * The union-of-two-projections spelling this replaces re-computed
    * the whole upstream pair construction (an orders⋈lineitem join)
    * once PER ARM — the two subtrees differ in column order, so no
    * exchange reuse applies and the base join ran twice in every graph
    * query's setup (measured round 12: two back-to-back ~0.65 s
    * broadcast-build jobs in every symmetrized head's profile; guide
    * §2.4 — remove duplicated subtrees). Emits exactly the same rows
    * as the union, so every oracle (which spells UNION ALL) is
    * untouched. */
  private[operators] def symmetrize(pairs: DataFrame): DataFrame = {
    import pairs.sparkSession.implicits._
    pairs.select(explode(array(
        struct($"a".as("src"), $"b".as("dst")),
        struct($"b".as("src"), $"a".as("dst")))).as("e"))
      .select($"e.src", $"e.dst")
  }

  /** The distinct customer↔supplier interaction pair frame behind every
    * trading-graph head (a = custkey, b = suppkey + SupplierOffset; the
    * ranges are disjoint, so [[symmetrize]]'s two orientations can never
    * collide and the symmetrized frame is distinct BY CONSTRUCTION —
    * that is what lets the iterative callers pass `dedupEdges = false`
    * and skip one edge-scale exchange, guide §2.4). */
  private def interactionPairs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, dir)
      .join(Tables.lineitem(s, dir), $"o_orderkey" === $"l_orderkey")
      .select($"o_custkey".as("a"), ($"l_suppkey" + SupplierOffset).as("b"))
      .distinct()
  }

  /** Scale-adaptive partition count for the PINNED iteration-invariant
    * edge layouts: ceil(source bytes / 64 MB) clamped to
    * [1, shuffle.partitions] — the batch analogue of
    * StreamTune.statePartitions, for the one exchange AQE cannot size
    * (a cached pin freezes its child plan's partitioning, so the
    * `repartition($"src")` under it keeps all `shuffle.partitions`
    * slivers however small the frame is; measured round 13 at sf0.1:
    * every pageRank round was a 32-task pass over an 11.7 MB cache).
    * The input-bytes rule keeps the layout identical to today's past
    * cap × target bytes of source — a size rule, not a local-core
    * constant. The target is 2 MB of COMPRESSED source per partition
    * (the columnar file expands ~4x into the cached row frame, so this
    * is ~8 MB of cached rows), measured, not the 64 MB shuffle
    * advisory: the cached rounds are CPU-bound aggregations, and the
    * round-13 q_label_prop sweep read 6.79 s at 1 partition, 5.30 s at
    * 32 (sliver overhead) and 4.05 s at 8 — past cap × 2 MB the cap
    * binds and the layout equals the session parallelism anyway, so
    * the constant only shapes small-input runs. */
  private def layoutParts(s: SparkSession, dir: String): Option[Int] = {
    val cap = s.conf.get("spark.sql.shuffle.partitions").toInt
    val bytes = graft.streaming.StreamTune.inputBytes(s, s"$dir/lineitem.parquet")
    if (bytes < 0) None
    else Some(math.max(1L, math.min(cap.toLong,
      (bytes + (2L << 20) - 1) / (2L << 20))).toInt)
  }

  val PageRankIters = 5
  /** Initial rank mass per node, in micro-units. */
  val RankUnit = 1000000L

  /** Materialize an iteration-invariant frame WITH its partitioning
    * intact. A lineage cut (localCheckpoint/checkpoint) re-enters
    * downstream plans as a bare `Scan ExistingRDD` whose
    * outputPartitioning is unknown — every per-round join then
    * RE-SHUFFLES the edge-scale frame, which is exactly the cost the
    * pre-layout was meant to kill (measured round 11: the decade-2
    * pageRank leg blew past its 15× gate on the re-shuffles). A cached
    * InMemoryRelation keeps the child plan's partitioning (Spark pins
    * cached-plan output partitioning by default,
    * `spark.sql.optimizer.canChangeCachedPlanOutputPartitioning`), so
    * the per-round shuffled-hash join moves ONLY the node-sized side —
    * and unlike a localCheckpoint it keeps a recompute path (the
    * executor-loss-safe choice). Callers [[unpin]] after the loop's
    * final lineage cut so the edge-sized blocks never outlive the
    * query. */
  private def pin(df: DataFrame): DataFrame = {
    val p = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    p.count()
    p
  }

  private def unpin(df: DataFrame): Unit = df.unpersist(blocking = false)

  /** Node-count ceiling for the broadcast-per-round plan shared by the
    * iterative graph family (pageRank / labelPropagation / HITS / BFS).
    * Below it the node-sized frame (≤ ~5 MB of (long, long) on-heap)
    * broadcasts cheaply and each round is ONE exchange; above it the
    * PER-ROUND rebroadcast is the scale-killer — at 10⁶⁺ nodes every
    * iteration ships the whole rank frame to every executor again
    * (round-10 measured: 17.3× wall growth for 10× data at synthetic
    * sf10), and at 100 TB the node frame is billions of rows. Past the
    * ceiling the loop switches to the co-partitioned Pregel shape: the
    * iteration-invariant edge frame is pre-partitioned on the join key
    * once (outputPartitioning survives the lineage cut) and each round
    * runs a SHUFFLED HASH join that builds on the node-sized side — the
    * edge frame is never sorted and never re-shuffled. The limit
    * tracks Spark's own 10 MB autoBroadcastJoinThreshold (~100k
    * (long,long) rows on-heap) because the rebroadcast amplifies it by
    * the round count. */
  val BroadcastNodeLimit = 100000L

  /** Fixed-iteration integer PageRank over a directed edge list
    * (columns `src`, `dst`). Every node must have at least one
    * out-edge (symmetrize the graph first for interaction data —
    * dangling-mass redistribution is deliberately out of scope). */
  /** @param broadcastRanks Some(true)/Some(false) forces the plan;
    *   None (default) size-switches on the measured node count against
    *   [[BroadcastNodeLimit]] — broadcast the node-sized rank frame into
    *   the per-round join while it is small (edge frame never
    *   re-shuffles, ONE exchange per round), shuffle-on-src against the
    *   pre-partitioned pre-sorted edge frame once it is not. The
    *   integer iteration is partitioning-invariant, so both plans emit
    *   bit-identical ranks. */
  /** @param dedupEdges pass false when the caller's edge list is
    *   distinct BY CONSTRUCTION (the symmetrized disjoint-range pair
    *   queries) — the input `distinct()` is then one pure-cost
    *   edge-scale exchange (guide §2.4); the degree aggregate and the
    *   pin's join left still share the caller's construction via
    *   ReuseExchange inside the single pin job.
    * @param layoutPartitions scale-adaptive partition count for the
    *   pinned src layout (see [[layoutParts]]); None keeps the session
    *   `shuffle.partitions` (the pre-round-13 behavior). */
  def pageRank(edges: DataFrame, iters: Int = PageRankIters,
      broadcastRanks: Option[Boolean] = None, checkpointEvery: Int = 3,
      dedupEdges: Boolean = true,
      layoutPartitions: Option[Int] = None): DataFrame = {
    import edges.sparkSession.implicits._
    require(iters >= 1 && iters <= 50, s"iters must be in [1, 50], got $iters")
    require(checkpointEvery >= 1 && checkpointEvery <= 5,
      s"checkpointEvery must be in [1, 5], got $checkpointEvery")
    // ONE edge-scale materialization: edgesDeg (src, dst, outdeg) is a
    // superset of the distinct edge frame, so e itself is never
    // checkpointed — the caller's edge construction (typically a
    // fact-fact join) runs exactly once (its distinct exchange is a
    // shared subplan of the degree agg and the join left, so
    // ReuseExchange dedupes it inside this single job), nodes derive
    // from the materialized blocks, and the block manager holds ONE
    // edge-sized frame instead of two (the two-copies spelling spilled
    // every per-round shuffle at synthetic sf10). Partitioned on src
    // unconditionally and PINNED (not lineage-cut — see [[pin]]): that
    // layout is what the shuffle plan's per-round SHUFFLED HASH join
    // reuses (build side = the node-sized rank frame, so the edge frame
    // is never sorted and never re-shuffled), and for the broadcast
    // plan it costs one setup exchange — noise at the scales where
    // broadcast is chosen.
    // (The round-12 snapshot shipped a rewrite here — round-1 peel,
    // HLL probe over the un-laid-out pin, conditional src re-layout —
    // that regressed q_pagerank ~1.8x in two independent runs; round 13
    // reverted it to this, the last bench-green shape.)
    val eProj = edges.select($"src", $"dst")
    val e = if (dedupEdges) eProj.distinct() else eProj
    val deg = e.groupBy($"src").agg(count(lit(1)).as("outdeg"))
    val laid = layoutPartitions match {
      case Some(n) => e.join(deg, "src").repartition(n, $"src")
      case None => e.join(deg, "src").repartition($"src")
    }
    val edgesDeg = pin(laid)
    val nodes = edgesDeg.select($"src".as("node")).distinct().lineageCut(true)
    // one scalar job decides the per-round join plan for the whole loop;
    // nodes is already materialized, so this is a count over cached blocks
    val bcast = broadcastRanks.getOrElse(nodes.count() <= BroadcastNodeLimit)
    var ranks = nodes.withColumn("rank", lit(RankUnit)).lineageCut(true)
    var i = 0
    while (i < iters) {
      val rankSide = ranks.withColumnRenamed("node", "src")
      val contribs = edgesDeg
        .join(if (bcast) broadcast(rankSide)
              else rankSide.hint("shuffle_hash"), "src")
        .select($"dst".as("node"), expr("rank DIV outdeg").as("contrib"))
        .groupBy($"node")
        .agg(sum($"contrib").as("m"))
      // symmetrized graph: every node has an in-edge, so the inner
      // shape of the contribution frame already covers all nodes
      ranks = contribs
        .select($"node",
          (lit(RankUnit * 15 / 100) + expr("85 * m DIV 100")).as("rank"))
      i += 1
      // lineage cut every k rounds, not every round: an eager
      // localCheckpoint is a full blocking job, and at node-frame sizes
      // the per-round materialization costs more than re-planning a few
      // nested rounds; k bounds both the plan depth and the re-execution
      // window, same knob as resolveClusters' batched convergence poll
      if (i % checkpointEvery == 0 || i == iters)
        ranks = ranks.lineageCut(true)
    }
    // the final ranks are materialized (cut at i == iters), so the
    // edge-sized cache can go now instead of at session GC
    unpin(edgesDeg)
    ranks
  }

  // -------------------------------------------------------------------- q_pagerank
  /** PageRank over the symmetrized customer↔supplier interaction graph
    * (an edge per distinct trading pair from orders⋈lineitem; suppliers
    * offset into their own id space). The oracle replays the identical
    * integer iteration as a DuckDB recursive CTE — a split rank at any
    * node after 5 rounds fails the hash compare exactly. */
  val SupplierOffset = 10000000L

  private def pageRankQuery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // symmetrize (one explode pass) instead of union-of-two-projections:
    // the union's arms each re-ran the orders⋈lineitem pair construction
    // (two ~0.7 s jobs in the round-13 profile — guide §2.4, duplicated
    // subtrees); the explode emits the identical rows. dedupEdges=false:
    // pairs is distinct and the orientations live in disjoint key
    // ranges, so the symmetrized frame is distinct by construction.
    pageRank(symmetrize(interactionPairs(s, dir)), dedupEdges = false,
        layoutPartitions = layoutParts(s, dir))
      .select($"node", $"rank")
      .orderBy($"node")
  }

  private val pageRankSql =
    s"""WITH RECURSIVE
       |pairs AS (
       |  SELECT DISTINCT o_custkey AS a, l_suppkey + $SupplierOffset AS b
       |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
       |edges AS (
       |  SELECT a AS src, b AS dst FROM pairs
       |  UNION ALL SELECT b, a FROM pairs),
       |deg AS (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src),
       |nodes AS (SELECT DISTINCT src AS node FROM edges),
       |pr(iter, node, rank) AS (
       |  SELECT 0, node, CAST($RankUnit AS BIGINT) FROM nodes
       |  UNION ALL
       |  SELECT c.iter + 1, c.node,
       |    CAST(${RankUnit * 15 / 100} + (85 * c.m) // 100 AS BIGINT)
       |  FROM (
       |    SELECT pr.iter AS iter, e.dst AS node,
       |      SUM(pr.rank // d.outdeg) AS m
       |    FROM pr
       |    JOIN edges e ON pr.node = e.src
       |    JOIN deg d ON e.src = d.src
       |    WHERE pr.iter < $PageRankIters
       |    GROUP BY pr.iter, e.dst) c)
       |SELECT node, rank FROM pr WHERE iter = $PageRankIters
       |ORDER BY node""".stripMargin

  // -------------------------------------------------------------- q_triangle_count
  /** Per-node triangle counts over the part co-purchase graph (an edge
    * per distinct part pair appearing in the same order). Triangle
    * enumeration uses the DEGREE-ORIENTED wedge join — every edge is
    * directed from its lower-(degree, id) endpoint to the higher, making
    * the orientation acyclic, so each triangle appears exactly once as
    * wedge (a→b, b→c) closed by (a→c). Degree orientation is what makes
    * this survive scale-free skew: wedge count is Σ outdeg² with outdeg
    * ≤ O(√m) after orientation, vs Σ deg² (quadratic in the hub degree)
    * for the naive id orientation — the standard result from the
    * MapReduce triangle-counting literature.
    *
    * Plan shape: one shuffle to build pairs (self-join on l_orderkey),
    * degree frame broadcast (nodes ≪ edges), wedge join shuffles on the
    * mid node, closing join on (src, dst); the edge frame is built once
    * and localCheckpoint'd — it feeds three join sides. */
  /** Per-node triangle counts over an undirected edge list (columns
    * `u`, `v`; self-loops rejected, duplicates and orientation
    * normalized away). Returns (node, n_tri) for every node, zeros
    * included. */
  /** Node ceiling for triangle counting's broadcast regime — see the
    * A/B note at the switch site. */
  val TriangleBroadcastNodeLimit = 5000000L

  def triangleCounts(edges: DataFrame): DataFrame = {
    import edges.sparkSession.implicits._
    // LAZY cut on the normalized pair frame: deg's eager cut below is
    // the materializing action, and every later consumer (the oriented
    // build) reads the cut blocks instead of re-running the caller's
    // pair construction — round 13 profiled the un-cut spelling
    // re-building pairs from the lineitem scan in the deg job, the
    // oriented job AND the final left join's plan (guide §2.4).
    val pairs = edges
      .select(least($"u", $"v").as("u"), greatest($"u", $"v").as("v"))
      .filter($"u" =!= $"v")
      .distinct()
      .lineageCut(false)
    // node-scale, consumed THREE times (two orientation broadcasts +
    // the final zero-filling left join): cut once
    val deg = pairs.select($"u".as("node")).unionAll(pairs.select($"v"))
      .groupBy($"node").agg(count(lit(1)).as("d"))
      .lineageCut(true)
    // Size switch for the node-keyed joins, with triangle counting's OWN
    // ceiling, not the iterative family's 100k: here the alternative to
    // a broadcast is shuffling the EDGE-scale oriented frame twice plus
    // the adjacency arrays — A/B'd on the 10x scaling fixture (~200k
    // nodes, 3.7M edges): broadcast 117 s, shuffled-hash 203 s. A
    // (node, sorted-neighbor-list) frame is O(m) values bounded by the
    // orientation at O(√m) per list, so broadcast stays the right plan
    // until the adjacency frame itself nears the broadcast cap —
    // switch only past ~5M nodes (several hundred MB framed), where the
    // 8 GB relation cap and per-executor memory genuinely bind.
    val bcast = deg.count() <= TriangleBroadcastNodeLimit
    def side(df: DataFrame): DataFrame =
      if (bcast) broadcast(df) else df.hint("shuffle_hash")
    val oriented = pairs
      .join(side(deg.select($"node".as("u"), $"d".as("du"))), "u")
      .join(side(deg.select($"node".as("v"), $"d".as("dv"))), "v")
      .select(
        when($"du" < $"dv" || ($"du" === $"dv" && $"u" < $"v"), $"u")
          .otherwise($"v").as("src"),
        when($"du" < $"dv" || ($"du" === $"dv" && $"u" < $"v"), $"v")
          .otherwise($"u").as("dst"))
      .lineageCut(true)
    // Edge-iterator ("compact-forward") enumeration: attach each edge's
    // two out-neighbor lists and intersect them ROW-LOCALLY. The naive
    // wedge join materializes Σ outdeg² rows (~83M on the sf0.1
    // co-purchase graph, measured) before the closing-edge check prunes
    // them; intersecting adjacency lists emits exactly one row per
    // TRIANGLE (~5.7M there) — the orientation guarantees a < b < c in
    // (degree, id) order, so each triangle surfaces exactly once, and it
    // bounds every adjacency list at O(√m), which is what keeps the
    // per-row intersect and the broadcast small under scale-free skew.
    // Adjacency frame ~ one row per node: broadcast here; for graphs
    // whose adjacency frame exceeds broadcast budget the same two joins
    // run as shuffle joins on src/dst — still triangle-volume output,
    // never wedge-volume.
    val adj = oriented.groupBy($"src")
      .agg(sort_array(collect_list($"dst")).as("nbrs"))
    // One row per closing EDGE carrying the full intersect array: the a-
    // and b-corner counts aggregate from size(cs) WITHOUT exploding, and
    // only the c corner explodes (one row per triangle, not three).
    // Materialized once (localCheckpoint) because three aggregations
    // consume it — re-running the broadcast joins + intersects three
    // times costs more than the triangle-volume materialization.
    val closed = oriented
      .join(side(adj.select($"src", $"nbrs".as("nbrs_u"))), Seq("src"))
      .join(side(adj.select($"src".as("dst"), $"nbrs".as("nbrs_v"))),
        Seq("dst"))
      .select($"src".as("a"), $"dst".as("b"),
        array_intersect($"nbrs_u", $"nbrs_v").as("cs"))
      .select($"a", $"b", $"cs", size($"cs").cast("long").as("k"))
      .filter($"k" > 0)
      .lineageCut(true)
    // ONE pass over the (cut) closed frame instead of three: each row
    // contributes k triangles to its a and b corners and 1 to every c
    // in the intersect array — emit all of them from a single row-local
    // explode and aggregate once (the three-aggregation union re-read
    // the 75 MB closed cache three times in the round-13 profile)
    val perNode = closed
      .select(explode(concat(
        array(struct($"a".as("node"), $"k".as("w")),
          struct($"b".as("node"), $"k".as("w"))),
        transform($"cs", c => struct(c.as("node"), lit(1L).as("w")))))
        .as("e"))
      .groupBy($"e.node".as("node")).agg(sum($"e.w").as("n_tri"))
    deg.select($"node")
      .join(perNode, Seq("node"), "left")
      .select($"node", coalesce($"n_tri", lit(0L)).as("n_tri"))
  }

  private def triangleCount(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // co-purchase pairs WITHOUT the lineitem self-join: one orderkey
    // shuffle collects each order's part list, pairs generate row-locally
    // from the sorted array (orders hold ~7 lines — k² is scan noise);
    // the self-join formulation lives on in the oracle SQL, so agreement
    // is differential. Same dedup (triangleCounts distincts pairs).
    val pairs = Tables.lineitem(s, dir)
      .groupBy($"l_orderkey")
      .agg(sort_array(collect_set($"l_partkey")).as("parts"))
      .select(explode(expr(sortedPairsExpr("parts", "u", "v"))).as("p"))
      .select($"p.u", $"p.v")
    triangleCounts(pairs).orderBy($"node")
  }

  private val triangleCountSql =
    """WITH pairs AS (
      |  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      |  FROM lineitem a JOIN lineitem b
      |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
      |deg AS (
      |  SELECT node, COUNT(*) AS d FROM (
      |    SELECT u AS node FROM pairs UNION ALL SELECT v FROM pairs)
      |  GROUP BY 1),
      |oriented AS (
      |  SELECT
      |    CASE WHEN du.d < dv.d OR (du.d = dv.d AND u < v) THEN u ELSE v END AS src,
      |    CASE WHEN du.d < dv.d OR (du.d = dv.d AND u < v) THEN v ELSE u END AS dst
      |  FROM pairs
      |  JOIN deg du ON pairs.u = du.node
      |  JOIN deg dv ON pairs.v = dv.node),
      |tri AS (
      |  SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
      |  FROM oriented e1
      |  JOIN oriented e2 ON e1.dst = e2.src
      |  JOIN oriented e3 ON e3.src = e1.src AND e3.dst = e2.dst),
      |per_node AS (
      |  SELECT node, COUNT(*) AS n_tri FROM (
      |    SELECT a AS node FROM tri
      |    UNION ALL SELECT b FROM tri
      |    UNION ALL SELECT c FROM tri)
      |  GROUP BY 1)
      |SELECT deg.node, COALESCE(per_node.n_tri, 0) AS n_tri
      |FROM deg LEFT JOIN per_node ON deg.node = per_node.node
      |ORDER BY deg.node""".stripMargin

  // ------------------------------------------------------------- q_label_prop
  /** Synchronous label propagation (community detection): every node
    * starts labeled with its own id; each round it adopts the MOST
    * FREQUENT label among its neighbors, ties broken by the smallest
    * label — the deterministic LPA variant (async/random LPA is
    * irreproducible by construction; a data pipeline needs the same
    * communities on every run). Fixed `iters` rounds, no convergence
    * probe — LPA oscillates on bipartite structures, so production runs
    * are round-capped anyway.
    *
    * Per round: ranks-style broadcast of the node-sized label frame onto
    * the edge frame, one (dst, label) count aggregation, one per-dst
    * window to pick the (count desc, label asc) argmin — two exchanges
    * on the same dst key (AQE reuses the exchange). Integer counts +
    * integer tie-break: bit-identical on any layout and any engine; the
    * oracle replays the exact rounds in a recursive CTE. */
  val LabelPropIters = 3

  /** Deterministic synchronous LPA over a directed edge list (symmetrize
    * first for undirected semantics, as with pageRank). Nodes with no
    * in-edge keep their own label. */
  /** @param dedupEdges / layoutPartitions: pageRank's contract. */
  def labelPropagation(edges: DataFrame, iters: Int = LabelPropIters,
      broadcastLabels: Option[Boolean] = None,
      dedupEdges: Boolean = true,
      layoutPartitions: Option[Int] = None): DataFrame = {
    import edges.sparkSession.implicits._
    require(iters >= 1 && iters <= 20, s"iters must be in [1, 20], got $iters")
    import org.apache.spark.sql.expressions.Window
    // ONE edge-scale materialization, pre-laid-out on src and PINNED
    // (pageRank's contract — see [[pin]]: the caller's edge
    // construction runs once, nodes derive from the cached blocks, the
    // src layout survives into every per-round join)
    val eDedup = {
      val p = edges.select($"src", $"dst")
      if (dedupEdges) p.distinct() else p
    }
    val e = pin(layoutPartitions match {
      case Some(n) => eDedup.repartition(n, $"src")
      case None => eDedup.repartition($"src")
    })
    val nodes = e.select($"src".as("node")).unionByName(
      e.select($"dst".as("node"))).distinct().lineageCut(true)
    // same size switch as pageRank: past BroadcastNodeLimit the
    // per-round label rebroadcast is the scale-killer, so the edge frame
    // keeps its src layout and the node-sized side shuffles instead
    val bcast = broadcastLabels.getOrElse(nodes.count() <= BroadcastNodeLimit)
    var labels = nodes.withColumn("label", $"node")
    var i = 0
    while (i < iters) {
      val labelSide = labels.withColumnRenamed("node", "src")
      val byDst = e
        .join(if (bcast) broadcast(labelSide)
              else labelSide.hint("shuffle_hash"), "src")
        .groupBy($"dst".as("node"), $"label")
        .agg(count(lit(1)).as("n"))
      // argmin as an AGGREGATION, not a sort window: max of the struct
      // (n, -label) is (most frequent, then smallest label) — partial
      // aggregation collapses each node's candidates map-side, where the
      // equivalent row_number window would sort the whole candidate
      // frame inside each round
      val adopted = byDst
        .groupBy($"node")
        .agg(max(struct($"n", (-$"label").as("neg"))).as("m"))
        .select($"node", (-$"m.neg").as("label"))
      // isolated/receiving-nothing nodes keep their current label
      labels = nodes
        .join(adopted, Seq("node"), "left")
        .select($"node", coalesce($"label", $"node").as("label"))
      i += 1
      if (i % 3 == 0 || i == iters) labels = labels.lineageCut(true)
    }
    unpin(e)
    labels
  }

  private def labelPropQuery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // symmetrize + dedupEdges=false + sized layout: pageRankQuery's
    // rationale, same construction-distinct argument
    labelPropagation(symmetrize(interactionPairs(s, dir)),
        dedupEdges = false, layoutPartitions = layoutParts(s, dir))
      .select($"node", $"label")
      .orderBy($"node")
  }

  private val labelPropSql =
    s"""WITH RECURSIVE
       |pairs AS (
       |  SELECT DISTINCT o_custkey AS a, l_suppkey + $SupplierOffset AS b
       |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
       |edges AS (
       |  SELECT a AS src, b AS dst FROM pairs
       |  UNION ALL SELECT b, a FROM pairs),
       |nodes AS (SELECT DISTINCT src AS node FROM edges),
       |lp(iter, node, label) AS (
       |  SELECT 0, node, node FROM nodes
       |  UNION ALL
       |  SELECT c.iter + 1, c.node, c.label FROM (
       |    SELECT g.iter AS iter, g.node AS node, g.label AS label,
       |      row_number() OVER (PARTITION BY g.iter, g.node
       |        ORDER BY g.n DESC, g.label ASC) AS r
       |    FROM (
       |      SELECT lp.iter AS iter, e.dst AS node, lp.label AS label,
       |        COUNT(*) AS n
       |      FROM lp
       |      JOIN edges e ON lp.node = e.src
       |      WHERE lp.iter < $LabelPropIters
       |      GROUP BY lp.iter, e.dst, lp.label) g) c
       |  WHERE c.r = 1)
       |SELECT node, label FROM lp WHERE iter = $LabelPropIters
       |ORDER BY node""".stripMargin

  // ------------------------------------------------------------ q_link_predict
  /** Common-neighbor link prediction over the customer↔supplier
    * bipartite graph: score customer PAIRS by how many suppliers they
    * share — the collaborative-filtering candidate generator ("users
    * who buy from the same suppliers") and the simplest classical
    * link-prediction baseline. Top-k pairs by (score, u, v) — a unique
    * total order, so the cut is deterministic.
    *
    * Scale shape: wedges generate ROW-LOCALLY from each supplier's
    * sorted customer list (one orderkey-side shuffle to build the
    * lists), then one (u, v) hash-agg; no self-join. Hub suppliers are
    * the k² hazard, so fan-out is explicitly CAPPED: suppliers with
    * more than MaxFanout distinct customers are excluded (the standard
    * mitigation — a supplier half the corpus buys from predicts
    * nothing anyway, exactly like a stopword). The cap is part of the
    * operator's semantics and the oracle applies the identical cap. */
  val MaxFanout = 500

  private def linkPredict(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val pairs = Tables.orders(s, dir)
      .join(Tables.lineitem(s, dir), $"o_orderkey" === $"l_orderkey")
      .select($"o_custkey".as("cust"), $"l_suppkey".as("supp"))
      .distinct()
    val wedges = pairs
      .groupBy($"supp")
      .agg(sort_array(collect_set($"cust")).as("custs"))
      .filter(size($"custs").between(2, MaxFanout))
      .select(explode(expr(sortedPairsExpr("custs", "u", "v"))).as("p"))
      .select($"p.u", $"p.v")
    wedges.groupBy($"u", $"v")
      .agg(count(lit(1)).as("n_common"))
      .orderBy($"n_common".desc, $"u", $"v")
      .limit(50)
  }

  private val linkPredictSql =
    s"""WITH pairs AS (
       |  SELECT DISTINCT o_custkey AS cust, l_suppkey AS supp
       |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
       |deg AS (
       |  SELECT supp, COUNT(*) AS d FROM pairs GROUP BY supp),
       |ok AS (
       |  SELECT p.cust, p.supp FROM pairs p JOIN deg USING (supp)
       |  WHERE deg.d BETWEEN 2 AND $MaxFanout),
       |wedges AS (
       |  SELECT a.cust AS u, b.cust AS v
       |  FROM ok a JOIN ok b ON a.supp = b.supp AND a.cust < b.cust)
       |SELECT u, v, COUNT(*) AS n_common
       |FROM wedges GROUP BY u, v
       |ORDER BY n_common DESC, u, v LIMIT 50""".stripMargin

  // ------------------------------------------------------------------ q_kcore
  // audited-bnlj(q_kcore): build side = 1-row global-aggregate broadcast — audited in PlanAuditSpec/BnljAudit
  /** Bounded-round k-core peeling over the symmetrized customer↔supplier
    * graph: repeatedly drop nodes with degree < k (k = the p25 initial
    * degree, three peel rounds) and the edges they carry — the density
    * filter used to keep only well-connected entities (spam/bot
    * subgraphs peel away first).
    * True k-core iterates to fixpoint; this runs a FIXED round count so
    * the oracle can replay it exactly (unrolled CTE chain) — the
    * production loop is the same body driven to convergence with the
    * per-round keep-count fixpoint probe (GraphSpec measures the
    * fixture's fixpoint distance).
    *
    * Scale shape: each round is ONE streaming edge pass — a degree
    * aggregation (map-side partials, node-scale exchange) whose result
    * is checkpointed as the round's NODE frame, plus two keep-side semi
    * probes that build from that checkpoint and fuse into the next
    * pass's scan; the edge frame takes a COLUMNAR lineage cut every
    * third round (see [[peelLoop]]). */
  val KcoreRounds = 3

  /** Peel `rounds` times against a 1-row threshold frame (column `k`):
    * keep nodes whose degree in the CURRENT frame is ≥ k, restrict
    * edges to kept×kept. Edge frame must be symmetric (both directions
    * present). */
  /** Per-round keep-set join plan for the peel: BROADCAST while the
    * node set fits, SHUFFLED HASH past the ceiling — NEVER the auto
    * fallback, sort-merge, which sorts the edge frame twice per round.
    *
    * The ceiling is deliberately ABOVE Spark's 10 MB auto-broadcast
    * threshold, from a round-12 measurement at synthetic sf10 (1.65M
    * nodes ≈ 13 MB keep, 117M-row edge frame): the broadcast round is
    * ONE streaming pass over the edge frame (both semi probes fuse into
    * the scan's codegen stage, zero edge exchanges), while the
    * shuffled-hash round is three edge-scale materializations + two
    * shuffle round-trips — measured 6× the wall (395 s vs ~67 s
    * per 3-round batch). A keep frame is one long column, so 2M rows
    * ≈ 16 MB — per-round rebroadcast at that size is still far cheaper
    * than re-exchanging a 100×-larger edge frame twice. Past the
    * ceiling (true billion-node graphs) shuffled hash is the only shape
    * whose memory is bounded per executor; the 6× is the honest price
    * of that regime, and the fallback keeps the edge frame unsorted. */
  val KcoreKeepBroadcastLimit = 2000000L

  def kcorePeel(edges0: DataFrame, kFrame: DataFrame, rounds: Int,
      broadcastKeep: Option[Boolean] = None): DataFrame =
    peelLoop(edges0, kFrame, rounds, stopOnFixpoint = false, broadcastKeep)

  /** The shared peel engine. One EDGE-SCALE pass per round, full stop:
    * the round's degree aggregation (partial agg map-side, so the
    * exchange is node-scale) is checkpointed as a NODE-SCALE frame, and
    * both keep-side probes build from that checkpoint instead of
    * re-planning the aggregation — without it, each keep broadcast
    * embedded its own copy of the whole prior chain, and the executed
    * plan's edge-scan count grew EXPONENTIALLY in the lazy-round depth
    * (a 2-round chain already held 12 parquet scans, only partially
    * dedup'd by ReuseExchange; measured round 12).
    *
    * Every third round the chained frame takes a COLUMNAR lineage cut
    * (LineageCut.bulkCut), not a block-manager cut: at synthetic sf10
    * the block cut itself was the round's cost (a 211 s localCheckpoint
    * stage with 59 s of GC from ~6 GB of per-row UnsafeRow copies;
    * still 50–85 s under _SER). A parquet round-trip materializes the
    * same rows as a columnar encode + vectorized decode, costing bytes
    * instead of objects. Superseded cut files and the node-scale keep
    * checkpoints are released as soon as a successor cut is
    * materialized — the loop's live scratch is two edge copies plus at
    * most three node frames, never rounds of them. Only cuts THIS loop
    * created are released; the caller's input frame is untouched.
    *
    * `stopOnFixpoint` turns the round cap into a convergence loop with
    * PER-ROUND detection at node-scale cost: peeling is monotone (the
    * edge frame only shrinks, so degrees only fall), hence the keep
    * sets are NESTED — keep_r ⊆ keep_{r-1} — and count equality is set
    * equality. keep_r == keep_{r-1} means restricting e_{r-1} (whose
    * endpoints already all lie in keep_{r-1}) to keep_r removes
    * nothing: e_{r-1} IS the fixpoint. The old batched-poll shape paid
    * a full extra BATCH of edge-scale rounds plus an edge-scale
    * count() per batch to discover the same thing; the keep-count
    * probe is a count over the round's already-checkpointed node
    * frame. Detection costs exactly one overshoot round. */
  private def peelLoop(edges0: DataFrame, kFrame: DataFrame,
      maxRounds: Int, stopOnFixpoint: Boolean,
      broadcastKeep: Option[Boolean]): DataFrame = {
    import edges0.sparkSession.implicits._
    // No initial re-cut: every caller hands an already-materialized
    // frame (kcoreInputs bulk-cuts its symmetrized edges; spec callers
    // hand tiny hand-built graphs whose re-planning is free).
    var e = edges0
    var bcast = broadcastKeep
    var mine: graft.LineageCut.BulkCut = null
    var keeps = List.empty[DataFrame]
    def cutNow(): Unit = {
      val cut = graft.LineageCut.bulkCut(e)
      if (mine ne null) mine.release()
      mine = cut
      e = cut.df
      // the cut executed every chained probe, so the keeps' broadcast
      // sources are dead — release the node-scale checkpoints
      keeps.foreach(_.unpersist(blocking = false))
      keeps = Nil
    }
    var rounds = 0
    var prevKeep = -1L
    var converged = false
    while (!converged && rounds < maxRounds) {
      val deg = e.groupBy($"src").agg(count(lit(1)).as("d")).lineageCut(true)
      if (bcast.isEmpty) {
        // one keep-plan probe for the whole loop, EXACT and free off the
        // first round's materialized degree frame (the node set only
        // shrinks, so the initial decision stays valid — conservatively
        // so past the ceiling, where SHJ stays correct at any size)
        bcast = Some(deg.count() <= KcoreKeepBroadcastLimit)
      }
      val keep = deg.crossJoin(broadcast(kFrame))
        .filter($"d" >= $"k").select($"src".as("node")).toDF("node")
      val kc = if (stopOnFixpoint) keep.count() else -2L
      if (stopOnFixpoint && kc == prevKeep) {
        converged = true
        deg.unpersist(blocking = false) // overshoot round, nothing consumed it
      } else {
        prevKeep = kc
        def side(df: DataFrame): DataFrame =
          if (bcast.get) broadcast(df) else df.hint("shuffle_hash")
        e = e.join(side(keep.select($"node".as("src"))), Seq("src"), "left_semi")
          .join(side(keep.select($"node".as("dst"))), Seq("dst"), "left_semi")
        keeps ::= deg
        rounds += 1
        if (rounds % 3 == 0) cutNow()
      }
    }
    if (stopOnFixpoint && !converged) throw new IllegalStateException(
      s"kcoreConverged did not reach a fixpoint in $maxRounds rounds — " +
        s"the graph peels layer-by-layer deeper than the cap; raise maxRounds")
    if (keeps.nonEmpty || (mine eq null)) cutNow()
    e
  }

  /** Fixed-k convenience overload (hand-built graphs, specs). */
  def kcorePeel(edges0: DataFrame, k: Int, rounds: Int): DataFrame = {
    val s = edges0.sparkSession
    import s.implicits._
    kcorePeel(edges0, Seq(k.toLong).toDF("k"), rounds)
  }

  /** The production loop: drive [[kcorePeel]] to its FIXPOINT — the true
    * k-core. Detection is per-round off the nested-keep-count identity
    * (see [[peelLoop]]): one overshoot round, no confirmation batch, no
    * edge-scale count. The bench/oracle query stays on the fixed-round
    * variant so DuckDB can replay it as an unrolled CTE chain; GraphSpec
    * pins this variant to the fixed-round result at the fixture's
    * measured fixpoint distance. maxRounds bounds the worst case — a
    * path graph peels one layer per round, so pathological chains fail
    * loudly rather than loop.
    *
    * `checkEvery` is retained for signature compatibility but no longer
    * drives anything: the keep-count fixpoint probe is node-scale and
    * runs every round, which strictly dominates the old batched poll
    * (that paid a full extra batch of edge-scale rounds to observe an
    * unchanged edge count). */
  def kcoreConverged(edges0: DataFrame, kFrame: DataFrame,
      maxRounds: Int = 60, checkEvery: Int = 3): DataFrame = {
    require(maxRounds >= 1, s"maxRounds must be >= 1, got $maxRounds")
    require(checkEvery >= 1 && checkEvery <= 10,
      s"checkEvery must be in [1, 10], got $checkEvery")
    peelLoop(edges0, kFrame, maxRounds, stopOnFixpoint = true, None)
  }

  /** Fixed-k convenience overload (hand-built graphs, specs). */
  def kcoreConverged(edges0: DataFrame, k: Int): DataFrame = {
    val s = edges0.sparkSession
    import s.implicits._
    kcoreConverged(edges0, Seq(k.toLong).toDF("k"))
  }

  /** Shared graph + threshold construction for the two k-core rows:
    * symmetrized interaction edges, initial degrees, and the p25
    * order-statistic threshold frame. Returns (edges, deg0, kFrame),
    * each localCheckpoint'd for its multiple consumers. */
  private def kcoreInputs(s: SparkSession, dir: String)
      : (DataFrame, DataFrame, DataFrame) = {
    import s.implicits._
    // bulk (columnar) cut, not a block cut: the symmetrized edge frame
    // is the one edge-scale materialization of the whole k-core path —
    // at synthetic sf10 the block cut's per-row copy dominated setup.
    // symmetrize, not union-of-projections: one pair-construction pass
    // inside the cut's write job.
    val edges = graft.LineageCut.bulkCut(
      symmetrize(interactionPairs(s, dir))).df
    val deg0 = edges.groupBy($"src").agg(count(lit(1)).as("deg0"))
      .select($"src".as("node"), $"deg0")
      .lineageCut(true) // consumed by the rank, the count, and the final join
    // scale-adaptive threshold: the p25 ORDER-STATISTIC of the initial
    // degree distribution (rank ⌈n/4⌉ with a node-id tiebreak) — an
    // exact integer both engines replay, and it bites at every sf where
    // a fixed k would be vacuous at one scale and total at another. The
    // rank comes from Corpus.globalIndex (range-repartition + partitioned
    // window + offset broadcast), NOT `row_number() OVER (ORDER BY ...)`:
    // the node frame is unbounded (one row per graph node), and a global
    // unpartitioned window would serialize a billion-node frame through
    // one task at scale. (deg0, node) is unique — node is the group key.
    val ranked = Corpus.globalIndex(deg0, Seq($"deg0", $"node"))
    val nFrame = deg0.agg(count(lit(1)).as("n"))
    // localCheckpoint: the 1-row threshold is broadcast into EVERY peel
    // round plus the final projection — materialize the rank machinery
    // once instead of re-planning it per consumer.
    val kFrame = ranked
      .crossJoin(broadcast(nFrame))
      .filter($"global_idx" === expr("(n + 3) DIV 4"))
      .select($"deg0".as("k"))
      .lineageCut(true)
    (edges, deg0, kFrame)
  }

  /** Final projection shared by the two k-core rows: surviving-core
    * degrees joined back onto initial degrees + the threshold. */
  private def kcoreProject(core: DataFrame, deg0: DataFrame,
      kFrame: DataFrame): DataFrame = {
    import core.sparkSession.implicits._
    core.groupBy($"src").agg(count(lit(1)).as("deg_core"))
      .select($"src".as("node"), $"deg_core")
      .join(deg0, Seq("node"))
      .crossJoin(broadcast(kFrame))
      .select($"node", $"deg0", $"deg_core", $"k")
      .orderBy($"node")
  }

  private def kcoreQuery(s: SparkSession, dir: String): DataFrame = {
    val (edges, deg0, kFrame) = kcoreInputs(s, dir)
    kcoreProject(kcorePeel(edges, kFrame, KcoreRounds), deg0, kFrame)
  }

  // -------------------------------------------------------- q_kcore_converged
  // audited-bnlj(q_kcore_converged): build side = 1-row global-aggregate broadcast — audited in PlanAuditSpec/BnljAudit
  /** Round cap for the driver-visible CONVERGED k-core row. The oracle
    * unrolls exactly this many rounds: peeling is monotone and
    * idempotent past its fixpoint, so once kcoreConverged detects
    * convergence within the cap (fixpoint distance ≤ cap − 1, else it
    * THROWS rather than silently diverge), the cap-round unroll equals
    * the fixpoint at any scale factor. Fixture distance is 1–3 rounds
    * (GraphSpec measures it); 12 leaves an order-of-magnitude margin
    * while keeping the oracle's CTE chain replayable. */
  val KcoreConvergedMaxRounds = 12

  /** The TRUE k-core (fixpoint), driver-visible: same graph, threshold,
    * and projection as q_kcore, but driven to convergence by the
    * production loop instead of a fixed round count. Scale shape:
    * identical per round to q_kcore (one streaming edge pass, node-scale
    * keep checkpoint), plus a node-scale keep count per round as the
    * fixpoint probe — detection overshoots by exactly one round. */
  private def kcoreConvergedQuery(s: SparkSession, dir: String): DataFrame = {
    val (edges, deg0, kFrame) = kcoreInputs(s, dir)
    val core = kcoreConverged(edges, kFrame,
      maxRounds = KcoreConvergedMaxRounds, checkEvery = 3)
    kcoreProject(core, deg0, kFrame)
  }

  /** Unrolled-CTE oracle for an `nRounds`-round peel. Used at
    * KcoreRounds for q_kcore and at KcoreConvergedMaxRounds for
    * q_kcore_converged (where the unroll provably reaches the fixpoint
    * — see KcoreConvergedMaxRounds). */
  private def kcoreSqlFor(nRounds: Int): String = {
    // every per-round CTE is MATERIALIZED: DuckDB inlines a CTE at each
    // reference, and e_{r-1} is referenced three times per round — an
    // inlined chain re-plans the base scan O(3^rounds) times (the
    // 12-round unroll exhausted the file-handle limit re-opening
    // lineitem.parquet); materialization keeps the chain linear in rounds
    def round(r: Int): String =
      s"""k$r AS MATERIALIZED (SELECT src AS node FROM e${r - 1}
         |        GROUP BY src HAVING COUNT(*) >= (SELECT k FROM kv)),
         |e$r AS MATERIALIZED (
         |  SELECT e.src, e.dst FROM e${r - 1} e
         |  JOIN k$r a ON e.src = a.node
         |  JOIN k$r b ON e.dst = b.node)""".stripMargin
    s"""WITH pairs AS MATERIALIZED (
       |  SELECT DISTINCT o_custkey AS a, l_suppkey + $SupplierOffset AS b
       |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
       |e0 AS MATERIALIZED (
       |  SELECT a AS src, b AS dst FROM pairs
       |  UNION ALL SELECT b, a FROM pairs),
       |d0 AS MATERIALIZED (SELECT src AS node, COUNT(*) AS deg0 FROM e0 GROUP BY src),
       |kv AS MATERIALIZED (
       |  SELECT deg0 AS k FROM (
       |    SELECT deg0, row_number() OVER (ORDER BY deg0, node) AS rn,
       |      COUNT(*) OVER () AS n
       |    FROM d0)
       |  WHERE rn = (n + 3) // 4),
       |${(1 to nRounds).map(round).mkString(",\n")}
       |SELECT f.node, d0.deg0, f.deg_core, (SELECT k FROM kv) AS k
       |FROM (SELECT src AS node, COUNT(*) AS deg_core
       |      FROM e$nRounds GROUP BY src) f
       |JOIN d0 ON f.node = d0.node
       |ORDER BY f.node""".stripMargin
  }

  private val kcoreSql = kcoreSqlFor(KcoreRounds)
  private val kcoreConvergedSql = kcoreSqlFor(KcoreConvergedMaxRounds)

  // ---------------------------------------------------------- q_assortativity
  /** Degree assortativity of the interaction graph — the Pearson
    * correlation of endpoint degrees over the directed-both-ways edge
    * list (Newman 2002): negative means hubs attach to leaves
    * (disassortative, the typical bipartite-interaction signature).
    * Sufficient statistics are EXACT INTEGER sums (degrees are longs,
    * so Σd, Σd², Σd_src·d_dst sum exactly on any partitioning — no
    * DECIMAL routing even needed); the final correlation is a fixed
    * double sequence over them, rounded to 9dp (the q_correlation
    * recipe). By symmetry both endpoint marginals are identical —
    * spec-asserted, and the oracle pins every sum.
    *
    * Scale shape: one degree aggregation, two broadcast joins of the
    * node-sized degree frame onto the edge list, one global aggregate
    * with map-side partials. */
  private def assortativity(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // symmetrize, not union-of-projections: one pair-construction pass
    val edges = symmetrize(interactionPairs(s, dir))
    val deg = edges.groupBy($"src").agg(count(lit(1)).as("d"))
      .select($"src".as("node"), $"d")
    val stats = edges
      .join(broadcast(deg.select($"node".as("src"), $"d".as("dx"))), Seq("src"))
      .join(broadcast(deg.select($"node".as("dst"), $"d".as("dy"))), Seq("dst"))
      .agg(count(lit(1)).as("n"),
        sum($"dx").as("sx"), sum($"dy").as("sy"),
        sum($"dx" * $"dy").as("sxy"),
        sum($"dx" * $"dx").as("sxx"), sum($"dy" * $"dy").as("syy"))
    val nd = col("n").cast("double")
    val Seq(sx, sy, sxy, sxx, syy) =
      Seq("sx", "sy", "sxy", "sxx", "syy").map(c => col(c).cast("double"))
    stats.select($"n", $"sx", $"sy", $"sxy", $"sxx", $"syy",
      round((nd * sxy - sx * sy) /
        (sqrt(nd * sxx - sx * sx) * sqrt(nd * syy - sy * sy)), 9)
        .as("assortativity"))
  }

  private val assortativitySql =
    s"""WITH pairs AS (
       |  SELECT DISTINCT o_custkey AS a, l_suppkey + $SupplierOffset AS b
       |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
       |e AS (
       |  SELECT a AS src, b AS dst FROM pairs
       |  UNION ALL SELECT b, a FROM pairs),
       |deg AS (SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS d
       |        FROM e GROUP BY src),
       |t AS (
       |  SELECT COUNT(*) AS n,
       |    CAST(SUM(dx.d) AS BIGINT) AS sx, CAST(SUM(dy.d) AS BIGINT) AS sy,
       |    CAST(SUM(dx.d * dy.d) AS BIGINT) AS sxy,
       |    CAST(SUM(dx.d * dx.d) AS BIGINT) AS sxx,
       |    CAST(SUM(dy.d * dy.d) AS BIGINT) AS syy
       |  FROM e
       |  JOIN deg dx ON e.src = dx.node
       |  JOIN deg dy ON e.dst = dy.node)
       |SELECT n, sx, sy, sxy, sxx, syy,
       |  round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
       |    / (sqrt(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
       |       * sqrt(CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)), 9)
       |    AS assortativity
       |FROM t""".stripMargin

  // -------------------------------------------------------------------- q_hits
  // audited-bnlj(q_hits): build side = 1-row global-aggregate broadcast
  // (the MAX normalizer crossed back). In broadcast mode the final
  // round is left UNCUT — the round-11 spelling cut it eagerly, which
  // re-materialized the whole half-step chain and regressed the head
  // ~1.8x (round-12 interleaved A/B vs the r10 binary) — so the
  // registered plan carries the 1-row BNLJ again, as it did through
  // round 10.
  /** HITS hubs-and-authorities (Kleinberg 1999) over the DIRECTED
    * customer→supplier trading graph — the bipartite complement to
    * pageRank's symmetrized ranking: customers score as hubs (good
    * buyers touch many good suppliers), suppliers as authorities. Two
    * mutual-reinforcement rounds in integer micro-units, renormalized
    * each half-step by the frame MAX (the q_mix_weights recipe — MAX,
    * not L2, so the normalizer is itself an exact integer and the
    * iteration is bit-stable on any partitioning). The oracle replays
    * both rounds as an unrolled CTE chain with scalar-subquery MAXes —
    * a drifted score at any node fails the hash compare.
    *
    * Scale shape: the edge frame is built once and localCheckpoint'd;
    * each half-step joins edges to the BROADCAST node-sized score
    * frame and aggregates with map-side partials — edges never
    * re-shuffle, same contract as pageRank. The MAX normalizer is a
    * 1-row aggregate cross-joined back (broadcast-single-row). */
  val HitsUnit = 1000000L
  val HitsIters = 2

  def hits(edges: DataFrame, iters: Int = HitsIters,
      broadcastScores: Option[Boolean] = None,
      dedupEdges: Boolean = true): DataFrame = {
    import edges.sparkSession.implicits._
    require(iters >= 1 && iters <= 10, s"iters must be in [1, 10], got $iters")
    // lazy cut — the size probe below doubles as the materializing
    // action (same one-job contract as bfsDepth; round-12 A/B).
    // dedupEdges=false callers (construction-distinct edge lists) skip
    // the one edge-scale distinct exchange, pageRank's contract.
    val eProj = edges.select($"src", $"dst")
    val eRaw = (if (dedupEdges) eProj.distinct() else eProj).lineageCut(false)
    // the pageRank size switch, keyed on the larger node side (hub and
    // auth frames alternate through the per-half-step join); past the
    // limit the edge frame gets TWO iteration-invariant layouts — one
    // per join key — so each half-step's sort-merge join moves only the
    // node-sized score frame. The 1-row MAX normalizer stays a
    // broadcast at any scale. The probe is APPROXIMATE on purpose: the
    // switch is a plan heuristic, and an exact two-countDistinct agg
    // here is an edge-scale expand+exchange job charged to every call
    // (the round-11 spelling; part of the A/B-confirmed q_hits
    // regression) — approx_count_distinct is one codegen'd HLL pass
    // over the already-materialized blocks with a 64-row exchange.
    val bcast = broadcastScores.getOrElse {
      val r = eRaw.agg(approx_count_distinct($"src").as("ns"),
        approx_count_distinct($"dst").as("nd")).head()
      math.max(r.getLong(0), r.getLong(1)) <= BroadcastNodeLimit
    }
    val eSrc = if (bcast) eRaw
      else pin(eRaw.repartition($"src"))
    val eDst = if (bcast) eRaw
      else pin(eRaw.repartition($"dst"))
    def side(df: DataFrame): DataFrame =
      if (bcast) broadcast(df) else df.hint("shuffle_hash")
    var hub = eRaw.select($"src".as("node")).distinct()
      .withColumn("score", lit(HitsUnit))
    var auth: DataFrame = null
    var i = 0
    while (i < iters) {
      i += 1
      // Cut policy (A/B-measured, round 12): cut auth BEFORE the hub
      // half-step consumes it, so hub's lineage starts at auth's cut
      // blocks instead of re-deriving the whole ar-chain a second time
      // inside its own cut. The FINAL round is cut only in shuffle mode
      // (the returned union must not reference the pinned edge layouts
      // once they are released below); in broadcast mode it stays lazy
      // — the final consumer computes it once, with ReuseExchange
      // deduping the shared half-step shuffle between the union's two
      // branches (the round-10 shape). The round-11 spelling cut the
      // final round unconditionally and AFTER hr was built, paying each
      // round's chain twice: q_hits 2.9s → 5.2s on the same host.
      val cut = !bcast || i < iters
      val ar = eSrc.join(side(hub.withColumnRenamed("node", "src")), "src")
        .groupBy($"dst").agg(sum($"score").as("raw"))
        .withColumnRenamed("dst", "node")
      auth = ar.crossJoin(broadcast(ar.agg(max($"raw").as("mx"))))
        .select($"node", expr(s"raw * $HitsUnit DIV mx").as("score"))
      if (cut) auth = auth.lineageCut(true)
      val hr = eDst.join(side(auth.withColumnRenamed("node", "dst")), "dst")
        .groupBy($"src").agg(sum($"score").as("raw"))
        .withColumnRenamed("src", "node")
      hub = hr.crossJoin(broadcast(hr.agg(max($"raw").as("mx"))))
        .select($"node", expr(s"raw * $HitsUnit DIV mx").as("score"))
      if (cut) hub = hub.lineageCut(true)
    }
    if (!bcast) { unpin(eSrc); unpin(eDst) }
    hub.select(lit("hub").as("side"), $"node", $"score")
      .unionByName(auth.select(lit("auth").as("side"), $"node", $"score"))
  }

  private def hitsQuery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // the directed pair frame is already distinct (it IS the distinct
    // aggregation) — dedupEdges=false skips re-deduping it in hits
    val edges = Tables.orders(s, dir)
      .join(Tables.lineitem(s, dir), $"o_orderkey" === $"l_orderkey")
      .select($"o_custkey".as("src"), ($"l_suppkey" + SupplierOffset).as("dst"))
      .distinct()
    hits(edges, dedupEdges = false).orderBy($"side", $"node")
  }

  private val hitsSql = {
    def half(prev: String, out: String, joinKey: String, groupKey: String) =
      s"""${out}r AS (
         |  SELECT p.$groupKey AS node, CAST(SUM(x.score) AS BIGINT) AS raw
         |  FROM pairs p JOIN $prev x ON p.$joinKey = x.node GROUP BY 1),
         |$out AS (
         |  SELECT node,
         |    CAST(raw * $HitsUnit // (SELECT MAX(raw) FROM ${out}r) AS BIGINT)
         |      AS score
         |  FROM ${out}r)"""
    s"""WITH pairs AS (
       |  SELECT DISTINCT o_custkey AS src, l_suppkey + $SupplierOffset AS dst
       |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
       |h0 AS (
       |  SELECT DISTINCT src AS node, CAST($HitsUnit AS BIGINT) AS score
       |  FROM pairs),
       |${half("h0", "a1", "src", "dst")},
       |${half("a1", "h1", "dst", "src")},
       |${half("h1", "a2", "src", "dst")},
       |${half("a2", "h2", "dst", "src")}
       |SELECT 'hub' AS side, node, score FROM h2
       |UNION ALL SELECT 'auth' AS side, node, score FROM a2
       |ORDER BY side, node""".stripMargin
  }

  // --------------------------------------------------------------- q_bfs_depth
  /** Multi-source BFS over the symmetrized trading graph: minimum hop
    * distance from a seed set (the 25 lowest customer keys) out to
    * `BfsMaxDepth` hops — the traversal primitive behind "within-k
    * neighborhoods" (crawl frontiers, contamination blast radius,
    * GraphRAG expansion). Level-synchronous frontier iteration: each
    * round expands the frontier through the edge frame and anti-joins
    * the visited set, so a node's depth is fixed the first time it is
    * seen — exactly MIN(depth), which is what the oracle's recursive
    * CTE computes (UNION-dedup recursion keeps each level
    * node-bounded, no path explosion).
    *
    * Scale shape: the edge frame never re-shuffles — frontier and
    * visited sets are node-sized and broadcast into the expansion
    * join; one localCheckpoint per round bounds lineage (the pageRank
    * contract). Unreached nodes are omitted, not emitted as NULL. */
  val BfsMaxDepth = 3
  val BfsSeedMaxKey = 25L

  /** @param dedupEdges BFS is duplicate-INSENSITIVE (each round's
    *   expansion dedups the frontier), so the input distinct() exists
    *   only to shrink the materialized edge frame when the caller's
    *   edge list carries heavy duplication. Callers whose edges are
    *   distinct by construction (e.g. a distinct pair join symmetrized
    *   over disjoint key ranges) pass false and skip one edge-scale
    *   exchange. */
  def bfsDepth(edges: DataFrame, seeds: DataFrame,
      maxDepth: Int = BfsMaxDepth,
      broadcastFrontier: Option[Boolean] = None,
      dedupEdges: Boolean = true): DataFrame = {
    import edges.sparkSession.implicits._
    require(maxDepth >= 1 && maxDepth <= 10,
      s"maxDepth must be in [1, 10], got $maxDepth")
    // LAZY cut: the probe below is the materializing action, so the
    // edge frame's one-time build pays for the size probe too — one
    // job, not two (the round-11 eager-cut-then-probe spelling charged
    // an extra edge-scale job to every call; A/B-confirmed regression)
    val eProj = edges.select($"src", $"dst")
    val eRaw = (if (dedupEdges) eProj.distinct() else eProj).lineageCut(false)
    // the pageRank size switch, keyed on the graph's node count: the
    // frontier and visited sets grow TOWARD node size as the BFS
    // saturates, so on a big graph the per-round frontier broadcast and
    // visited anti-join broadcast both become node-sized rebroadcasts —
    // lay the edge frame out on src once and let the (at-most-node-
    // sized) frontier shuffle instead. Early small frontiers still move
    // cheaply: a shuffle of a tiny frame is one small exchange.
    // Approximate probe, deliberately: the exact distinct().count() the
    // round-11 spelling ran here is an edge-scale exchange charged to
    // every call (A/B-confirmed as q_bfs_depth's regression); one HLL
    // pass over the already-materialized blocks decides the same
    // heuristic.
    val bcast = broadcastFrontier.getOrElse(
      eRaw.agg(approx_count_distinct($"src")).head().getLong(0)
        <= BroadcastNodeLimit)
    val e = if (bcast) eRaw
      else pin(eRaw.repartition($"src"))
    def side(df: DataFrame): DataFrame =
      if (bcast) broadcast(df) else df.hint("shuffle_hash")
    var visited = seeds.select($"node").distinct()
      .withColumn("depth", lit(0)).lineageCut(true)
    var d = 1
    while (d <= maxDepth) {
      // The frontier is DERIVED from the checkpointed visited frame
      // (depth == d-1 rows), not carried as the lazy `next` plan: a
      // lazy frontier makes the next round's broadcast build re-execute
      // the whole edge-scale expansion a second time (two edge passes
      // per round; measured round 12 as q_bfs_depth's residual gap).
      // Filtering the node-scale checkpoint is free, so each round is
      // exactly ONE streaming edge pass — inside the eager cut below.
      val frontier = visited.filter($"depth" === lit(d - 1)).select($"node")
      val next = e
        .join(side(frontier.withColumnRenamed("node", "src")), "src")
        .select($"dst".as("node")).distinct()
        .join(side(visited.select($"node")), Seq("node"), "left_anti")
      val prev = visited
      visited = visited
        .unionByName(next.withColumn("depth", lit(d)))
        .lineageCut(true)
      // superseded node-scale checkpoint — nothing references it now
      prev.unpersist(blocking = false)
      d += 1
    }
    if (!bcast) unpin(e)
    visited
  }

  private def bfsQuery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // symmetrize (one explode pass) instead of the union whose arms each
    // re-ran the pair construction; dedupEdges=false as before (pairs is
    // distinct, orientations in disjoint key ranges). Seeds stay
    // edge-derived: a BFS seed MUST be a graph node (it is emitted at
    // depth 0), so the cheaper orders-side candidates would change the
    // output for custkeys without lineitem-bearing orders.
    val edges = symmetrize(interactionPairs(s, dir))
    val seeds = edges.select($"src".as("node"))
      .filter($"node" <= BfsSeedMaxKey).distinct()
    bfsDepth(edges, seeds, dedupEdges = false).orderBy($"node")
  }

  private val bfsSql =
    s"""WITH RECURSIVE
       |pairs AS (
       |  SELECT DISTINCT o_custkey AS a, l_suppkey + $SupplierOffset AS b
       |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
       |edges AS (
       |  SELECT a AS src, b AS dst FROM pairs
       |  UNION ALL SELECT b, a FROM pairs),
       |bfs(node, depth) AS (
       |  SELECT DISTINCT src AS node, 0 AS depth FROM edges
       |  WHERE src <= $BfsSeedMaxKey
       |  UNION
       |  SELECT e.dst, b.depth + 1
       |  FROM bfs b JOIN edges e ON b.node = e.src
       |  WHERE b.depth < $BfsMaxDepth)
       |SELECT node, CAST(MIN(depth) AS INT) AS depth
       |FROM bfs GROUP BY node ORDER BY node""".stripMargin

  // ------------------------------------------------------------- q_degree_dist
  // audited-global-window(q_degree_dist): frame = <=64-row log2 bucket axis — bound audited in PlanAuditSpec/UnpartitionedWindowAudit
  // audited-bnlj(q_degree_dist): build side = 1-row global-aggregate broadcast — audited in PlanAuditSpec/BnljAudit
  /** Log2-bucketed degree distribution with CCDF — the structural audit
    * that tells you whether a graph is scale-free BEFORE you pick join
    * strategies for it (a heavy tail means skew guards and salting; a
    * bounded tail means plain hash joins survive). Bucket = bit-length
    * of the degree (floor(log2)+1 — pure integer, identical `bin()`
    * string length on both engines); CCDF in exact ppm from a
    * descending cumulative window over the bucket frame.
    *
    * Scale shape: one degree aggregation over edges (map-side
    * partials), one aggregation to the ≤64-row bucket frame; the
    * cumulative window runs on that. */
  private def degreeDist(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // symmetrize, not union-of-projections: one pair-construction pass
    val edges = symmetrize(interactionPairs(s, dir))
    val deg = edges.groupBy($"src").agg(count(lit(1)).as("degree"))
    val buckets = deg
      .groupBy(length(bin($"degree")).as("log2_bucket"))
      .agg(count(lit(1)).as("n_nodes"), sum($"degree").as("edge_ends"))
    val wTail = Window.orderBy($"log2_bucket".desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val total = buckets.agg(sum($"n_nodes").as("total_nodes"))
    buckets.crossJoin(broadcast(total))
      .withColumn("tail_nodes", sum($"n_nodes").over(wTail))
      .select($"log2_bucket", $"n_nodes", $"edge_ends",
        expr("tail_nodes * 1000000 DIV total_nodes").as("ccdf_ppm"))
      .orderBy($"log2_bucket")
  }

  private val degreeDistSql =
    s"""WITH pairs AS (
       |  SELECT DISTINCT o_custkey AS a, l_suppkey + $SupplierOffset AS b
       |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
       |edges AS (
       |  SELECT a AS src, b AS dst FROM pairs
       |  UNION ALL SELECT b, a FROM pairs),
       |deg AS (SELECT src, COUNT(*) AS degree FROM edges GROUP BY 1),
       |buckets AS (
       |  SELECT CAST(length(bin(degree)) AS INT) AS log2_bucket,
       |    COUNT(*) AS n_nodes, CAST(SUM(degree) AS BIGINT) AS edge_ends
       |  FROM deg GROUP BY 1)
       |SELECT log2_bucket, n_nodes, edge_ends,
       |  CAST(SUM(n_nodes) OVER (ORDER BY log2_bucket DESC
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       |    * 1000000 // CAST((SELECT SUM(n_nodes) FROM buckets) AS BIGINT)
       |    AS ccdf_ppm
       |FROM buckets ORDER BY log2_bucket""".stripMargin

  // -------------------------------------------------------------- q_modularity
  // audited-bnlj(q_modularity): build side = 1-row global-aggregate broadcast — audited in PlanAuditSpec/BnljAudit
  /** Newman modularity of the NATION partition over the symmetrized
    * co-purchase graph — "is trade more intra-nation than a random
    * graph with the same degrees predicts?" — the quality score used to
    * grade any community assignment (here a fixed, meaningful partition
    * so the oracle needs no iteration replay; the same kernel grades
    * q_label_prop's discovered labels). Everything stays EXACT INTEGER
    * via the 4m²-scaling identity: with E the directed-both-ways edge
    * list, e2_c directed edges inside community c, and d_c the summed
    * degree, Q·|E|² = Σ_c (|E|·e2_c − d_c²) — per-community
    * contributions are longs (capacity: |E| < 3·10⁹ keeps |E|·e2_c and
    * d_c² in a long), and the only doubles are the final per-row
    * 9dp-rounded ratios (the q_assortativity recipe).
    *
    * Scale shape: one distinct-pair aggregation builds E; the
    * node→community map is node-sized and broadcast onto E twice; one
    * keyed aggregation to the communities-sized frame. Nothing
    * iterates, nothing corpus-sized shuffles twice. */
  /** The reusable kernel: per-community contributions + the −1 total row
    * over a DIRECTED-BOTH-WAYS edge list (`src`,`dst`) and a node→`comm`
    * map. GraphSpec pins hand-graph closed forms through this. */
  def modularityScore(edges: DataFrame, comm: DataFrame): DataFrame = {
    import edges.sparkSession.implicits._
    val tagged = edges
      .join(broadcast(comm.select($"node".as("src"), $"comm".as("comm_s"))),
        Seq("src"))
      .join(broadcast(comm.select($"node".as("dst"), $"comm".as("comm_d"))),
        Seq("dst"))
    val perComm = tagged.groupBy($"comm_s".as("community"))
      .agg(count(lit(1)).as("d_c"),
        sum(when($"comm_s" === $"comm_d", 1L).otherwise(0L)).as("e2_c"))
    // |E| as a broadcast-single-row frame, not a driver-side count
    val m2 = edges.agg(count(lit(1)).as("m2"))
    val rows = perComm.crossJoin(broadcast(m2))
      .withColumn("contrib", $"m2" * $"e2_c" - $"d_c" * $"d_c")
    val total = rows.agg(lit(-1L).as("community"),
      sum($"d_c").as("d_c"), sum($"e2_c").as("e2_c"),
      sum($"contrib").as("contrib"), max($"m2").as("m2"))
    rows.select($"community", $"d_c", $"e2_c", $"contrib", $"m2")
      .unionByName(total.select($"community", $"d_c", $"e2_c", $"contrib", $"m2"))
      .withColumn("q_share",
        round($"contrib".cast("double") / ($"m2".cast("double") * $"m2"), 9))
      .select($"community", $"d_c", $"e2_c", $"contrib", $"q_share")
      .orderBy($"community")
  }

  /** The symmetrized co-purchase graph + nation community map shared by
    * q_modularity and q_conductance. */
  private def nationCommunityGraph(s: SparkSession,
      dir: String): (DataFrame, DataFrame) = {
    import s.implicits._
    // symmetrize, not union-of-projections: one pair-construction pass
    val edges = symmetrize(interactionPairs(s, dir))
    val comm = Tables.customer(s, dir)
      .select($"c_custkey".as("node"), $"c_nationkey".as("comm"))
      .unionByName(Tables.supplier(s, dir)
        .select(($"s_suppkey" + SupplierOffset).as("node"),
          $"s_nationkey".as("comm")))
    (edges, comm)
  }

  private def modularity(s: SparkSession, dir: String): DataFrame = {
    val (edges, comm) = nationCommunityGraph(s, dir)
    modularityScore(edges, comm)
  }

  private val modularitySql =
    s"""WITH pairs AS (
       |  SELECT DISTINCT o_custkey AS a, l_suppkey + $SupplierOffset AS b
       |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
       |e AS (
       |  SELECT a AS src, b AS dst FROM pairs
       |  UNION ALL SELECT b, a FROM pairs),
       |comm AS (
       |  SELECT c_custkey AS node, c_nationkey AS comm FROM customer
       |  UNION ALL
       |  SELECT s_suppkey + $SupplierOffset, s_nationkey FROM supplier),
       |m2 AS (SELECT CAST(COUNT(*) AS BIGINT) AS m2 FROM e),
       |per AS (
       |  SELECT cs.comm AS community, CAST(COUNT(*) AS BIGINT) AS d_c,
       |    CAST(SUM(CASE WHEN cs.comm = cd.comm THEN 1 ELSE 0 END) AS BIGINT)
       |      AS e2_c
       |  FROM e
       |  JOIN comm cs ON e.src = cs.node
       |  JOIN comm cd ON e.dst = cd.node
       |  GROUP BY 1),
       |rows_ AS (
       |  SELECT community, d_c, e2_c, m2.m2 * e2_c - d_c * d_c AS contrib
       |  FROM per CROSS JOIN m2
       |  UNION ALL
       |  SELECT -1, CAST(SUM(d_c) AS BIGINT), CAST(SUM(e2_c) AS BIGINT),
       |    CAST(SUM(m2.m2 * e2_c - d_c * d_c) AS BIGINT)
       |  FROM per CROSS JOIN m2)
       |SELECT community, d_c, e2_c, contrib,
       |  round(CAST(contrib AS DOUBLE)
       |    / (CAST(m2.m2 AS DOUBLE) * m2.m2), 9) AS q_share
       |FROM rows_ CROSS JOIN m2 ORDER BY community""".stripMargin

  // -------------------------------------------------------------- q_conductance
  // audited-bnlj(q_conductance): build side = 1-row global-aggregate broadcast — audited in PlanAuditSpec/BnljAudit
  /** Cut conductance of each nation community over the co-purchase
    * graph — the cut-quality complement to q_modularity's density score:
    * φ(C) = cut(C) / min(vol(C), vol(C̄)), where vol is summed degree
    * and the cut is every edge leaving C. On the directed-both-ways
    * frame everything is exact integer arithmetic: vol = d_c (edges
    * with src in C), internal = e2_c, cut = d_c − e2_c, φ in exact ppm
    * by integer DIV. Low φ = a well-separated community; φ → 1e6 means
    * the "community" is all boundary (the expected answer for nation
    * labels over a bipartite trade graph — nations trade globally).
    *
    * Scale shape: identical to q_modularity — the node→community map
    * broadcasts onto the edge frame twice, one keyed aggregation. */
  private def conductance(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val (edges, comm) = nationCommunityGraph(s, dir)
    val tagged = edges
      .join(broadcast(comm.select($"node".as("src"), $"comm".as("comm_s"))),
        Seq("src"))
      .join(broadcast(comm.select($"node".as("dst"), $"comm".as("comm_d"))),
        Seq("dst"))
    val perComm = tagged.groupBy($"comm_s".cast("long").as("community"))
      .agg(count(lit(1)).as("d_c"),
        sum(when($"comm_s" === $"comm_d", 1L).otherwise(0L)).as("e2_c"))
    val m2 = tagged.agg(count(lit(1)).as("m2"))
    perComm.crossJoin(broadcast(m2))
      .withColumn("cut", $"d_c" - $"e2_c")
      .withColumn("phi_ppm",
        expr("cut * 1000000 DIV least(d_c, m2 - d_c)"))
      .select($"community", $"d_c", $"e2_c", $"cut", $"phi_ppm")
      .orderBy($"community")
  }

  private val conductanceSql =
    s"""WITH pairs AS (
       |  SELECT DISTINCT o_custkey AS a, l_suppkey + $SupplierOffset AS b
       |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
       |e AS (
       |  SELECT a AS src, b AS dst FROM pairs
       |  UNION ALL SELECT b, a FROM pairs),
       |comm AS (
       |  SELECT c_custkey AS node, c_nationkey AS comm FROM customer
       |  UNION ALL
       |  SELECT s_suppkey + $SupplierOffset, s_nationkey FROM supplier),
       |tagged AS (
       |  SELECT cs.comm AS community,
       |    CASE WHEN cs.comm = cd.comm THEN 1 ELSE 0 END AS internal
       |  FROM e
       |  JOIN comm cs ON e.src = cs.node
       |  JOIN comm cd ON e.dst = cd.node),
       |per AS (
       |  SELECT community, CAST(COUNT(*) AS BIGINT) AS d_c,
       |    CAST(SUM(internal) AS BIGINT) AS e2_c
       |  FROM tagged GROUP BY 1),
       |m2 AS (SELECT CAST(COUNT(*) AS BIGINT) AS m2 FROM tagged)
       |SELECT community, d_c, e2_c, d_c - e2_c AS cut,
       |  (d_c - e2_c) * 1000000 // least(d_c, m2 - d_c) AS phi_ppm
       |FROM per CROSS JOIN m2 ORDER BY community""".stripMargin

  // ---------------------------------------------------------- q_resource_alloc
  /** Resource-Allocation link prediction (Zhou–Lü–Zhang 2009) over the
    * customer–supplier bipartite graph — q_link_predict's common-
    * neighbor count, but each shared supplier weighted INVERSELY to its
    * popularity (a niche supplier shared by two customers is stronger
    * evidence than a hub everyone buys from). RA's 1/deg weight is
    * chosen over Adamic–Adar's 1/log(deg) deliberately: it is RATIONAL
    * in the degree, so 1e9 DIV d is exact at full resolution on both
    * engines — an integer-quantized log (bit length) was measured too
    * coarse to separate this fixture's degree bands, and libm log is
    * engine-dependent. (RA also tends to outperform AA empirically on
    * dense graphs — Zhou et al.'s original finding.)
    *
    * Scale shape: identical to q_link_predict — wedges generate
    * row-locally from per-supplier sorted customer lists under the
    * MaxFanout hub cap (the k² hazard mitigation), weights ride the
    * supplier row into the explode, one (u,v)-keyed aggregation. */
  private def resourceAlloc(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val pairs = Tables.orders(s, dir)
      .join(Tables.lineitem(s, dir), $"o_orderkey" === $"l_orderkey")
      .select($"o_custkey".as("cust"), $"l_suppkey".as("supp"))
      .distinct()
    val wedges = pairs
      .groupBy($"supp")
      .agg(sort_array(collect_set($"cust")).as("custs"),
        count(lit(1)).as("d"))
      .filter(size($"custs").between(2, MaxFanout))
      .withColumn("w", expr("1000000000 DIV d"))
      .select(explode(expr(sortedPairsExpr("custs", "u", "v"))).as("p"), $"w")
      .select($"p.u", $"p.v", $"w")
    wedges.groupBy($"u", $"v")
      .agg(count(lit(1)).as("n_common"), sum($"w").as("ra_nano"))
      .orderBy($"ra_nano".desc, $"u", $"v")
      .limit(50)
  }

  private val resourceAllocSql =
    s"""WITH pairs AS (
       |  SELECT DISTINCT o_custkey AS cust, l_suppkey AS supp
       |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
       |deg AS (
       |  SELECT supp, CAST(COUNT(*) AS BIGINT) AS d FROM pairs GROUP BY supp),
       |ok AS (
       |  SELECT p.cust, p.supp, 1000000000 // deg.d AS w
       |  FROM pairs p JOIN deg USING (supp)
       |  WHERE deg.d BETWEEN 2 AND $MaxFanout),
       |wedges AS (
       |  SELECT a.cust AS u, b.cust AS v, a.w
       |  FROM ok a JOIN ok b ON a.supp = b.supp AND a.cust < b.cust)
       |SELECT u, v, COUNT(*) AS n_common, CAST(SUM(w) AS BIGINT) AS ra_nano
       |FROM wedges GROUP BY u, v
       |ORDER BY ra_nano DESC, u, v LIMIT 50""".stripMargin

  // ------------------------------------------------------ q_random_walk
  /** Deterministic random walks (the DeepWalk/node2vec corpus-generation
    * primitive): from every start node, [[WalkSteps]] steps; step t at
    * node v moves to the neighbor ranked md5("walk:<walker>:<t>") mod
    * deg(v) in v's dst-sorted adjacency. The "randomness" is a hash of
    * (walker, step) — layout- and engine-independent — so the DuckDB
    * oracle replays every walk bit-for-bit in a recursive CTE and the
    * emitted paths hash-compare exactly. Walks never die: the
    * symmetrized interaction graph gives every node degree ≥ 1.
    *
    * Scale shape: the ranked adjacency (src, rnk, dst) is built once
    * (one src-keyed window whose per-partition state is one node's
    * neighbor list) and localCheckpoint'd with its degree frame; each
    * step is two keyed equi-joins — walkers ⋈ degrees on the current
    * node to compute the pick, then (node, pick) ⋈ adjacency on
    * (src, rnk) — so a step never expands beyond ONE row per walker
    * regardless of hub degree (a filter-after-join on a hub's full
    * neighborhood would). Walker state is (walker, node, path);
    * lineage is cut every 3 steps. */
  val WalkSteps = 6
  val WalkStartMod = 25L

  /** The walk frame (walker, node, path) after [[WalkSteps]] steps —
    * shared by q_random_walk (emits it) and q_skipgram_pairs (mines it
    * for training pairs). */
  private def randomWalks(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // symmetrize, not union-of-projections: one pair-construction pass
    val edges = symmetrize(interactionPairs(s, dir))
    val w = Window.partitionBy($"src").orderBy($"dst")
    val adj = edges
      .withColumn("rnk", (row_number().over(w) - 1).cast("long"))
      .lineageCut(true)
    val deg = adj.groupBy($"src").agg(count(lit(1)).as("deg"))
      .withColumnRenamed("src", "node")
      .lineageCut(true)
    var walk = adj.select($"src".as("walker")).distinct()
      .filter($"walker" < SupplierOffset && $"walker" % WalkStartMod === 1L)
      .select($"walker", $"walker".as("node"),
        $"walker".cast("string").as("path"))
    for (t <- 1 to WalkSteps) {
      val stepped = walk
        .join(deg, Seq("node"))
        .withColumn("pick",
          graft.functions.TextFunctions.md5Lower64(
            concat(lit("walk:"), $"walker".cast("string"),
              lit(":"), lit(t.toString)))
            .bitwiseAND(lit(Long.MaxValue)) % $"deg")
        .join(adj.select($"src".as("node"), $"rnk".as("pick"), $"dst"),
          Seq("node", "pick"))
        .select($"walker", $"dst".as("node"),
          concat($"path", lit(","), $"dst".cast("string")).as("path"))
      walk = if (t % 3 == 0) stepped.lineageCut(true) else stepped
    }
    walk
  }

  private def randomWalkQuery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    randomWalks(s, dir)
      .select($"walker", $"node".as("final_node"), $"path")
      .orderBy($"walker")
  }

  /** Walk-generating CTE chain shared by the q_random_walk and
    * q_skipgram_pairs oracles (everything up to the final SELECT). */
  private val walkCtes =
    s"""WITH RECURSIVE pairs AS (
       |  SELECT DISTINCT o_custkey AS a, l_suppkey + $SupplierOffset AS b
       |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
       |edges AS (
       |  SELECT a AS src, b AS dst FROM pairs
       |  UNION ALL SELECT b AS src, a AS dst FROM pairs),
       |adj AS (
       |  SELECT src, dst,
       |    ROW_NUMBER() OVER (PARTITION BY src ORDER BY dst) - 1 AS rnk,
       |    COUNT(*) OVER (PARTITION BY src) AS deg
       |  FROM edges),
       |starts AS (
       |  SELECT DISTINCT src AS walker FROM adj
       |  WHERE src < $SupplierOffset AND src % $WalkStartMod = 1),
       |walk(walker, step, node, path) AS (
       |  SELECT walker, 0, walker, CAST(walker AS VARCHAR) FROM starts
       |  UNION ALL
       |  SELECT w.walker, w.step + 1, a.dst,
       |    w.path || ',' || CAST(a.dst AS VARCHAR)
       |  FROM walk w JOIN adj a ON a.src = w.node
       |    AND a.rnk = CAST(md5_number_lower(
       |        'walk:' || CAST(w.walker AS VARCHAR) || ':' ||
       |        CAST(w.step + 1 AS VARCHAR))
       |      & 9223372036854775807::UBIGINT AS BIGINT) % a.deg
       |  WHERE w.step < $WalkSteps)""".stripMargin

  private[operators] val randomWalkSql =
    s"""$walkCtes
       |SELECT walker, node AS final_node, path FROM walk
       |WHERE step = $WalkSteps ORDER BY walker""".stripMargin

  // ---------------------------------------------------- q_skipgram_pairs
  /** Skip-gram training-pair extraction from the walks — the second half
    * of the DeepWalk recipe: every (center, context) node pair within
    * ±[[SkipgramWindow]] positions of each other inside a walk, counted
    * across the walk corpus. Pair generation is entirely ROW-LOCAL
    * (nested array HOFs inside codegen — a walk never leaves its task
    * until the one (center, context)-keyed count), which is the property
    * that makes the recipe corpus-scale: 100 TB of walks shuffle only
    * their pair histogram. The oracle formulates it the OTHER way — a
    * positional self-join on unnested paths — so agreement also checks
    * the HOF window arithmetic against a declarative spelling. */
  val SkipgramWindow = 2

  private def skipgramPairs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    randomWalks(s, dir)
      .select(split($"path", ",").as("toks"))
      .select(explode(expr(
        s"""flatten(transform(toks, (c, i) ->
           |  transform(
           |    filter(sequence(greatest(0, i - $SkipgramWindow),
           |                    least(size(toks) - 1, i + $SkipgramWindow)),
           |           j -> j != i),
           |    j -> struct(CAST(c AS BIGINT) AS center,
           |                CAST(element_at(toks, j + 1) AS BIGINT)
           |                  AS context))))""".stripMargin)).as("p"))
      .select($"p.center", $"p.context")
      .groupBy($"center", $"context")
      .agg(count(lit(1)).as("n"))
      .orderBy($"center", $"context")
  }

  private val skipgramPairsSql =
    s"""$walkCtes,
       |pos AS (
       |  SELECT walker, CAST(node AS BIGINT) AS node, ord FROM (
       |    SELECT walker, unnest(string_split(path, ',')) AS node,
       |      generate_subscripts(string_split(path, ','), 1) AS ord
       |    FROM walk WHERE step = $WalkSteps))
       |SELECT a.node AS center, b.node AS context, COUNT(*) AS n
       |FROM pos a JOIN pos b
       |  ON a.walker = b.walker AND a.ord <> b.ord
       |  AND abs(a.ord - b.ord) <= $SkipgramWindow
       |GROUP BY 1, 2 ORDER BY center, context""".stripMargin

  // ---------------------------------------------------------------- q_ppr
  /** PERSONALIZED PageRank — pageRank's seed-biased sibling (the
    * GraphRAG / "expand from these documents" scoring primitive): the
    * restart mass lands only on a SEED set instead of uniformly, so
    * scores measure proximity to the seeds. Same integer micro-unit
    * doctrine as pageRank (seed mass ⌊15%·10⁶⌋ per round, 85% damped
    * integer shares), so the iteration is bit-stable on any
    * partitioning and the DuckDB oracle replays it as a recursive CTE
    * with a seed-conditional base and update — the dense formulation
    * (zero ranks ride along; the symmetrized graph gives every node an
    * in-edge, pageRank's own coverage argument).
    *
    * Scale shape: identical to pageRank's (one edge-scale
    * materialization, size-switched per-round join), plus the PPR-
    * specific win: the rank side is FILTERED to rank > 0 before each
    * round's join — pure optimization (zero rank ⇒ zero contribution),
    * but on a large graph with few seeds the early rounds ship only
    * the reached frontier's scores, not the node space.
    *
    * PRECONDITION (oracle contract): every node must have at least one
    * in-edge — pass a SYMMETRIZED edge list, as `pprQuery` does. The
    * dense recursive-CTE oracle re-derives each round's rank set from
    * the grouped contribution rows (inner join back to nodes), so a
    * node receiving no contribution vanishes from the CTE — while this
    * operator keeps it via the left join + coalesce (a seed with no
    * in-edge would retain rank = seedMass here but disappear there).
    * On a symmetrized graph the two are provably identical; on a raw
    * directed graph they are NOT. `requireInEdges = true` enforces the
    * precondition with one anti-join (off by default: it's a full
    * edge-scale check, wrong to pay on every benched call). */
  val PprIters = 4

  def personalizedPageRank(edges: DataFrame, seeds: DataFrame,
      iters: Int = PprIters,
      broadcastRanks: Option[Boolean] = None,
      requireInEdges: Boolean = false,
      dedupEdges: Boolean = true,
      layoutPartitions: Option[Int] = None): DataFrame = {
    import edges.sparkSession.implicits._
    require(iters >= 1 && iters <= 50, s"iters must be in [1, 50], got $iters")
    // pageRank's setup contract: one edge-scale materialization
    val eProj = edges.select($"src", $"dst")
    val e = if (dedupEdges) eProj.distinct() else eProj
    if (requireInEdges) {
      val uncovered = e.select($"src")
        .except(e.select($"dst".as("src"))).limit(1).count()
      require(uncovered == 0L,
        "personalizedPageRank precondition violated: found a node with no " +
          "in-edge — symmetrize the edge list (src∪dst both directions) or " +
          "the documented dense-CTE oracle semantics do not apply")
    }
    val deg = e.groupBy($"src").agg(count(lit(1)).as("outdeg"))
    val edgesDeg = pin(layoutPartitions match {
      case Some(n) => e.join(deg, "src").repartition(n, $"src")
      case None => e.join(deg, "src").repartition($"src")
    })
    val nodes = edgesDeg.select($"src".as("node")).distinct()
      .join(seeds.select($"node", lit(1L).as("s")), Seq("node"), "left")
      .select($"node", coalesce($"s", lit(0L)).as("s"))
      .lineageCut(true)
    val bcast = broadcastRanks.getOrElse(nodes.count() <= BroadcastNodeLimit)
    val seedMass = RankUnit * 15 / 100
    var ranks = nodes.select($"node", ($"s" * RankUnit).as("rank"))
      .lineageCut(true)
    var i = 0
    while (i < iters) {
      val rankSide = ranks.filter($"rank" > 0)
        .withColumnRenamed("node", "src")
      val contribs = edgesDeg
        .join(if (bcast) broadcast(rankSide)
              else rankSide.hint("shuffle_hash"), "src")
        .select($"dst".as("node"), expr("rank DIV outdeg").as("contrib"))
        .groupBy($"node")
        .agg(sum($"contrib").as("m"))
      ranks = nodes
        .join(contribs, Seq("node"), "left")
        .select($"node",
          ($"s" * seedMass + expr("85 * coalesce(m, 0L) DIV 100")).as("rank"))
      i += 1
      if (i % 3 == 0 || i == iters) ranks = ranks.lineageCut(true)
    }
    unpin(edgesDeg)
    ranks.filter($"rank" > 0)
  }

  private def pprQuery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // the BFS seed convention: the 25 lowest customer keys. Derived from
    // the ORDERS scan (pushed o_custkey filter), not from the edge frame:
    // seeds only enter via a LEFT join from the graph's node frame, so a
    // candidate without lineitems (hence not a node) is simply never
    // matched — same seed flags, one table scan instead of re-running
    // the whole pair construction for 25 rows.
    val seeds = Tables.orders(s, dir)
      .filter($"o_custkey" <= BfsSeedMaxKey)
      .select($"o_custkey".as("node")).distinct()
    personalizedPageRank(symmetrize(interactionPairs(s, dir)), seeds,
        dedupEdges = false, layoutPartitions = layoutParts(s, dir))
      .select($"node", $"rank")
      .orderBy($"node")
  }

  private val pprSql =
    s"""WITH RECURSIVE
       |pairs AS (
       |  SELECT DISTINCT o_custkey AS a, l_suppkey + $SupplierOffset AS b
       |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
       |edges AS (
       |  SELECT a AS src, b AS dst FROM pairs
       |  UNION ALL SELECT b, a FROM pairs),
       |deg AS (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src),
       |nodes AS (
       |  SELECT DISTINCT src AS node,
       |    CASE WHEN src <= $BfsSeedMaxKey THEN 1 ELSE 0 END AS s
       |  FROM edges),
       |pr(iter, node, rank) AS (
       |  SELECT 0, node, CAST(s * $RankUnit AS BIGINT) FROM nodes
       |  UNION ALL
       |  SELECT c.iter + 1, c.node,
       |    CAST(n.s * ${RankUnit * 15 / 100} + (85 * c.m) // 100 AS BIGINT)
       |  FROM (
       |    SELECT pr.iter AS iter, e.dst AS node,
       |      SUM(pr.rank // d.outdeg) AS m
       |    FROM pr
       |    JOIN edges e ON pr.node = e.src
       |    JOIN deg d ON e.src = d.src
       |    WHERE pr.iter < $PprIters
       |    GROUP BY pr.iter, e.dst) c
       |  JOIN nodes n ON n.node = c.node)
       |SELECT node, rank FROM pr WHERE iter = $PprIters AND rank > 0
       |ORDER BY node""".stripMargin

  val all: Seq[NamedQuery] = Seq(
    NamedQuery("q_ppr", pprQuery, Some(pprSql), bench = true),
    NamedQuery("q_random_walk", randomWalkQuery, Some(randomWalkSql),
      bench = true),
    NamedQuery("q_skipgram_pairs", skipgramPairs, Some(skipgramPairsSql),
      bench = true),
    NamedQuery("q_resource_alloc", resourceAlloc, Some(resourceAllocSql),
      bench = true),
    NamedQuery("q_conductance", conductance, Some(conductanceSql),
      bench = true),
    NamedQuery("q_modularity", modularity, Some(modularitySql), bench = true),
    NamedQuery("q_bfs_depth", bfsQuery, Some(bfsSql), bench = true),
    NamedQuery("q_degree_dist", degreeDist, Some(degreeDistSql), bench = true),
    NamedQuery("q_hits", hitsQuery, Some(hitsSql), bench = true),
    NamedQuery("q_kcore", kcoreQuery, Some(kcoreSql), bench = true),
    NamedQuery("q_kcore_converged", kcoreConvergedQuery,
      Some(kcoreConvergedSql), bench = true),
    NamedQuery("q_assortativity", assortativity, Some(assortativitySql),
      bench = true),
    NamedQuery("q_pagerank", pageRankQuery, Some(pageRankSql), bench = true),
    NamedQuery("q_label_prop", labelPropQuery, Some(labelPropSql), bench = true),
    NamedQuery("q_triangle_count", triangleCount, Some(triangleCountSql),
      bench = true),
    NamedQuery("q_link_predict", linkPredict, Some(linkPredictSql),
      bench = true))
}
