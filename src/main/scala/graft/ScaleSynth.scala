package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared synthetic-scale fixture builder for the scale-decade specs:
  * N deterministic id-shifted replicas of the sf0.1 fixture (no RNG, no
  * driver regeneration needed). Replica k shifts every join key by
  * k × a per-key stride and substitutes document text through a
  * per-replica AFFINE cipher on the alphabet, so replicas are DISJOINT
  * (referential integrity preserved inside each) while every
  * within-replica pairwise shingle/fingerprint relation of the original
  * corpus is preserved EXACTLY — N isomorphic, non-colliding copies:
  * "N× the data, same data distribution", which is what a linear-growth
  * measurement needs.
  *
  * The cipher is affine (x → a·x + b mod 26, gcd(a, 26) = 1) rather
  * than the round-9 Caesar rotation because rotation has only 26
  * distinct bijections — at 100 replicas, replicas k and k+26 would be
  * EXACT text duplicates with different doc ids, planting 74 spurious
  * near-dup copies of every document and driving the dedup heads'
  * pair count quadratic (a data artifact, not an engine property).
  * Affine gives 12 × 26 = 312 distinct bijections; two distinct affine
  * maps agree on at most 2 letters, so any word with ≥ 3 distinct
  * letters has distinct images across replicas. k = 0 is the identity.
  *
  * Strides are chosen so that even 100 replicas stay inside every
  * downstream id contract: synthetic custkeys stay below
  * `Graph.SupplierOffset` (10⁷) and synthetic doc ids below
  * `Similarity.PlantOffset` (10⁶) — the planted-gate and node-space
  * disjointness contracts hold at sf10. */
object ScaleSynth {
  val Sf01 = "/root/testdata/sf0.1"

  /** Per-replica key strides — above each key's sf0.1 range (customer
    * 15k, supplier 1k, part 20k, docs 5k, events 100k rows). */
  val Strides: Map[String, Long] = Map(
    "l_orderkey" -> 10000000L, "o_orderkey" -> 10000000L,
    "l_partkey" -> 100000L, "p_partkey" -> 100000L,
    "l_suppkey" -> 100000L, "s_suppkey" -> 100000L,
    "o_custkey" -> 100000L, "c_custkey" -> 100000L,
    "doc_id" -> 10000L,
    // events: users and event ids shift per replica; ts stays (replicas
    // share the calendar — per-user groups never straddle replicas,
    // and k× the rows is k× the ticks per calendar cell)
    "event_id" -> 1000000L, "user_id" -> 100000L)

  private val Lower = "abcdefghijklmnopqrstuvwxyz"
  /** The 12 units mod 26, in a fixed order. */
  private val Units = Seq(1, 3, 5, 7, 9, 11, 15, 17, 19, 21, 23, 25)

  /** Affine substitution alphabet for replica k (identity at k = 0). */
  def cipher(k: Int): (String, String) = {
    val a = Units((k / 26) % Units.length)
    val b = k % 26
    val to = (0 until 26).map(x => Lower((a * x + b) % 26)).mkString
    (Lower + Lower.toUpperCase, to + to.toUpperCase)
  }

  /** N disjoint replicas: join keys shifted, text affine-substituted. */
  def replicate(df: DataFrame, replicas: Int): DataFrame =
    (0 until replicas).map { k =>
      val (from, to) = cipher(k)
      df.select(df.columns.map { c =>
        if (Strides.contains(c)) (col(c) + k * Strides(c)).as(c)
        else if (c == "text" && k > 0) translate(col(c), from, to).as(c)
        else col(c)
      }: _*)
    }.reduce(_.unionByName(_))

  private val built = scala.collection.mutable.HashMap.empty[Int, String]

  /** Build (once per JVM per replica count) the synthetic dir under
    * target/ and return its path — shared by the decade-2 and decade-3
    * suites, so the sf1 baseline is built once whichever runs first.
    * Idempotent rebuild per suite run — stale synth from an edited spec
    * must never survive. `reuse = true` (BenchScale's cross-PROCESS
    * mode: the 8-core and 32-core legs must time the same staged bytes,
    * and rebuilding the fixture inside the low-core run would also skew
    * its wall) accepts an existing dir carrying the `_synth_ok` marker
    * this builder writes on completion. */
  def dir(spark: SparkSession, replicas: Int,
      reuse: Boolean = false): String = synchronized {
    built.getOrElseUpdate(replicas, {
      val d = new java.io.File(s"target/scale-synth-${replicas}x")
      val marker = new java.io.File(d, "_synth_ok")
      if (reuse && marker.exists()) d.getPath
      else {
        def rmTree(f: java.io.File): Unit = {
          if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rmTree))
          f.delete()
        }
        rmTree(d)
        for (t <- Seq("documents", "lineitem", "orders", "customer",
            "supplier", "part", "events"))
          replicate(Tables.load(spark, Sf01, t), replicas)
            .write.mode("overwrite").parquet(s"${d.getPath}/$t.parquet")
        // dimension roster tables referenced by nationkey — unshifted
        for (t <- Seq("region", "nation"))
          Tables.load(spark, Sf01, t)
            .write.mode("overwrite").parquet(s"${d.getPath}/$t.parquet")
        java.nio.file.Files.writeString(marker.toPath, "ok\n")
        d.getPath
      }
    })
  }
}
