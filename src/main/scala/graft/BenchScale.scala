package graft

import java.nio.file.{Files, Paths, StandardOpenOption}

/** Scaling-evidence leg (optimization guide §2.2): time the heavy BATCH
  * heads on the SYNTHETIC 10× fixture (ScaleSynth replicas of sf0.1 —
  * "10× the data, same distribution") at the core count in
  * `SPARK_GRAFT_CPUS`, and append one `"metric":"scaling"` line to
  * BENCH_HISTORY.jsonl. Run it twice — 32 and 8 cores — and the
  * per-head wall ratios show whether a head actually parallelizes once
  * its data outgrows the per-job fixed overhead that dominates sf0.1
  * (where the round-12 driver measured every 8c/32c ratio ≈ 1 and
  * could not evidence scale-safety at all).
  *
  *   SPARK_GRAFT_CPUS=32 sbt "runMain graft.BenchScale"
  *   SPARK_GRAFT_CPUS=8  sbt "runMain graft.BenchScale"
  *
  * The scaling line is invisible to the regression gate
  * (BenchRegression.historyFor filters on `"metric":"total"`), and the
  * fixture is INPUT staging (deterministic id-shifted replicas built
  * once, reused across the two legs via the `_synth_ok` marker), not a
  * cached query result — every timed head computes from the staged
  * parquet inside the timed region.
  */
object BenchScale {
  /** The heavy batch heads the round-12 verdict asked to evidence —
    * iterative graph, walk mining, window time-series, text dedup. */
  val DefaultHeads = Seq(
    "q_pagerank", "q_label_prop", "q_ppr", "q_kcore", "q_triangle_count",
    "q_bfs_depth", "q_hits", "q_random_walk", "q_skipgram_pairs",
    "q_interpolate", "q_negative_sampling", "q_dedup_clusters")

  def main(args: Array[String]): Unit = {
    val replicas = sys.env.getOrElse("SPARK_GRAFT_SCALE_REPLICAS", "10").toInt
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "2").toInt
    val histPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_HISTORY",
      "BENCH_HISTORY.jsonl")
    val heads = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(DefaultHeads)
    val spark = GraftSession.create("graft-bench-scale")
    spark.sparkContext.setLogLevel("WARN")
    val dir = ScaleSynth.dir(spark, replicas, reuse = true)
    System.err.println(s"[bench-scale] fixture: $dir (${replicas}x sf0.1), " +
      s"cpus=${GraftSession.envCpus}")
    // same warmup + timed-region contract as Bench
    Tables.region(spark, dir).count()
    Tables.lineitem(spark, dir).count()
    val selected = SparkEntry.benchQueries.filter(q => heads.contains(q.name))
    val sc = spark.sparkContext
    val samples = scala.collection.mutable.Map.empty[String, Vector[Double]]
      .withDefaultValue(Vector.empty)
    for (pass <- 1 to runs; nq <- selected) {
      val persistedBefore = sc.getPersistentRDDs.keySet
      val t0 = System.nanoTime()
      try {
        nq.fn(spark, dir).queryExecution.toRdd.count()
        val w = (System.nanoTime() - t0) / 1e9
        samples(nq.name) :+= w
        System.err.println(f"[bench-scale] pass $pass ${nq.name}: $w%.2f s")
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench-scale] ${nq.name} FAILED: " +
            Option(e.getMessage).getOrElse(e.getClass.getName).take(200))
      }
      sc.getPersistentRDDs.foreach { case (id, rdd) =>
        if (!persistedBefore.contains(id)) rdd.unpersist(blocking = false)
      }
      System.gc()
    }
    def sec(v: Double) = f"$v%.3f"
    val qs = selected.flatMap { nq =>
      val s = samples(nq.name)
      if (s.isEmpty) None else Some(s""""${nq.name}":${sec(s.min)}""")
    }.mkString("{", ",", "}")
    val line =
      s"""{"metric":"scaling","cpus":${GraftSession.envCpus},"replicas":$replicas,"runs":$runs,"agg":"min","queries":$qs,"sf":"synth-${replicas}x-sf0.1"}"""
    Files.writeString(Paths.get(histPath), line + "\n",
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)
    println(line)
    spark.stop()
  }
}
