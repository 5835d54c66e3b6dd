package graft

import java.nio.file.{Files, Paths}

/** Headline benchmark: runs `SparkEntry.benchQueries` (the curated scale
  * paths — NOT the small-n brute-force oracles) against
  * `SPARK_GRAFT_SF_DIR`, and emits ONE JSON metric line.
  *
  * The line is printed to stdout AND written to `SPARK_GRAFT_BENCH_OUT`
  * (default `BENCH.json` in the cwd) so the driver's parser never has to
  * fish it out of sbt log noise. Failures are reported explicitly in a
  * `"failures"` map — a failed query contributes 0 to the timing total
  * instead of a bogus negative number.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH.json")
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "2").toInt
    val spark = GraftSession.create("graft-bench")
    spark.sparkContext.setLogLevel("WARN")

    // Untimed warmup: the FIRST Spark job of a session pays executor +
    // whole-stage-codegen + JIT init (~4s even for a 5-row count). That is
    // session overhead, not query cost — burn it before the timed loop so
    // q1 isn't charged for it.
    Tables.region(spark, sfDir).count()
    Tables.lineitem(spark, sfDir).count()

    // best-of-N per query (N=2 default, declared in the JSON): single-run
    // local timings swing ±40% under machine noise; min is the standard
    // stable estimator for a deterministic workload
    var times = Vector.empty[(String, Double)]
    var failures = Vector.empty[(String, String)]
    SparkEntry.benchQueries.foreach { nq =>
      var best = Double.MaxValue
      var err: Option[String] = None
      var r = 0
      while (r < runs && err.isEmpty) {
        val t0 = System.nanoTime()
        try {
          nq.fn(spark, sfDir).count()
          best = math.min(best, (System.nanoTime() - t0) / 1e9)
        } catch {
          case e: Throwable =>
            err = Some(Option(e.getMessage).getOrElse(e.getClass.getName).take(200))
        }
        r += 1
      }
      err match {
        case Some(m) => failures :+= (nq.name -> m)
        case None => times :+= (nq.name -> best)
      }
    }

    def jstr(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val qs = times.map { case (k, v) => s"${jstr(k)}:$v" }.mkString("{", ",", "}")
    val fs = failures.map { case (k, v) => s"${jstr(k)}:${jstr(v)}" }.mkString("{", ",", "}")
    val total = times.map(_._2).sum
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failures":$fs,"n_failed":${failures.size},"runs":$runs,"agg":"min","sf":${jstr(sfDir)}}"""
    Files.writeString(Paths.get(outPath), line + "\n")
    // The one stdout line the driver parses; everything else is WARN-level.
    println(line)
    spark.stop()
    if (failures.nonEmpty) sys.exit(1)
  }
}
