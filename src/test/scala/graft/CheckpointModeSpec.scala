package graft

/** LineageCut's two modes must be pure plan boundaries: the `reliable`
  * mode (Dataset.checkpoint to a checkpoint dir — the executor-loss /
  * preemption-safe shape a 100 TB cluster needs) and the `local` default
  * (localCheckpoint — executor blocks, zero FS traffic, no recompute
  * path) have to emit bit-identical frames. Proven on the heaviest
  * iterative heads: q_pagerank (pageRank loop + the size-switched join
  * plan) and q_kcore_converged (per-round semi-joins + threshold peel),
  * both of which cut lineage several times per run.
  *
  * Also pins the plumbing: reliable mode actually writes checkpoint
  * files into the scratch dir (so the mode is exercised, not silently
  * falling back to local), and the conf key round-trips. */
class CheckpointModeSpec extends GraftSuite {

  private def withMode[T](mode: String)(body: => T): T = {
    val prev = spark.conf.getOption(LineageCut.ModeKey)
    spark.conf.set(LineageCut.ModeKey, mode)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(LineageCut.ModeKey, v)
      case None => spark.conf.unset(LineageCut.ModeKey)
    }
  }

  for (q <- Seq("q_pagerank", "q_kcore_converged")) {
    test(s"$q: local and reliable checkpoint modes are bit-equal") {
      val local = canon(withMode("local") {
        SparkEntry.queries(q)(spark, sf)
      })
      val reliable = canon(withMode("reliable") {
        SparkEntry.queries(q)(spark, sf)
      })
      assert(local.nonEmpty, s"$q returned no rows")
      assert(local == reliable,
        s"$q diverged between checkpoint modes — the cut is supposed to " +
          "be a plan boundary, not a semantic operator")
    }
  }

  test("reliable mode writes real checkpoint files into the scratch dir") {
    withMode("reliable") {
      // force at least one cut
      SparkEntry.queries("q_pagerank")(spark, sf).count()
    }
    val dir = spark.sparkContext.getCheckpointDir
    assert(dir.isDefined, "reliable mode must set a checkpoint dir")
    val root = new java.io.File(new java.net.URI(dir.get))
    def anyFile(f: java.io.File): Boolean =
      f.isFile || Option(f.listFiles()).exists(_.exists(anyFile))
    assert(root.exists && anyFile(root),
      s"no checkpoint files under $root — reliable mode did not engage")
  }
}
