package graft

/** Diagnostic main (graft.Explain's sibling): list every registered
  * query whose physical plan carries a BroadcastNestedLoopJoin, with
  * the occurrence count. BNLJ is legitimate exactly twice in this
  * codebase — a single-row broadcast frame (global aggregates crossed
  * back onto a keyed frame) and the calendar²-bounded pair frames of
  * the rank statistics — but a BNLJ whose STREAM side is corpus-scale
  * and whose BUILD side grows with the data is a scale bug (the
  * q_active_users range-join lesson, round 6: rewritten to explode +
  * equi-join). Run after adding non-equi joins; eyeball anything new.
  */
object NljAudit {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.create("graft-nlj-audit", cpus = 4,
      shufflePartitions = Some(4))
    spark.sparkContext.setLogLevel("ERROR")
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    SparkEntry.all.foreach { q =>
      val plan = try q.fn(spark, sf).queryExecution.sparkPlan.toString
                 catch { case e: Throwable => "FAIL " + e.getMessage }
      if (plan.contains("BroadcastNestedLoopJoin")) {
        val n = plan.linesIterator.count(_.contains("BroadcastNestedLoopJoin"))
        println(s"NLJ $n ${q.name}")
      }
    }
    spark.stop()
  }
}
