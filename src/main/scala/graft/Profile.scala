package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}

/** Measurement tool (optimization guide §1): run ONE named query and
  * print a per-JOB wall breakdown — where the seconds of a multi-job
  * iterative head actually go (setup materialization vs per-round
  * passes vs the final action). Jobs are attributed by their callSite
  * short form; stage-level shuffle metrics are summed per job so the
  * exchange cost is visible without the UI (spark.ui is off in this
  * sandbox).
  *
  *   sbt "runMain graft.Profile <query> [sfDir] [reps]"
  */
object Profile {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: graft.Profile <query> [sfDir] [reps]")
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 1
    val spark = GraftSession.create("graft-profile")
    spark.sparkContext.setLogLevel("ERROR")
    val q = SparkEntry.queries.getOrElse(name, sys.error(s"unknown query '$name'"))

    final case class JobRec(id: Int, desc: String, var t0: Long = 0L,
      var t1: Long = 0L, var shuffleRead: Long = 0L, var shuffleWrite: Long = 0L,
      var input: Long = 0L, var tasks: Int = 0)
    val jobs = new scala.collection.mutable.LinkedHashMap[Int, JobRec]
    val jobOfStage = new scala.collection.mutable.HashMap[Int, Int]
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = jobs.synchronized {
        val site = Option(e.properties.getProperty("callSite.short")).getOrElse("?")
        jobs(e.jobId) = JobRec(e.jobId, site, t0 = e.time)
        e.stageIds.foreach(s => jobOfStage(s) = e.jobId)
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = jobs.synchronized {
        jobs.get(e.jobId).foreach(_.t1 = e.time)
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        jobs.synchronized {
          for (jid <- jobOfStage.get(e.stageInfo.stageId); j <- jobs.get(jid)) {
            val m = e.stageInfo.taskMetrics
            j.shuffleRead += m.shuffleReadMetrics.totalBytesRead
            j.shuffleWrite += m.shuffleWriteMetrics.bytesWritten
            j.input += m.inputMetrics.bytesRead
            j.tasks += e.stageInfo.numTasks
          }
        }
    }
    spark.sparkContext.addSparkListener(listener)

    // warmup: session/codegen/JIT init, same contract as Bench
    Tables.region(spark, dir).count()
    Tables.lineitem(spark, dir).count()
    Thread.sleep(200)
    jobs.synchronized(jobs.clear())

    for (r <- 1 to reps) {
      val t0 = System.nanoTime()
      val df = q(spark, dir)
      df.queryExecution.toRdd.count()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // let listener events drain
      jobs.synchronized {
        println(f"%n=== $name rep $r: wall $wall%.3f s, ${jobs.size} jobs ===")
        var acct = 0.0
        jobs.values.foreach { j =>
          val secs = (j.t1 - j.t0) / 1e3
          acct += secs
          println(f"  job ${j.id}%3d ${secs}%7.3f s  tasks=${j.tasks}%4d " +
            f"in=${j.input / 1e6}%8.1fMB sr=${j.shuffleRead / 1e6}%7.1fMB " +
            f"sw=${j.shuffleWrite / 1e6}%7.1fMB  ${j.desc.take(70)}")
        }
        println(f"  sum of job walls: $acct%.3f s (gaps = driver/planning time)")
        jobs.clear()
      }
    }
    spark.stop()
  }
}
