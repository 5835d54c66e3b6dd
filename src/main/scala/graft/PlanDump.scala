package graft

/** Batch plan-audit tool: write the formatted physical plan of several
  * named queries to files in ONE session (Explain's per-query JVM
  * startup dominates when dumping a dozen heads for an optimization
  * round's evidence trail).
  *
  *   sbt "runMain graft.PlanDump <outDir> <suffix> <q1,q2,...> [sfDir]"
  *
  * Writes <outDir>/<query>_<suffix>.txt per query. Session config
  * mirrors Explain (AQE off for stable, readable static plans).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3,
      "usage: graft.PlanDump <outDir> <suffix> <q1,q2,...> [sfDir]")
    val outDir = java.nio.file.Paths.get(args(0))
    val suffix = args(1)
    val names = args(2).split(",").map(_.trim).filter(_.nonEmpty)
    val dir = if (args.length > 3) args(3) else "/root/testdata/sf0.01"
    java.nio.file.Files.createDirectories(outDir)
    val spark = GraftSession.create("graft-plandump", adaptive = false)
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      val q = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query '$name'"))
      val plan = q(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.writeString(
        outDir.resolve(s"${name}_$suffix.txt"), plan)
      println(s"[plandump] wrote $name ($suffix): ${plan.length} chars")
    }
    spark.stop()
  }
}
