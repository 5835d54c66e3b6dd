package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit tool: print the formatted physical plan of a named query.
  *
  *   sbt "runMain graft.Explain <query> [sfDir]"
  *
  * Session config mirrors Verify/Bench so the audited plan is the one the
  * driver actually runs. AQE is disabled for a stable, readable plan
  * (runtime re-planning still applies in the real runs).
  */
object Explain {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: graft.Explain <query> [sfDir]")
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    // AQE off for a stable, readable static plan
    val spark = GraftSession.create("graft-explain", adaptive = false)
    spark.sparkContext.setLogLevel("ERROR")
    val q = SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown query '$name'; known: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}"))
    q(spark, dir).explain("formatted")
    spark.stop()
  }
}
