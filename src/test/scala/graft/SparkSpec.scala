package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all specs (one JVM-wide session — Spark
  * session startup dominates test wall-clock otherwise). Config mirrors
  * graft.Verify so specs exercise the same semantics the driver checks. */
object SparkSpec {
  lazy val spark: SparkSession = {
    val s = GraftSession.create("graft-test", cpus = 4,
      shufflePartitions = Some(4))
    s.sparkContext.setLogLevel("ERROR")
    s
  }
  val sfSmoke = "/root/testdata/sf0.001"
}

/** Base for operator specs: shared session + tiny helpers. */
abstract class GraftSuite extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.spark
  def sf: String = SparkSpec.sfSmoke

  /** Rows as sorted seq of string-rendered tuples, for order-insensitive
    * frame comparison in tests. */
  def canon(df: DataFrame): Seq[String] = {
    val cols = df.columns.sorted
    df.select(cols.head, cols.tail: _*)
      .collect()
      .map(_.toSeq.map(v => if (v == null) "·" else v.toString).mkString("|"))
      .sorted
      .toSeq
  }

  /** Recursive delete for spec temp dirs (one copy, not one per spec). */
  def rmTree(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rmTree))
    f.delete()
  }

  def assertSameRows(a: DataFrame, b: DataFrame): Unit = {
    val (ca, cb) = (canon(a), canon(b))
    assert(ca.size == cb.size, s"row counts differ: ${ca.size} vs ${cb.size}")
    ca.zip(cb).zipWithIndex.foreach { case ((x, y), i) =>
      assert(x == y, s"row $i differs:\n  a=$x\n  b=$y")
    }
  }
}
