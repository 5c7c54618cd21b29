package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for test suites (one JVM-wide session — Spark
  * getOrCreate dedups across suites).
  */
trait SparkTestBase extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local(cores = 4, appName = "graft-test")
  lazy val sf0001 = "/root/testdata/sf0.001"

  /** Run `body` with SQL confs set, restoring prior values after (the
    * session is JVM-shared across suites — leaks would cross-talk).
    */
  def withSQLConf[A](pairs: (String, String)*)(body: => A): A = {
    val conf = spark.conf
    val saved = pairs.map { case (k, _) => k -> conf.getOption(k) }
    pairs.foreach { case (k, v) => conf.set(k, v) }
    try body finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
