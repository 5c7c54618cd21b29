package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for test suites (one JVM-wide session — Spark
  * getOrCreate dedups across suites).
  */
trait SparkTestBase extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local(cores = 4, appName = "graft-test")
  lazy val sf0001 = "/root/testdata/sf0.001"
}
