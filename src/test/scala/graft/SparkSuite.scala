package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared session for all suites (one JVM-wide SparkSession; suites run
  * in the forked test JVM, `getOrCreate` dedups).
  */
trait SparkSuite extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSuite.session
  val sf0001 = "/root/testdata/sf0.001"
  val sf001 = "/root/testdata/sf0.01"
}

object SparkSuite {
  lazy val session: SparkSession = {
    val s = graft.core.GraftSession.local(cores = 4, appName = "graft-test")
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}
