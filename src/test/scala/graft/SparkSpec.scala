package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites (one JVM-wide session; suites run in
  * the forked test JVM). */
object SparkSpec {
  lazy val spark: SparkSession = {
    val s = Sessions.builder("local[4]", "4").appName("graft-test").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    Sessions.ensureFunctions(s)
    s
  }
}

abstract class SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSpec.spark
  val sfDir = "/root/testdata/sf0.001"
}
