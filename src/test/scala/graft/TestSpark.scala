package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole test run (suites run in a single
  * forked JVM; creating/stopping a session per suite is slow and flaky). */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = Sessions.builder("local[4]", 4).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  def fixture(name: String): String =
    getClass.getResource(s"/fixtures/$name").getPath
}
