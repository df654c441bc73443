package graft
import org.apache.spark.sql.SparkSession

/** Dev scratchpad: smoke-run SparkEntry.entry the way the driver's t1
  * gate does, and dump a plan when a query name is passed. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.headOption match {
      case Some(name) =>
        val df = SparkEntry.queries(name)(spark, "/root/testdata/sf0.01")
        df.explain("formatted")
      case None =>
        val df = SparkEntry.entry(spark)
        println(s"entry rows=${df.count()}")
        df.show(5, false)
    }
  }
}
