package graft

/** Dev scratchpad: smoke-run SparkEntry.entry the way the driver's t1
  * gate does, and dump a plan when a query name is passed. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.builder("local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.headOption match {
      case Some(name) =>
        val df = SparkEntry.queries(name)(spark, "/root/testdata/sf0.01")
        df.explain("formatted")
        println(s"$name rows=${df.count()}")
      case None =>
        val df = SparkEntry.entry(spark)
        println(s"entry rows=${df.count()}")
        df.show(5, false)
    }
  }
}
