package graft

/** Ad-hoc: per-recorded-plan documents-scan counts for one query. */
object ScanDebug {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val name = args.lift(1).getOrElse("q299_corpus_build")
    val spark = Sessions.builder("local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    ScanAudit.drain()
    ScanAudit.enabled = true
    val df = SparkEntry.queries(name)(spark, dir)
    val recorded = ScanAudit.drain()
    ScanAudit.enabled = false
    val all = recorded.map { case (p, am) => (p, am, "recorded") } :+
      ((df.queryExecution.executedPlan, false, "final"))
    for (((p, am, kind), i) <- all.zipWithIndex) {
      val n = ScanCount.corpusScans(Seq(p)).getOrElse("documents", 0)
      println(s"PLAN $i kind=$kind amortized=$am documents=$n " +
        p.nodeName)
      if (n > 1) {
        java.nio.file.Files.write(
          java.nio.file.Paths.get(s"/tmp/plan$i.txt"),
          p.toString.getBytes("UTF-8"))
        println(s"  full tree -> /tmp/plan$i.txt")
      }
    }
    spark.stop()
  }
}
