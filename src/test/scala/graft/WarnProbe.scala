package graft

/** Ad-hoc: which query constructions execute an unpartitioned WindowExec.
  * Captures log4j2 WARN events from WindowExec per query construction. */
object WarnProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = Sessions.builder("local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val counter = new java.util.concurrent.atomic.AtomicInteger(0)
    val ctx = org.apache.logging.log4j.LogManager.getContext(false)
      .asInstanceOf[org.apache.logging.log4j.core.LoggerContext]
    val appender = new org.apache.logging.log4j.core.appender.AbstractAppender(
        "graft-warnprobe", null, null, true,
        org.apache.logging.log4j.core.config.Property.EMPTY_ARRAY) {
      override def append(e: org.apache.logging.log4j.core.LogEvent): Unit =
        if (e.getMessage.getFormattedMessage.contains("No Partition Defined"))
          counter.incrementAndGet()
    }
    appender.start()
    ctx.getConfiguration.getRootLogger.addAppender(appender,
      org.apache.logging.log4j.Level.WARN, null)
    ctx.updateLoggers()
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      spark.catalog.clearCache()
      val before = counter.get()
      try fn(spark, dir).count()
      catch { case e: Throwable => println(s"ERR  $name ${e.getMessage.take(80)}") }
      val n = counter.get() - before
      if (n > 0) println(s"WARNED $name x$n")
    }
    println(s"total warns: ${counter.get()}")
    spark.stop()
  }
}
