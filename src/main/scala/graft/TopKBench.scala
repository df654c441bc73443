package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev measurement main for the r10-verdict item: time the per-group
  * top-k idiom THREE ways and let the number decide the
  * `spark.graft.topk.rewrite` default.
  *
  *   plain   — no thinning at all: native InferWindowGroupLimit off
  *             (spark.sql.optimizer.windowGroupLimitThreshold = -1), rule off;
  *             every partition fully sorted by the Window exec.
  *   native  — Spark 4's own WindowGroupLimit thinning (threshold back
  *             at its 1000 default), rule off. This is stock Spark.
  *   graft   — native off, `spark.graft.topk.rewrite=true`: thinning via
  *             the TopKPerGroup partial/final bounded-heap execs.
  *
  * Two shapes on lineitem (the largest driver table), each min-of-2:
  *   k=10   per l_suppkey by l_extendedprice desc — the q12/q22/q72
  *          shape, inside the native rule's k ≤ 1000 coverage.
  *   k=2000 per l_returnflag — OVER the native threshold: stock Spark
  *          does NOT thin this (rank runs on the full partition), so
  *          graft's rule is the only contender; `native` degenerates to
  *          `plain` here by construction.
  * `--x10` replicates lineitem 10× via explode(sequence(1,10)) before
  * timing (the SCALING.md 10× convention without extra testdata).
  *
  * Args: `<sfDir> [--x10]`. Prints one JSON line per (shape, mode).
  */
object TopKBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val x10 = args.contains("--x10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = Sessions.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val base0 = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_suppkey", "l_returnflag", "l_extendedprice", "l_orderkey")
    val base = if (x10)
      base0.withColumn("rep", explode(sequence(lit(1), lit(10)))).drop("rep")
    else base0
    base.cache(); val nRows = base.count() // timings exclude the scan

    def topk(part: String, k: Int): DataFrame = {
      val w = Window.partitionBy(col(part))
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"))
      base.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= k)
    }
    def timed(f: => Long): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val shapes = Seq(("k10_suppkey", "l_suppkey", 10),
                     ("k2000_returnflag", "l_returnflag", 2000))
    val modes = Seq( // (label, native threshold, graft rule)
      ("plain", "-1", "false"),
      ("native", "1000", "false"),
      ("graft", "-1", "true"),
      ("both", "1000", "true")) // the default-on config: stacking cost
    for ((sn, part, k) <- shapes; (mn, thr, rule) <- modes) {
      spark.conf.set("spark.sql.optimizer.windowGroupLimitThreshold", thr)
      spark.conf.set("spark.graft.topk.rewrite", rule)
      val df = topk(part, k)
      val plan = df.queryExecution.executedPlan.toString
      val thinned =
        if (plan.contains("TopKPerGroup")) "graft"
        else if (plan.contains("WindowGroupLimit")) "native"
        else "none"
      val rows = df.count() // warm pass (codegen compile) + row sanity
      val t = math.min(timed(df.count()), timed(df.count()))
      println(s"""{"shape":"$sn","mode":"$mn","thinned":"$thinned",""" +
        s""""rows_in":$nRows,"rows_out":$rows,"sec":${math.round(t * 1000) / 1000.0}}""")
    }
    spark.conf.set("spark.sql.optimizer.windowGroupLimitThreshold", "1000")
    spark.conf.set("spark.graft.topk.rewrite", "false")
    spark.stop()
  }
}
