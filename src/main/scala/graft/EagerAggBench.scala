package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev measurement main for [[graft.plans.EagerAggregation]]: the same
  * aggregate-over-join timed with the rule off (stock Catalyst: join
  * first, aggregate the join output) and on (partial aggregate pushed
  * below the join). Two shapes on the driver tables, min-of-2 warm
  * passes:
  *
  *   dup    — lineitem ⋈ part, GROUP BY p_brand, sum/count/min over
  *            fact columns: ~30 lineitem rows per partkey at sf0.1, so
  *            the partial shrinks the join's probe input ~30×. The
  *            rule's win case.
  *   unique — lineitem ⋈ orders on l_orderkey, GROUP BY o_orderpriority:
  *            ~4 rows per orderkey — little duplication, the extra hash
  *            aggregate is nearly pure overhead. The honesty case that
  *            keeps the rule opt-in.
  *
  * `--x10` replicates lineitem 10× first. Args: `<sfDir> [--x10]`.
  */
object EagerAggBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val x10 = args.contains("--x10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = Sessions.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val li0 = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_partkey", "l_orderkey", "l_quantity", "l_extendedprice")
    val li = (if (x10)
      li0.withColumn("rep", explode(sequence(lit(1), lit(10)))).drop("rep")
    else li0).cache()
    val part = spark.read.parquet(s"$sfDir/part.parquet")
      .select("p_partkey", "p_brand").cache()
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
      .select("o_orderkey", "o_orderpriority").cache()
    val nRows = li.count(); part.count(); orders.count()

    def dup(): DataFrame =
      li.join(part, li("l_partkey") === part("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(sum(col("l_quantity")).as("q"), count(lit(1)).as("n"),
          min(col("l_extendedprice")).as("lo"))
    def unique(): DataFrame =
      li.join(orders, li("l_orderkey") === orders("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(sum(col("l_quantity")).as("q"), count(lit(1)).as("n"))
    def davg(): DataFrame = // the decomposed-average path
      li.join(part, li("l_partkey") === part("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(avg(col("l_quantity")).as("a"),
          avg(col("l_extendedprice")).as("p"))

    def timed(f: => Long): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // bcast=true is the local broadcast-join case (no shuffle on the
    // fact side — the rule can only shrink the probe, small win);
    // bcast=false forces the shuffle join every non-broadcastable dim
    // takes at 100 TB — there the partial agg shrinks the SHUFFLE by
    // the duplication factor, which is the rule's actual target
    for (bcast <- Seq(true, false);
         (sn, mk) <- Seq(("dup", () => dup()), ("unique", () => unique()),
           ("davg", () => davg()));
         on <- Seq(false, true)) {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
        if (bcast) "10MB" else "-1")
      spark.conf.set("spark.graft.eageragg", on.toString)
      val df = mk()
      val pushed = df.queryExecution.optimizedPlan.toString
        .contains("_eager_p")
      val rows = df.count() // warm (codegen) + sanity
      val t = math.min(timed(df.count()), timed(df.count()))
      println(s"""{"shape":"$sn","bcast":$bcast,"rule":$on,"pushed":$pushed,""" +
        s""""rows_in":$nRows,"rows_out":$rows,"sec":${math.round(t * 1000) / 1000.0}}""")
    }
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.graft.eageragg", "false")
    spark.stop()
  }
}
