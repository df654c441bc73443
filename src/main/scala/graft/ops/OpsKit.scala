package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** A named query with an optional DuckDB oracle (ANSI SQL over the same
  * parquet tables). Queries without an oracle get a weaker rows-only check
  * from the driver.
  */
final case class NamedQuery(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

/** Shared helpers for the operator query surface.
  *
  * Design notes (scale):
  *  - Aggregates over doubles are computed in exact decimal arithmetic
  *    (`dsum`) so results are identical regardless of partition count or
  *    partial-aggregation order — a requirement for bit-exact results on a
  *    1000-executor cluster, and the reason the DuckDB oracle hash-matches.
  *  - Readers select no columns here: Catalyst prunes columns and pushes
  *    filters down to the parquet scan from the query shape itself.
  */
object OpsKit {
  /** Output format for timestamps: compare as strings, never raw
    * timestamps, so parquet physical encodings can't cause mismatches. */
  val TsFmt = "yyyy-MM-dd HH:mm:ss"
  /** DuckDB strftime equivalent of [[TsFmt]]. */
  val TsFmtDuck = "%Y-%m-%d %H:%M:%S"

  def tbl(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** `events.parquet`'s `ts` physical type has varied across driver data
    * generations: TIMESTAMP(NANOS) (read as raw long via
    * `spark.sql.legacy.parquet.nanosAsLong=true`, floor-converted ns→µs
    * with integral `div` to match DuckDB's truncation) and plain
    * TIMESTAMP(MICROS) (isAdjustedToUTC either way — surfaced as TIMESTAMP
    * or TIMESTAMP_NTZ). Normalize all of them to session-zoned TIMESTAMP
    * here so every downstream query sees ONE type. The NTZ→TIMESTAMP cast
    * is wall-clock-identity because every entrypoint pins
    * `spark.sql.session.timeZone=UTC` ([[graft.Sessions.builder]]).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = tbl(spark, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
    }
  }

  /** Materialize an iteration's working set AND sever its planner
    * lineage. `localCheckpoint()` alone truncates the logical plan and
    * the RDD DAG, but Spark 4's `LogicalRDD` still carries the ORIGIN
    * plan for stats/constraint estimation — so in an iterative loop,
    * round r's stats walk recurses through every earlier round's plan
    * (×branching per round: measured on a 64-node path k-core peel,
    * per-round optimize time doubled from round ~15 and passed 10 s by
    * round 22 while the optimized plan stayed 701 chars; rebuilding the
    * DataFrame from the checkpointed RDD keeps every round at ~0.3 s
    * flat). The Row round-trip this adds costs one encode per row per
    * round — linear, paid once per iteration, and the price of keeping
    * planning O(1) per round instead of O(branching^rounds). */
  def pinned(df: DataFrame): DataFrame = {
    // the checkpoint executes NOW, during query construction — hand the
    // plan to the scan-count gate first (no-op unless ScanCount enabled)
    graft.ScanAudit.record(df)
    val ck = df.localCheckpoint()
    ck.sparkSession.createDataFrame(ck.rdd, ck.schema)
  }

  /** Bare localCheckpoint with the scan-count recorder attached — for the
    * few sites that keep the LogicalRDD's origin stats on purpose (one
    * round, no iterative-replanning hazard, see [[pinned]]'s scaladoc). */
  def ckpt(df: DataFrame): DataFrame = {
    graft.ScanAudit.record(df)
    df.localCheckpoint()
  }

  /** Record a construction-time `collect()`'s plan for the scan-count
    * gate WITHOUT materializing anything (record is a no-op outside the
    * gate). For bounded-state collects whose subtree would otherwise
    * execute corpus scans the gate cannot see — pinning purely for
    * visibility costs a checkpoint job (~0.6 s measured on q271). */
  def audited(df: DataFrame): DataFrame = {
    graft.ScanAudit.record(df)
    df
  }

  /** Label every job an eager block runs (guide: setJobDescription makes
    * the UI/bench job stream readable); restores the previous label so
    * nested blocks compose. Pure bookkeeping — no plan or result change. */
  def labeled[T](spark: SparkSession, desc: String)(f: => T): T = {
    val sc = spark.sparkContext
    val prev = sc.getLocalProperty("spark.job.description")
    sc.setJobDescription(desc)
    try f finally sc.setJobDescription(prev)
  }

  /** Order-insensitive exact sum of a double expression: cast each value to
    * DECIMAL(28,6) (ties at the 6th decimal are unrepresentable in binary
    * doubles, so Spark and DuckDB round identically), sum exactly, return
    * as double. */
  def dsum(c: Column): Column =
    sum(c.cast(DecimalType(28, 6))).cast(DoubleType)

  /** Oracle-side rendering of [[dsum]]. */
  def dsumSql(e: String): String =
    s"CAST(SUM(CAST(($e) AS DECIMAL(28,6))) AS DOUBLE)"

  /** WindowSpec base for windows over BOUNDED tables (K-row aggregates,
    * bucket-offset tables, driver-sized panels): single partition BY
    * DESIGN, expressed as partitionBy(constant) rather than an empty
    * partition spec so WindowExec's "No Partition Defined" warning stays
    * a real signal (r14 ADVICE/verdict #8) — any surviving warning in CI
    * now indicates an UNINTENDED unpartitioned window over data that
    * scales with the corpus. Semantics are identical: every row lands in
    * the one non-empty hash partition, and the full orderBy (callers
    * always pass a total order) fixes ranks exactly as before. */
  def boundedWin: org.apache.spark.sql.expressions.WindowSpec =
    org.apache.spark.sql.expressions.Window.partitionBy(lit(0))

  /** Eval-panel membership for recall/quality-audit queries: 1-in-100 ids,
    * capped at a FIXED 6400 so the panel — and every `broadcast()` built
    * from it — is O(1) in the corpus (≤64 panel members at any scale). An
    * uncapped `id % 100 == 0` panel is 1% of the table: at 100 TB that is
    * an unbounded broadcast side and a per-query fan-out that grows with
    * the corpus (r14 verdict #2; q154 pioneered the cap). Every panel id
    * at every test SF sits below 6400 (embeddings max vec_id 1999,
    * documents max doc_id 4999), so results are unchanged at test scale.
    * Oracle-side rendering: `id % 100 = 0 AND id < 6400`. */
  val PanelCap = 6400L
  def isPanel(id: Column): Column = id % 100 === 0 && id < lit(PanelCap)

  /** Exact average: exact decimal sum divided by count, in double. */
  def davg(c: Column): Column = dsum(c) / count(c)

  def davgSql(e: String): String = s"${dsumSql(e)} / COUNT($e)"

  /** JVM-exit temp cleanup: ONE static shutdown hook over a concurrent
    * queue of paths (r15 ADVICE: q299 registered a fresh hook per
    * invocation, so a bench battery — 2 timed passes + repasses +
    * floor-gate rounds — accumulated a hook and a retained path per run,
    * and addShutdownHook throws IllegalStateException when called during
    * shutdown). Registration during shutdown degrades to a no-op: at
    * that point the JVM is exiting anyway and /tmp reaping is moot. */
  private val reapPaths =
    new java.util.concurrent.ConcurrentLinkedQueue[java.io.File]()
  @volatile private var reaperInstalled = false
  def reapOnExit(path: java.nio.file.Path): Unit = {
    reapPaths.add(path.toFile)
    if (!reaperInstalled) synchronized {
      if (!reaperInstalled) {
        try {
          Runtime.getRuntime.addShutdownHook(new Thread(() => {
            def del(f: java.io.File): Unit = {
              val cs = f.listFiles()
              if (cs != null) cs.foreach(del)
              f.delete(); ()
            }
            reapPaths.forEach(f => del(f))
          }))
          reaperInstalled = true
        } catch { case _: IllegalStateException => () }
      }
    }
  }

  /** Phase buckets per source for [[adaptivePackCumsum]]'s de-skewed
    * shape (and CorpusBuild stage 4's, which aliases it): a dominant
    * source's window work spreads over up to this many partitioned tasks
    * instead of serializing into one. */
  val PackPhaseBuckets = 32

  /** Rows-per-source threshold above which [[adaptivePackCumsum]] switches
    * from one plain window per source to the phased (source, bucket)
    * shape: below it one window task per source is cheap and the phased
    * chain's extra exchanges are pure overhead; above it a dominant
    * source would serialize into one task. 2^20 rows ≈ tens of MB of slim
    * working set per task — comfortably one-task-sized. */
  val PackPhaseMinRows: Long = 1L << 20

  /** Per-source running token cumsum in doc_id order — the sequence-
    * packing primitive (q54/q302 and CorpusBuild stage 4 share the
    * arithmetic). Input must carry exactly the slim working-set columns
    * (source, doc_id, n_toks); output is the input plus `cum`, the
    * inclusive per-source prefix sum of n_toks ordered by doc_id.
    *
    * HOW the cumsum runs is adaptive (the r15 CorpusBuild discipline,
    * back-ported to the standalone packing queries per the r15 verdict):
    * the slim set is pinned once (one corpus scan, registered with the
    * scan gate) and the measured per-source row counts — K driver
    * scalars — pick the physical shape, the AQE idea with exact numbers
    * instead of estimates:
    *  - every source at or under `threshold` rows → one plain window per
    *    source (one task per source beats the phased chain's fixed
    *    exchange latency at small scale);
    *  - any source above it → the q109 phased (TeraSort) shape for ALL
    *    sources: cumsum WITHIN (source, bucket) — bounded partitioned
    *    windows over ranges of the ordering key — plus broadcast
    *    per-source bucket-prefix offsets over the K×B-row bucket table,
    *    so a 90%-one-source corpus packs across [[PackPhaseBuckets]]
    *    tasks per source instead of one.
    * The shapes are value-IDENTICAL (CorpusBuildSpec pins equality):
    * buckets are monotone non-decreasing in doc_id (a range partition of
    * the ordering key), local sums plus the prefix offset telescope to
    * the global cumsum, and integer addition is order-free.
    */
  def adaptivePackCumsum(slim: DataFrame,
      threshold: Long = PackPhaseMinRows): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val s = pinned(slim)
    val maxCnt = s.groupBy(col("source")).agg(count(lit(1)).as("n"))
      .collect().foldLeft(0L)((m, r) => math.max(m, r.getAs[Long]("n")))
    if (maxCnt <= threshold) {
      val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      s.withColumn("cum", sum(col("n_toks")).over(w))
    } else {
      val b = PackPhaseBuckets
      // double-space bucketing (long arithmetic (id−lo)·B can overflow
      // for 60-bit ids); IEEE multiply/divide by positive constants is
      // monotone, which is all a range-bucket assignment needs
      val bounds = broadcast(s.groupBy(col("source").as("bsrc"))
        .agg(min(col("doc_id")).as("dlo"), max(col("doc_id")).as("dhi")))
      val sb = s.join(bounds, col("source") === col("bsrc"))
        .withColumn("pb", least(lit(b - 1),
          floor((col("doc_id") - col("dlo")).cast("double") * b /
            (col("dhi") - col("dlo") + 1).cast("double"))).cast("int"))
        .drop("bsrc", "dlo", "dhi")
      val wLocal = Window.partitionBy(col("source"), col("pb"))
        .orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wOff = Window.partitionBy(col("source")).orderBy(col("pb"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val off = sb.groupBy(col("source"), col("pb"))
        .agg(sum(col("n_toks")).as("tb"))
        .select(col("source").as("psrc"), col("pb").as("ppb"),
          coalesce(sum(col("tb")).over(wOff), lit(0L)).as("poff"))
      sb.withColumn("lcum", sum(col("n_toks")).over(wLocal))
        .join(broadcast(off),
          col("source") === col("psrc") && col("pb") === col("ppb"))
        .withColumn("cum", col("poff") + col("lcum"))
        .drop("psrc", "ppb", "poff", "lcum", "pb")
    }
  }

  /** Globally-dense 1-based rank over a UNIQUE integral key, built without
    * ever sorting the input through one partition — the q148/q224 phased
    * (TeraSort) shape, packaged: range-bucket the key into ≤ `buckets`
    * contiguous ranges via the broadcast [min,max], rank WITHIN each
    * bucket (a partitioned window), and add back broadcast per-bucket
    * prefix offsets. The only unpartitioned window runs over the ≤
    * `buckets`-row offset table — bounded by construction, independent of
    * input size. Equals `row_number() OVER (ORDER BY key)` exactly when
    * the key is unique (ties would make that order nondeterministic
    * anyway; callers must pass a key they'd accept as a total order).
    *
    * vs [[graft.etl.EtlKit.withDenseId]]: the mint there is a guarded
    * single-partition pass for post-aggregation DIMENSION values; this is
    * the shape for anything that scales with SF. Keys are bucketed in
    * long arithmetic — (key−lo)·buckets must fit a long (safe for ids up
    * to ~9e15 at the default 1024 buckets). */
  def phasedRank(df: DataFrame, key: Column, out: String,
      buckets: Int = 1024): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bounds = df.agg(min(key).as("__lo"), max(key).as("__hi"))
    val keyed = df.crossJoin(broadcast(bounds)).withColumn("__b",
      least(lit(buckets - 1), floor((key.cast("long") - col("__lo")) * buckets /
        (col("__hi") - col("__lo") + 1))).cast("int"))
    val run = keyed.withColumn("__r",
      row_number().over(Window.partitionBy(col("__b")).orderBy(key)).cast("long"))
    val wOff = boundedWin.orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val off = keyed.groupBy(col("__b")).agg(count(lit(1)).as("__tb"))
      .select(col("__b"), coalesce(sum(col("__tb")).over(wOff), lit(0L)).as("__o"))
    run.join(broadcast(off), "__b")
      .withColumn(out, col("__o") + col("__r"))
      .drop("__b", "__r", "__o", "__lo", "__hi", "__tb")
  }
}
