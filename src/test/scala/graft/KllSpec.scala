package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{KllBuf, KllQuantiles}

/** KLL sketch contracts (VERDICT r9 item 4):
  *  - weight conservation: total sketch weight is EXACTLY n after any
  *    insert/compact/merge sequence;
  *  - exactness under capacity: no compaction ever fires, estimates are
  *    the true discrete quantiles;
  *  - merge associativity: different merge trees give different sketches
  *    (legal) but every tree honors the rank-error bound — asserted at
  *    1, 7 and 32 partitions through a real Spark aggregation, and
  *    directly on the Aggregator for two bracketings of a 3-way merge;
  *  - determinism: md5 compaction coins make the same partitioning
  *    reproduce the identical sketch (the q254 hash-gate precondition).
  */
class KllSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val qs = Array(0.01, 0.25, 0.5, 0.75, 0.99)

  private def weight(b: KllBuf): Long =
    (0 until b.levels.length).map(l => b.lens(l) * (1L << l)).sum

  /** md5-shuffled 1..n (deterministic, engine-independent). */
  private def shuffled(n: Int): Seq[Double] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (1 to n).sortBy { i =>
      new String(md.digest(s"perm:$i".getBytes("UTF-8")).map(b =>
        (('a' + (b & 15)).toChar)))
    }.map(_.toDouble)
  }

  /** True normalized rank error of estimate `v` for quantile `q` over
    * the multiset 1..n: |rank(v) − ceil(q·n)| / n. */
  private def rankErr(v: Double, q: Double, n: Int): Double = {
    val rank = math.min(n, math.max(0, math.floor(v))).toLong
    math.abs(rank - math.ceil(q * n).toLong).toDouble / n
  }

  test("exact under capacity, weight conserved over the full ladder") {
    val agg = new KllQuantiles(256, qs)
    var b = agg.zero
    for (x <- shuffled(200)) b = agg.reduce(b, x)
    assert(weight(b) == 200L)
    val est = agg.finish(b).est
    // n=200 < k=256: nothing ever compacts, estimates are exact
    for ((q, e) <- qs.zip(est))
      assert(e == math.max(1, math.ceil(q * 200).toInt).toDouble,
        s"q=$q est=$e")
    // push far past capacity: weight stays exactly n
    for (x <- shuffled(20000)) b = agg.reduce(b, x)
    assert(weight(b) == 20200L)
  }

  test("merge bracketing: (a+b)+c and a+(b+c) both honor the bound") {
    val agg = new KllQuantiles(256, qs)
    val n = 30000
    val chunks = shuffled(n).grouped(10000).toSeq
    val parts = chunks.map(ch => ch.foldLeft(agg.zero)(agg.reduce))
    val left = agg.merge(agg.merge(parts(0), parts(1)), parts(2))
    val right = agg.merge(parts(0), agg.merge(parts(1), parts(2)))
    for (b <- Seq(left, right)) {
      assert(weight(b) == n.toLong)
      val est = agg.finish(b).est
      for ((q, e) <- qs.zip(est))
        assert(rankErr(e, q, n) <= 0.02, s"q=$q est=$e tree-dependent drift")
    }
  }

  test("rank error ≤ 2% at 1, 7 and 32 partitions; same partitioning is bit-identical") {
    val n = 50000
    val kll = udaf(new KllQuantiles(256, qs))
    import spark.implicits._
    val base = shuffled(n).toDF("v")
    for (p <- Seq(1, 7, 32)) {
      val df = base.repartition(p)
      def run() = df.agg(kll(col("v")).as("sk"))
        .select(col("sk.est")).head().getSeq[Double](0)
      val est = run()
      for ((q, e) <- qs.zip(est))
        assert(rankErr(e, q, n) <= 0.02, s"p=$p q=$q est=$e")
      assert(run() == est, s"p=$p: same partitioning, different sketch")
    }
  }

  test("q254's gate boolean is TRUE for every percentile at sf0.001") {
    val rows = SparkEntry.queries("q254_kll_quantiles")(
      spark, "/root/testdata/sf0.001").collect()
    assert(rows.length == 7)
    assert(rows.forall(_.getAs[Boolean]("within_bound")),
      rows.mkString("\n"))
    // and the exact witness is a real quantile: thr ≤ n
    assert(rows.forall(r => r.getAs[Long]("thr") <= r.getAs[Long]("n")))
  }

  test("grouped partials merge associatively: per-group bound at any split") {
    // the q256 shape: every group's sketch is assembled from partials
    // whose merge tree depends on the physical partitioning — the bound
    // must hold per group for EVERY tree, and the same partitioning must
    // reproduce identical sketches (hash-gate precondition, grouped)
    val kll = udaf(new KllQuantiles(256, qs))
    import spark.implicits._
    val n = 12000
    // group by VALUE residue: group g's multiset is the fixed arithmetic
    // progression {g+1, g+4, g+7, …}, row order a deterministic md5
    // shuffle — so the true per-group ranks are computable in closed form
    val base = shuffled(n)
      .map(v => (s"g${(v.toLong - 1) % 3}", v)).toDF("g", "v")
    for (p <- Seq(1, 5, 17)) {
      val df = base.repartition(p)
      def run() = df.groupBy(col("g")).agg(kll(col("v")).as("sk"))
        .select(col("g"), col("sk.est")).collect()
        .map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
      val ests = run()
      assert(ests.size == 3)
      for ((g, est) <- ests; (q, e) <- qs.zip(est)) {
        // rank within the group's own 4000-value multiset {1,4,7,…} —
        // values are g-offset residues of 1..n, so rank(v) = #{x≤v}
        val members = (1 to n).filter(i => s"g${(i - 1) % 3}" == g)
        val rank = members.count(_ <= e)
        val thr = math.ceil(q * members.length).toLong
        assert(math.abs(rank - thr).toDouble / members.length <= 0.02,
          s"group $g p=$p q=$q est=$e")
      }
      assert(run() == ests, s"p=$p: same partitioning, different sketches")
    }
  }
}
