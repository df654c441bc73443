package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q246–q249: gains-table bookkeeping, a full scalar re-draw of the
  * negative sampler, and scalar re-derivations of the trend and
  * sign-flip tests (both including the md5 draws).
  */
class InferenceOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def approx(a: Double, b: Double, tol: Double = 1e-9): Boolean =
    math.abs(a - b) <= tol * math.max(1.0, math.max(math.abs(a),
      math.abs(b)))

  private def strHash(s2: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s2.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  test("q246 deciles partition users; lift and gains reconcile") {
    val rows = SparkEntry.queries("q246_decile_lift")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
      .sortBy(_._1)
    val nUsers = graft.ops.OpsKit.events(spark, dir)
      .select(col("user_id")).distinct().count()
    assert(rows.map(_._2).sum == nUsers)
    val pt = rows.map(_._3).sum.toDouble
    val base = pt / nUsers
    var cum = 0L
    rows.foreach { case (_, n, p, rate, lift, gain) =>
      assert(approx(rate, p.toDouble / n))
      assert(approx(lift, rate / base))
      cum += p
      assert(approx(gain, cum / pt))
    }
    assert(approx(rows.last._6, 1.0))
  }

  test("q247 negative draws match a scalar md5 re-draw") {
    val got = SparkEntry.queries("q247_negative_sampling")(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
      .toMap
    val pos = graft.ops.OpsKit.tbl(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"))
      .join(graft.ops.OpsKit.tbl(spark, dir, "lineitem")
        .select(col("l_orderkey").as("o_orderkey"), col("l_partkey")),
        "o_orderkey")
      .select(col("o_custkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val parts = graft.ops.OpsKit.tbl(spark, dir, "part")
      .select(col("p_partkey")).collect().map(_.getLong(0)).sorted
    val posSet = pos.toSet
    val byC = pos.groupBy(_._1)
    for ((c, (nPos, nDrawn, nKept, nAcc)) <- got) {
      val mine = byC(c)
      assert(nPos == mine.length && nDrawn == 3L * mine.length)
      var kept = 0; var acc = 0
      for ((_, p) <- mine; j <- 0 until 3) {
        val rk = strHash(s"$c:$p:$j") % parts.length
        val cand = parts(rk.toInt) // rank rk+1 → index rk
        if (posSet.contains((c, cand))) acc += 1 else kept += 1
      }
      assert(nKept == kept && nAcc == acc, s"cust $c")
    }
  }

  test("q248 z matches a scalar Cochran-Armitage computation") {
    val rows = SparkEntry.queries("q248_trend_test")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(4)))
    val z = rows.head._4
    val n = rows.map(_._2).sum.toDouble
    val rr = rows.map(_._3).sum.toDouble
    val p = rr / n
    val swr = rows.map(x => x._1.toDouble * x._3).sum
    val swn = rows.map(x => x._1.toDouble * x._2).sum
    val swwn = rows.map(x => x._1.toDouble * x._1 * x._2).sum
    val want = (swr - p * swn) /
      math.sqrt(p * (1.0 - p) * (swwn - swn * swn / n))
    assert(approx(z, want, 1e-9), s"z $z vs $want")
    assert(p > 0.0 && p < 1.0) // the outcome must actually vary
  }

  test("q249 sign-flip test matches an exact scalar permutation run") {
    val r = SparkEntry.queries("q249_signflip_test")(spark, dir)
      .collect().head
    val (n, tObs, nExt, pHat) = (r.getLong(0), r.getLong(1),
      r.getLong(3), r.getDouble(4))
    val ev = graft.ops.OpsKit.events(spark, dir)
      .select(col("user_id"),
        expr("unix_micros(ts) div 3600000000").as("h"),
        when(col("event_type") === "purchase", col("value")).as("sp"))
      .collect()
      .map(x => (x.getLong(0), x.getLong(1),
        if (x.isNullAt(2)) None else Some(x.getDouble(2))))
    val mid = (ev.map(_._2).min + ev.map(_._2).max + 1) / 2
    // mirror the engine's decimal-grid sums: per-user per-half cents
    val diffs = ev.groupBy(_._1).map { case (u, g) =>
      def half(p: (Long, Long, Option[Double]) => Boolean) =
        math.floor(g.filter(e => p(e._1, e._2, e._3))
          .flatMap(_._3).map(v => BigDecimal(v)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP)).sum
          .toDouble * 1000.0).toLong
      u -> (half((_, h, _) => h >= mid) - half((_, h, _) => h < mid))
    }.toMap
    assert(n == diffs.size)
    assert(tObs == diffs.values.sum)
    val ext = (0 until 64).count { m =>
      val tm = diffs.map { case (u, dm) =>
        if (strHash(s"flip:$m:$u") % 2 == 0) dm else -dm }.sum
      math.abs(tm) >= math.abs(tObs)
    }
    assert(nExt == ext)
    assert(approx(pHat, (ext + 1.0) / 65.0))
  }
}
