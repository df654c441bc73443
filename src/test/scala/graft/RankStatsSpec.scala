package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q217–q220 (rank/variance statistics): each test re-derives the
  * statistic with a plain scalar implementation over the collected
  * sf0.001 rows — the oracle hash gate proves Spark==DuckDB; these prove
  * both equal the textbook formula.
  */
class RankStatsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def approx(a: Double, b: Double, tol: Double = 1e-9): Boolean =
    math.abs(a - b) <= tol * math.max(1.0, math.max(math.abs(a),
      math.abs(b)))

  /** average rank (1-based, ties averaged) of every element. */
  private def avgRanks(xs: Seq[Double]): Map[Double, Double] = {
    val sorted = xs.sorted
    sorted.zipWithIndex.groupBy(_._1).map { case (v, grp) =>
      v -> (grp.map(_._2 + 1).sum.toDouble / grp.size)
    }
  }

  test("q217 U, AUC and z match a scalar Mann-Whitney per stream") {
    val got = SparkEntry.queries("q217_mannwhitney")(spark, dir)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))
      .toMap
    val ev = graft.ops.OpsKit.events(spark, dir)
      .select(col("event_type"), col("value"))
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    val ranks = avgRanks(ev.map(_._2).toSeq)
    val n = ev.length.toDouble
    val tie = ev.groupBy(_._2).values
      .map(g => { val c = g.size.toDouble; c * c * c - c }).sum
    for ((t, (n1, u, auc, z)) <- got) {
      val mine = ev.filter(_._1 == t)
      val n1d = mine.length.toDouble
      assert(n1 == mine.length)
      val r1 = mine.map(e => ranks(e._2)).sum
      val uRef = r1 - n1d * (n1d + 1.0) / 2.0
      val n2d = n - n1d
      val sigma2 = n1d * n2d / 12.0 * ((n + 1.0) - tie / (n * (n - 1.0)))
      assert(approx(u, uRef), s"$t U: got $u want $uRef")
      assert(approx(auc, uRef / (n1d * n2d)), s"$t AUC")
      assert(approx(z, (uRef - n1d * n2d / 2.0) / math.sqrt(sigma2), 1e-6),
        s"$t z: got $z")
    }
  }

  test("q218 F matches a scalar ANOVA and SSB+SSW = SST") {
    val rows = SparkEntry.queries("q218_anova_f")(spark, dir).collect()
    val f = rows.head.getDouble(4)
    assert(rows.map(_.getDouble(4)).distinct.length == 1)
    val ev = graft.ops.OpsKit.events(spark, dir)
      .select(col("event_type"), col("value"))
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    val groups = ev.groupBy(_._1).values.map(_.map(_._2)).toSeq
    val grand = ev.map(_._2).sum / ev.length
    val ssb = groups.map { g =>
      val m = g.sum / g.size; g.size * (m - grand) * (m - grand) }.sum
    val ssw = groups.map { g =>
      val m = g.sum / g.size; g.map(y => (y - m) * (y - m)).sum }.sum
    val sst = ev.map(y => (y._2 - grand) * (y._2 - grand)).sum
    assert(approx(ssb + ssw, sst, 1e-6))
    val k = groups.size.toDouble
    val fRef = (ssb / (k - 1.0)) / (ssw / (ev.length - k))
    assert(approx(f, fRef, 1e-6), s"F: got $f want $fRef")
  }

  test("q219 r matches a scalar assortativity over the rebuilt edge list") {
    val rows = SparkEntry.queries("q219_assortativity")(spark, dir)
      .collect()
    val r = rows.head.getDouble(4)
    assert(rows.map(_.getDouble(4)).distinct.length == 1)
    val op = graft.ops.OpsKit.tbl(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .collect().map(x => (x.getLong(0), x.getLong(1)))
    val pairs = op.groupBy(_._1).values.flatMap { basket =>
      val ps = basket.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length)
        yield (ps(i), ps(j))
    }.toSeq
    val strong = pairs.groupBy(identity).filter(_._2.size >= 2).keys.toSeq
    val edges = strong ++ strong.map { case (a, b) => (b, a) }
    val deg = edges.groupBy(_._1).map { case (k2, v) => k2 -> v.size }
    val xy = edges.map { case (a, b) => (deg(a).toDouble, deg(b).toDouble) }
    val ne = xy.length.toDouble
    val (sx, sy) = (xy.map(_._1).sum, xy.map(_._2).sum)
    val sxx = xy.map(p => p._1 * p._1).sum
    val syy = xy.map(p => p._2 * p._2).sum
    val sxy = xy.map(p => p._1 * p._2).sum
    val rRef = (ne * sxy - sx * sy) /
      (math.sqrt(ne * sxx - sx * sx) * math.sqrt(ne * syy - sy * sy))
    assert(approx(r, rRef, 1e-9), s"r: got $r want $rRef")
    // directed-edge count in the output matches the rebuilt graph
    assert(rows.head.getLong(3) == edges.length)
  }

  test("q220 rho matches a scalar Spearman per language") {
    val got = SparkEntry.queries("q220_spearman")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    val docs = graft.ops.OpsKit.tbl(spark, dir, "documents")
      .select(col("lang"), col("n_chars").cast("double"),
        size(array_distinct(split(col("text"), " "))).cast("double"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    for ((lang, rho) <- got) {
      val mine = docs.filter(_._1 == lang)
      val rx = avgRanks(mine.map(_._2).toSeq)
      val ry = avgRanks(mine.map(_._3).toSeq)
      val pts = mine.map(m => (rx(m._2), ry(m._3)))
      val n = pts.length.toDouble
      val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
      val sxx = pts.map(p => p._1 * p._1).sum
      val syy = pts.map(p => p._2 * p._2).sum
      val sxy = pts.map(p => p._1 * p._2).sum
      val ref = (n * sxy - sx * sy) /
        (math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy))
      assert(approx(rho, ref, 1e-9), s"$lang rho: got $rho want $ref")
      assert(rho.abs <= 1.0)
    }
  }
}
