package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q250–q252: shrinkage direction/order invariants, Wilson-interval
  * scalar re-derivation, and a full scalar keyness re-rank.
  */
class ShrinkageOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def approx(a: Double, b: Double, tol: Double = 1e-9): Boolean =
    math.abs(a - b) <= tol * math.max(1.0, math.max(math.abs(a),
      math.abs(b)))

  test("q250 shrinkage pulls every source toward the pooled mean") {
    val rows = SparkEntry.queries("q250_eb_shrinkage")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    assert(rows.nonEmpty)
    val pBar = rows.map(_._3).sum.toDouble / rows.map(_._2).sum
    val m = rows.head._6
    assert(m >= 1.0)
    rows.foreach { case (src, n, k, raw, shrunk, mm) =>
      assert(mm == m) // one prior strength for everyone
      assert(approx(shrunk, (k + m * pBar) / (n + m)), src)
      // shrunk lies between raw and the pooled mean
      assert(shrunk >= math.min(raw, pBar) - 1e-12 &&
        shrunk <= math.max(raw, pBar) + 1e-12, src)
    }
  }

  test("q251 Wilson bounds bracket the rate and match the formula") {
    val rows = SparkEntry.queries("q251_bounce_wilson")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, n, b, p, lo, hi) =>
      assert(approx(p, b.toDouble / n))
      val nd = n.toDouble; val z = 1.96
      val den = 1.0 + z * z / nd
      val ctr = p + z * z / (2.0 * nd)
      val half = z * math.sqrt(p * (1.0 - p) / nd +
        z * z / (4.0 * nd * nd))
      assert(approx(lo, (ctr - half) / den))
      assert(approx(hi, (ctr + half) / den))
      assert(lo <= p + 1e-12 && p <= hi + 1e-12 &&
        lo >= 0.0 && hi <= 1.0)
    }
  }

  test("q252 top-10 keyness matches a scalar chi-square re-rank") {
    val got = SparkEntry.queries("q252_keyness")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(4)))
    val bySrc = got.groupBy(_._1)
    assert(bySrc.values.forall(_.length == 10))
    val docs = graft.ops.OpsKit.tbl(spark, dir, "documents")
      .select(col("source"), col("text"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val counts = scala.collection.mutable.Map
      .empty[(String, String), Long].withDefaultValue(0L)
    docs.foreach { case (src, text) =>
      text.split(" ", -1).foreach(t => counts((src, t)) += 1) }
    val tokTot = counts.groupBy(_._1._2).view
      .mapValues(_.values.sum).toMap
    val srcTot = counts.groupBy(_._1._1).view
      .mapValues(_.values.sum).toMap
    val nAll = counts.values.sum.toDouble
    for ((src, gotRows) <- bySrc) {
      val want = counts.collect { case ((`src`, tok), a)
          if a * nAll > tokTot(tok).toDouble * srcTot(src) =>
        val (ad, bd2) = (a.toDouble, (tokTot(tok) - a).toDouble)
        val cd = (srcTot(src) - a).toDouble
        val dd = nAll - tokTot(tok) - srcTot(src) + a
        val chi = nAll * (ad * dd - bd2 * cd) * (ad * dd - bd2 * cd) /
          ((ad + bd2) * (cd + dd) * (ad + cd) * (bd2 + dd))
        (tok, chi)
      }.toSeq.sortBy { case (t, c) => (-c, t) }.take(10)
      val mine = gotRows.sortBy(r => (-r._3, r._2))
      mine.zip(want).foreach { case ((_, gt, gc), (wt, wc)) =>
        assert(gt == wt, s"$src: $gt vs $wt")
        assert(approx(gc, wc, 1e-9))
      }
    }
  }
}
