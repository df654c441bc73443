package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q233–q235: scalar KS re-derivation, the Chapman estimator identity,
  * and threshold-sweep monotonicity + endpoint checks.
  */
class AuditOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def approx(a: Double, b: Double, tol: Double = 1e-9): Boolean =
    math.abs(a - b) <= tol * math.max(1.0, math.max(math.abs(a),
      math.abs(b)))

  test("q233 D matches a scalar two-sample KS for every source pair") {
    val got = SparkEntry.queries("q233_ks_matrix")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(4)).toMap
    val docs = graft.ops.OpsKit.tbl(spark, dir, "documents")
      .select(col("source"), col("n_chars").cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val bySrc = docs.groupBy(_._1).map { case (s2, g) =>
      s2 -> g.map(_._2).sorted }
    assert(got.nonEmpty)
    for (((s1, s2), dStat) <- got) {
      val (a, b) = (bySrc(s1), bySrc(s2))
      val xs = (a ++ b).distinct
      val want = xs.map { x =>
        math.abs(a.count(_ <= x).toDouble / a.length -
          b.count(_ <= x).toDouble / b.length)
      }.max
      assert(approx(dStat, want, 1e-12), s"($s1,$s2): got $dStat want $want")
    }
  }

  test("q234 n_hat is the Chapman formula and m <= min(n1, n2)") {
    val rows = SparkEntry.queries("q234_capture_recapture")(spark, dir)
      .collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getDouble(5), r.getDouble(6)))
    assert(rows.nonEmpty)
    rows.foreach { case (n1, n2, m, nTrue, nHat, relErr) =>
      assert(m <= math.min(n1, n2) && nTrue >= math.max(n1, n2))
      assert(approx(nHat,
        (n1 + 1.0) * (n2 + 1.0) / (m + 1.0) - 1.0))
      assert(approx(relErr, math.abs(nHat - nTrue) / nTrue))
      // Chapman is consistent on uniform catchability — loose sanity band
      assert(relErr < 0.5, s"estimate off by ${relErr * 100}%")
    }
  }

  test("q235 sweep is monotone in tau and catches planted pairs at 0.5") {
    val rows = SparkEntry.queries("q235_threshold_sweep")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(5)))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == (3L to 9L).toSeq)
    // predictions and true positives shrink as tau rises
    assert(rows.toSeq.sliding(2).forall { case Seq(a, b) =>
      b._2 <= a._2 && b._3 <= a._3
    case _ => true })
    // at tau = 0.5 the drop-one-token family is nearly fully recalled
    val at5 = rows.find(_._1 == 5L).get
    assert(at5._5 > 0.9, s"recall at 0.5 = ${at5._5}")
  }
}
