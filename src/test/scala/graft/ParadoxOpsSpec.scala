package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q239–q241: stratified-slope scalar re-derivation, chi-square/V
  * re-derivation, and noise-estimate consistency bounds.
  */
class ParadoxOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def approx(a: Double, b: Double, tol: Double = 1e-9): Boolean =
    math.abs(a - b) <= tol * math.max(1.0, math.max(math.abs(a),
      math.abs(b)))

  test("q239 band and pooled slopes match a scalar stratified fit") {
    val rows = SparkEntry.queries("q239_simpson_audit")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3)))
    val users = graft.ops.OpsKit.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_ev"),
        sum(when(col("event_type") === "click", 1L).otherwise(0L))
          .as("x"),
        coalesce(graft.ops.OpsKit.dsum(
          when(col("event_type") === "purchase", col("value"))),
          lit(0.0)).as("yv"))
      .collect()
      .map(r => (r.getLong(1), r.getLong(2),
        math.floor(r.getDouble(3) * 1000.0).toLong))
    val nU = users.length
    // tercile by rank of n_ev (ties share the distinct value's rank)
    val sortedEv = users.map(_._1).sorted
    def band(nEv: Long): Long = {
      val f = sortedEv.count(_ <= nEv).toLong
      (f * 3 - 1) / nU
    }
    def slope(pts: Seq[(Long, Long)]): Double = {
      val n = pts.length.toDouble
      val sx = pts.map(_._1.toDouble).sum
      val sy = pts.map(_._2.toDouble).sum
      val sxy = pts.map(p => p._1.toDouble * p._2).sum
      val sxx = pts.map(p => p._1.toDouble * p._1).sum
      (n * sxy - sx * sy) / (n * sxx - sx * sx)
    }
    val pooled = slope(users.map(u => (u._2, u._3)).toSeq)
    assert(rows.map(_._2).sum == nU) // bands partition the users
    for ((b, n, bs, ps) <- rows) {
      val mine = users.filter(u => band(u._1) == b).map(u => (u._2, u._3))
      assert(n == mine.length, s"band $b size")
      assert(approx(bs, slope(mine.toSeq), 1e-6), s"band $b slope")
      assert(approx(ps, pooled, 1e-6))
    }
  }

  test("q240 chi-square and Cramer's V match a scalar contingency run") {
    val rows = SparkEntry.queries("q240_cramers_v")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(5), r.getDouble(7)))
    val docs = graft.ops.OpsKit.tbl(spark, dir, "documents")
      .select(col("lang"), col("source"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val n = docs.length.toDouble
    val langs = docs.map(_._1).distinct
    val srcs = docs.map(_._2).distinct
    assert(rows.length == langs.length * srcs.length)
    assert(rows.map(_._3).sum == docs.length)
    var chi = 0.0
    for (l <- langs; s2 <- srcs) {
      val o = docs.count(p => p._1 == l && p._2 == s2).toDouble
      val e = docs.count(_._1 == l) * docs.count(_._2 == s2) / n
      chi += (o - e) * (o - e) / e
    }
    val v = math.sqrt(chi / (n * (math.min(langs.length,
      srcs.length) - 1)))
    assert(approx(rows.head._4, chi, 1e-4), s"chi2 ${rows.head._4} vs $chi")
    assert(approx(rows.head._5, v, 1e-4))
  }

  test("q241 noise estimates are internally consistent") {
    val rows = SparkEntry.queries("q241_knn_label_noise")(spark, dir)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4)))
    assert(rows.nonEmpty)
    val nVec = graft.ops.OpsKit.tbl(spark, dir, "embeddings").count()
    // nodes with ≥1 same-bucket neighbor; never more than the corpus
    assert(rows.map(_._2).sum <= nVec && rows.map(_._2).sum > 0)
    rows.foreach { case (_, nodes, suspect, rate, share) =>
      assert(suspect <= nodes)
      assert(rate >= 0.0 && rate <= 1.0)
      assert(approx(share, suspect.toDouble / nodes))
    }
  }
}
