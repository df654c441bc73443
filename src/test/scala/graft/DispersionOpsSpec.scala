package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q236–q238: scalar re-derivations of the scatter decomposition, the
  * inter-arrival CV, and token burstiness.
  */
class DispersionOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def approx(a: Double, b: Double, tol: Double = 1e-6): Boolean =
    math.abs(a - b) <= tol * math.max(1.0, math.max(math.abs(a),
      math.abs(b)))

  test("q236 scatter decomposition matches the direct pairless formulas") {
    val got = SparkEntry.queries("q236_scatter_ratio")(spark, dir)
      .collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(5)))
      .toMap
    val emb = graft.ops.OpsKit.tbl(spark, dir, "embeddings")
      .select(col("label"), col("embedding"))
      .collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1).map(_.toDouble).toArray))
    val gmu = Array.tabulate(64)(i => emb.map(_._2(i)).sum / emb.length)
    var sb = 0.0; var sw = 0.0
    for ((l, (n, w, b, _)) <- got) {
      val mine = emb.filter(_._1 == l).map(_._2)
      assert(n == mine.length)
      val mu = Array.tabulate(64)(i => mine.map(_(i)).sum / mine.length)
      // two-pass residual form: agrees only up to the one-pass
      // identity's cancellation error (~1e-6 here) — that gap is the
      // price of the no-residual-pass shape, and this bound records it
      val twoPassW = mine.map(v => (0 until 64).map(i =>
        (v(i) - mu(i)) * (v(i) - mu(i))).sum).sum / mine.length
      assert(approx(w, twoPassW, 1e-4), s"label $l within: $w vs $twoPassW")
      // identity form (what the query computes) — still only ~1e-5:
      // the query's Σx² lives on the 6-decimal dsum grid, and the
      // E‖x‖² − ‖μ‖² subtraction amplifies that per-term rounding
      val exx = mine.map(v => v.map(x => x * x).sum).sum / mine.length
      val mu2 = mu.map(x => x * x).sum
      assert(approx(w, exx - mu2, 1e-4), s"label $l identity within")
      val wantB = (0 until 64).map(i =>
        (mu(i) - gmu(i)) * (mu(i) - gmu(i))).sum
      // between is a dsum over 64 six-decimal-rounded terms → grid
      // error up to ~3e-5 absolute
      assert(approx(b, wantB, 1e-4), s"label $l between: $b vs $wantB")
      sb += n * wantB; sw += n * twoPassW
    }
    assert(approx(got.values.head._4, sb / sw, 1e-4))
  }

  test("q237 CV matches a scalar gap computation per stream") {
    val got = SparkEntry.queries("q237_interarrival_cv")(spark, dir)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(3),
        r.getDouble(4)))
      .toMap
    val ev = graft.ops.OpsKit.events(spark, dir)
      .select(col("event_type"), col("user_id"),
        expr("unix_micros(ts)").as("us"), col("event_id"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // per user, gaps between consecutive events; gap labeled by the
    // LATER event's type (lag semantics)
    val gaps = ev.groupBy(_._2).values.flatMap { g =>
      val o = g.sortBy(e => (e._3, e._4)).toSeq
      o.sliding(2).collect { case Seq(a, b) => (b._1, b._3 - a._3) }
    }.toSeq
    for ((t, (n, cv, burst)) <- got) {
      val mine = gaps.filter(_._1 == t).map(_._2.toDouble)
      assert(n == mine.length, s"$t n")
      val mu = mine.sum / mine.length
      val sd = math.sqrt(mine.map(v => (v - mu) * (v - mu)).sum /
        mine.length)
      assert(approx(cv, sd / mu), s"$t cv")
      assert(approx(burst, (sd / mu - 1.0) / (sd / mu + 1.0)))
    }
  }

  test("q238 returns the true top-20 bursty tokens with exact VMR") {
    val got = SparkEntry.queries("q238_token_burstiness")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(4)))
    val docs = graft.ops.OpsKit.tbl(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
      .collect().map(r => r.getString(1).split(" ", -1))
    val n = docs.length.toDouble
    val counts = scala.collection.mutable.Map
      .empty[String, scala.collection.mutable.ArrayBuffer[Long]]
    docs.foreach { toks =>
      toks.groupBy(identity).foreach { case (t, g) =>
        counts.getOrElseUpdate(t,
          scala.collection.mutable.ArrayBuffer.empty) += g.length.toLong
      }
    }
    val want = counts.toSeq
      .filter(_._2.length >= 5)
      .map { case (t, cs) =>
        val tf = cs.sum.toDouble
        val mean = tf / n
        val vmr = (cs.map(c => c.toDouble * c).sum / n - mean * mean) /
          mean
        (t, cs.length.toLong, cs.sum, vmr)
      }
      .sortBy { case (t, _, _, v) => (-v, t) }
      .take(20)
    assert(got.length == 20)
    got.zip(want).foreach { case ((gt, gdf, gtf, gv), (wt, wdf, wtf, wv)) =>
      assert(gt == wt && gdf == wdf && gtf == wtf, s"$gt vs $wt")
      assert(approx(gv, wv), s"$gt vmr")
    }
  }
}
