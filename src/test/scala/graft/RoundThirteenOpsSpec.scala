package graft

import org.scalatest.funsuite.AnyFunSuite

/** Scalar re-derivations for the round-13 additions.
  *
  * The oracle hash gate proves Spark == DuckDB; these prove both equal
  * the textbook construction — recomputing each result in plain Scala
  * from collected raw rows, the discipline that caught the q224/q248
  * vacuous-consistency bugs.
  */
class RoundThirteenOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  // the dsum grid: quantize each addend to 6 decimals, sum exactly
  private def dsumRe(xs: Seq[Double]): Double =
    xs.map(x => BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP))
      .sum.toDouble

  test("q298 DoReMi: excess losses and MW weights replay from raw text") {
    val out = SparkEntry.queries("q298_doremi_mixture")(spark, dir)
      .collect().map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_docs_scored"), r.getAs[Long]("src_pos"),
          r.getAs[Double]("pos_share"), r.getAs[Double]("excess_loss"),
          r.getAs[Double]("alpha"), r.getAs[Double]("tilt"))).toMap
    assert(out.nonEmpty)
    val docs = graft.ops.OpsKit.tbl(spark, dir, "documents")
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"),
        r.getAs[String]("text")))

    // rebuild both LMs from first principles — since r14 the proxy
    // unigram LM lives over the SAME position set as the bigram LM
    // (continuation counts from the shared docBigrams artifact), so the
    // replay's unigram counts come from bigram second elements, not the
    // raw token stream
    val toks = docs.map { case (id, src, t) => (id, src, t.split(" ", -1)) }
    val bigrams = toks.filter(_._3.length >= 2).map { case (id, src, w) =>
      (id, src, w.sliding(2).map(p => (p(0), p(1))).toSeq)
    }
    val c12 = bigrams.flatMap(_._3).groupBy(identity)
      .map { case (b, g) => b -> g.length.toLong }
    val c1 = c12.groupBy(_._1._1).map { case (w1, g) => w1 -> g.values.sum }
    val cw2 = c12.groupBy(_._1._2).map { case (w2, g) => w2 -> g.values.sum }
    val nPos = c12.values.sum

    // per-doc ref (bigram conditional) and proxy (continuation unigram
    // at the same positions) mean probabilities, then the clipped excess
    val perDoc = bigrams.map { case (_, src, bs) =>
      val n = bs.size.toDouble
      val ref = dsumRe(bs.groupBy(identity).toSeq.map { case (b, g) =>
        g.size.toDouble * (c12(b).toDouble / c1(b._1).toDouble)
      }) / n
      val proxySum = bs.groupBy(identity).toSeq.map { case (b, g) =>
        BigDecimal(g.size.toLong * cw2(b._2))
      }.sum
      val proxy = proxySum.toDouble / (n * nPos.toDouble)
      (src, math.max(ref / proxy - 1.0, 0.0))
    }
    val lamRe = perDoc.groupBy(_._1).map { case (src, g) =>
      src -> (g.length.toLong, dsumRe(g.map(_._2).toSeq) / g.length.toDouble)
    }
    assert(lamRe.keySet == out.keySet)
    for ((src, (nRe, lRe)) <- lamRe) {
      assert(out(src)._1 == nRe, s"n_docs_scored $src")
      // dsum grouping may differ between the replay's per-doc fold and
      // Spark's partial aggregation -> grid tolerance, not bit-equality
      assert(math.abs(out(src)._4 - lRe) < 1e-4, s"excess $src")
    }

    // position shares are exact integers (bigram positions per source)
    val posRe = bigrams.groupBy(_._2).map { case (s, g) =>
      s -> g.map(_._3.size.toLong).sum
    }
    val allPos = posRe.values.sum
    assert(allPos == nPos)
    for ((src, n) <- posRe) {
      assert(out(src)._2 == n, s"src_pos $src")
      assert(math.abs(out(src)._3 - n.toDouble / allPos.toDouble) < 1e-12)
    }

    // replay the 8 MW rounds: multiply by (1 + lambda), normalize on
    // the dsum grid, smooth 0.99/0.01 toward uniform
    val srcs = lamRe.keys.toSeq.sorted
    val k = srcs.size.toDouble
    var a = srcs.map(_ -> 1.0).toMap
    for (_ <- 1 to 8) {
      val ar = srcs.map(s => s -> a(s) * (1.0 + lamRe(s)._2)).toMap
      val z = dsumRe(srcs.map(ar))
      a = srcs.map(s => s -> (0.99 * (ar(s) / z) + 0.01 / k)).toMap
    }
    for (src <- srcs)
      assert(math.abs(out(src)._5 - a(src)) < 1e-4, s"alpha $src")
    // invariants: weights are a (smoothed) distribution and the tilt
    // column is alpha over the natural position share
    val aSum = srcs.map(s => out(s)._5).sum
    assert(math.abs(aSum - 1.0) < 1e-3, s"alpha sum $aSum")
    for (src <- srcs)
      assert(math.abs(out(src)._6 - out(src)._5 / out(src)._3) < 1e-9,
        s"tilt $src")
    // the fixture is non-degenerate: excess loss actually varies by
    // source, so MW genuinely tilts (guards the q259 all-equal lesson)
    assert(lamRe.values.map(_._2).toSet.size > 1, "flat excess losses")
  }
}
