package graft

import org.scalatest.funsuite.AnyFunSuite

/** Independent scalar references for the in-engine ML operators, the
  * QualityGraphOpsSpec discipline: re-run the math as plain sequential
  * Scala on the collected sf0.001 embeddings and demand bit-equality —
  * so the distributed shapes (dimension-sharded gradients, broadcast
  * models, decimal-exact centroid sums) are pinned against a reference
  * that shares no Spark code with them.
  */
class MlRefSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private lazy val rows: Array[(Long, Array[Float], Int)] = {
    import org.apache.spark.sql.functions.col
    graft.ops.OpsKit.tbl(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"), col("label"))
      .collect()
      .map(r => (r.getLong(0),
        r.getSeq[Float](1).toArray, r.getInt(2)))
  }

  test("q168 learning curve equals a sequential scalar perceptron") {
    val data = rows.map { case (_, emb, label) =>
      val y = if (label % 2 == 0) 1L else -1L
      (y, emb.map(v => math.floor(v.toDouble * 64.0).toLong))
    }
    var w = Array.fill(64)(0L)
    var b = 0L
    val want = (1 to 5).map { r =>
      val margins = data.map { case (y, xq) =>
        (y, xq, b + xq.indices.map(j => w(j) * xq(j)).sum)
      }
      val miscl = margins.filter { case (y, _, m) => y * m <= 0 }
      val row = (r.toLong, data.length.toLong, miscl.length.toLong,
        (data.length - miscl.length).toDouble / data.length.toDouble)
      w = w.indices.map(j =>
        w(j) + miscl.map { case (y, xq, _) => y * xq(j) }.sum).toArray
      b += miscl.map(_._1).sum
      row
    }
    val got = SparkEntry.queries("q168_perceptron")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(_._1).toSeq
    assert(got == want)
  }

  test("q169 conformal report equals a sequential scalar reference") {
    // decimal-exact mean per dim, mirroring OpsKit.dsum's
    // DECIMAL(28,6) per-value rounding before the exact sum
    def dmean(vs: Seq[Double]): Double =
      (vs.map(v => BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP))
        .sum.toDouble) / vs.size
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0
      var i = 0
      while (i < a.length) { acc += a(i) * b(i); i += 1 }
      acc
    }
    def cos(a: Array[Double], b: Array[Double]): Double =
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))

    val cal = rows.filter(_._1 % 2 == 0)
    val test_ = rows.filter(_._1 % 2 == 1)
    val cents: Map[Int, Array[Double]] = cal.groupBy(_._3).map {
      case (lbl, xs) =>
        lbl -> Array.tabulate(64)(j =>
          dmean(xs.toSeq.map(_._2(j).toDouble)))
    }
    val qhat: Map[Int, (Long, Double)] = cal.groupBy(_._3).map {
      case (lbl, xs) =>
        val scored = xs.toSeq
          .map(x => (1.0 - cos(x._2.map(_.toDouble), cents(lbl)), x._1))
          .sorted
        val n = xs.length.toLong
        val k = ((9 * (n + 1) + 9) / 10).toInt
        lbl -> (n, scored(k - 1)._1)
    }
    val want = test_.groupBy(_._3).map { case (lbl, xs) =>
      val per = xs.toSeq.map { x =>
        val incl = cents.keys.toSeq.filter(c =>
          1.0 - cos(x._2.map(_.toDouble), cents(c)) <= qhat(c)._2)
        (incl.size.toLong, if (incl.contains(lbl)) 1L else 0L)
      }
      lbl.toLong -> (qhat(lbl)._1, xs.length.toLong, qhat(lbl)._2,
        per.map(_._2).sum.toDouble / per.size.toDouble,
        per.map(_._1).sum.toDouble / per.size.toDouble)
    }
    val got = SparkEntry.queries("q169_conformal")(spark, dir)
      .collect()
      .map(r => r.getInt(0).toLong -> (r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
      .toMap
    assert(got == want)
  }
}
