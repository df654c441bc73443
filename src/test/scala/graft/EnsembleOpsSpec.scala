package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q230–q232: churn bookkeeping, the grouped-fold zero-leak guarantee,
  * and a full scalar re-run of the bagged stump ensemble (including the
  * md5 bag membership).
  */
class EnsembleOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def strHash(s2: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s2.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  test("q230 churn statuses and ranks are mutually consistent") {
    val rows = SparkEntry.queries("q230_heavyhitter_churn")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getString(5)))
    assert(rows.nonEmpty && rows.length <= 20)
    assert(rows.map(_._1).distinct.length == rows.length)
    rows.foreach { case (u, c1, c2, r1, r2, st) =>
      st match {
        case "entered" => assert(r1 == 0 && r2 >= 1 && r2 <= 10)
        case "left"    => assert(r2 == 0 && r1 >= 1 && r1 <= 10)
        case "stayed"  => assert(r1 >= 1 && r1 <= 10 && r2 >= 1 && r2 <= 10)
      }
      // a ranked side always carries a positive count
      if (r1 > 0) assert(c1 > 0); if (r2 > 0) assert(c2 > 0)
    }
    // each half contributes exactly 10 ranked entries
    assert(rows.count(_._4 > 0) == 10 && rows.count(_._5 > 0) == 10)
  }

  test("q231 grouped folds leak zero pairs; naive folds leak for real") {
    val rows = SparkEntry.queries("q231_grouped_kfold")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.map(_._1).sorted.toSeq == Seq(0L, 1L, 2L, 3L, 4L))
    assert(rows.forall(_._5 == 0L), "grouped scheme must never leak")
    assert(rows.map(_._4).sum > 0L, "naive scheme should leak here")
    val nDocs = rows.map(_._2).sum
    assert(rows.map(_._3).sum == nDocs) // both schemes partition corpus
  }

  test("q232 stumps, votes and OOB error match a full scalar re-run") {
    val rows = SparkEntry.queries("q232_bagged_stumps")(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(3),
        r.getBoolean(4), r.getDouble(5), r.getDouble(6)))
      .toMap
    assert(rows.size == 8)
    val docs = graft.ops.OpsKit.tbl(spark, dir, "documents")
      .select(col("doc_id"), col("n_chars").cast("long"),
        when(col("lang") === "en", 1L).otherwise(0L))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    def gini(n: Double, p: Double) = { val q = n - p
      n - (p * p + q * q) / n }
    val stumps = (0 until 8).map { b =>
      val bag = docs.filter(d => strHash(s"bag:$b:${d._1}") % 2 == 0)
      val cands = bag.map(_._2).distinct.sorted.dropRight(1)
      val n = bag.length.toDouble; val pt = bag.map(_._3).sum.toDouble
      val (t, _) = cands.map { t =>
        val l = bag.filter(_._2 <= t)
        val nl = l.length.toDouble; val pl = l.map(_._3).sum.toDouble
        (t, (gini(nl, pl) + gini(n - nl, pt - pl)) / n)
      }.minBy { case (t2, g) => (g, t2) }
      val l = bag.filter(_._2 <= t)
      val (nl, pl) = (l.length, l.map(_._3).sum)
      b -> (t, pl * 2 >= nl, (pt - pl) * 2 >= n - nl)
    }.toMap
    for ((b, (t, lp, rp, _, _)) <- rows) {
      val (wt, wlp, wrp) = stumps(b.toInt)
      assert(t == wt && lp == wlp && rp == wrp, s"bag $b stump mismatch")
    }
    // scalar ensemble + OOB
    var okCnt = 0; var oobWrong = 0; var oobDocs = 0
    for ((id, x, y) <- docs) {
      val votes = (0 until 8).map { b =>
        val (t, lp, rp) = stumps(b)
        if (x <= t) { if (lp) 1 else 0 } else { if (rp) 1 else 0 }
      }
      val oobIdx = (0 until 8).filter(b => strHash(s"bag:$b:$id") % 2 != 0)
      if ((if (votes.sum * 2 >= 8) 1 else 0) == y) okCnt += 1
      if (oobIdx.nonEmpty) {
        oobDocs += 1
        val ov = oobIdx.map(votes).sum
        if ((if (ov * 2 >= oobIdx.length) 1 else 0) != y) oobWrong += 1
      }
    }
    val (acc, oob) = (rows.head._2._4, rows.head._2._5)
    assert(math.abs(acc - okCnt.toDouble / docs.length) < 1e-12)
    assert(math.abs(oob - oobWrong.toDouble / oobDocs) < 1e-12)
  }
}
