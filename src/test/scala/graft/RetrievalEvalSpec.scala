package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q242–q245: concentration, co-usage, SRM and retrieval-eval scalar
  * re-derivations (q245's uses the session's own lsh_bucket expression
  * for bucketing, then re-ranks and re-scores in plain Scala).
  */
class RetrievalEvalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def approx(a: Double, b: Double, tol: Double = 1e-9): Boolean =
    math.abs(a - b) <= tol * math.max(1.0, math.max(math.abs(a),
      math.abs(b)))

  test("q242 HHI, effective sources and top share match a scalar run") {
    val got = SparkEntry.queries("q242_mixture_hhi")(spark, dir)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
      .toMap
    val docs = graft.ops.OpsKit.tbl(spark, dir, "documents")
      .select(col("lang"), col("source"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    for ((lang, (n, ns, hhi, eff, top)) <- got) {
      val counts = docs.filter(_._1 == lang).groupBy(_._2)
        .map(_._2.length.toDouble).toSeq
      assert(n == counts.sum.toLong && ns == counts.length)
      val shares = counts.map(_ / counts.sum)
      val wantH = shares.map(x => x * x).sum
      assert(approx(hhi, wantH), s"$lang hhi")
      assert(approx(eff * hhi, 1.0))
      assert(approx(top, counts.max / counts.sum))
    }
  }

  test("q243 overlap, jaccard and containments match scalar user sets") {
    val got = SparkEntry.queries("q243_cousage_matrix")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5), r.getDouble(6)))
      .toMap
    val tu = graft.ops.OpsKit.events(spark, dir)
      .select(col("event_type"), col("user_id")).distinct()
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val sets = tu.groupBy(_._1).map { case (t, g) =>
      t -> g.map(_._2).toSet }
    for (((ta, tb), (na, nb, m, j, ca)) <- got) {
      val (sa, sb) = (sets(ta), sets(tb))
      assert(na == sa.size && nb == sb.size)
      assert(m == (sa & sb).size)
      assert(approx(j, (sa & sb).size.toDouble / (sa | sb).size))
      assert(approx(ca, (sa & sb).size.toDouble / sa.size))
    }
    // every pair that shares at least one user is present
    val expectPairs = (for {
      a <- sets.keys; b <- sets.keys if a < b
      if (sets(a) & sets(b)).nonEmpty
    } yield (a, b)).toSet
    assert(got.keySet == expectPairs)
  }

  test("q244 chi2 is the exact 1-dof SRM form and arms partition users") {
    val rows = SparkEntry.queries("q244_srm_check")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getBoolean(5)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, n, a0, a1, chi, alarm) =>
      assert(a0 + a1 == n)
      val want = (a0 - a1).toDouble * (a0 - a1).toDouble / n
      assert(approx(chi, want))
      assert(alarm == (want > 3.841))
    }
  }

  test("q245 MRR and hit@3 match a scalar re-rank over the same buckets") {
    val got = SparkEntry.queries("q245_mrr_hit3")(spark, dir)
      .collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2),
        r.getDouble(3)))
      .toMap
    val rows = graft.ops.OpsKit.tbl(spark, dir, "embeddings")
      .select(col("vec_id"), col("label"), col("embedding"),
        call_function("lsh_bucket", col("embedding")).as("bucket"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Float](2).map(_.toDouble).toArray, r.getLong(3)))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dp = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { dp += a(i) * b(i); na += a(i) * a(i)
        nb += b(i) * b(i) }
      dp / (math.sqrt(na) * math.sqrt(nb))
    }
    val byBucket = rows.groupBy(_._4)
    val perLabel = scala.collection.mutable.Map
      .empty[Int, scala.collection.mutable.ArrayBuffer[(Double, Int)]]
    for ((_, members) <- byBucket; q <- members) {
      val cands = members.filter(_._1 != q._1)
      if (cands.nonEmpty) {
        val ranked = cands
          .map(c => (c._1, c._2, cos(q._3, c._3)))
          .sortBy(c => (-c._3, c._1))
        val firstRel = ranked.indexWhere(_._2 == q._2)
        val rr = if (firstRel < 0) 0.0 else 1.0 / (firstRel + 1)
        val h3 = if (firstRel >= 0 && firstRel < 3) 1 else 0
        perLabel.getOrElseUpdate(q._2,
          scala.collection.mutable.ArrayBuffer.empty) += ((rr, h3))
      }
    }
    for ((l, (n, mrr, h3)) <- got) {
      val mine = perLabel(l)
      assert(n == mine.length, s"label $l n")
      assert(approx(mrr, mine.map(_._1).sum / mine.length, 1e-6),
        s"label $l mrr")
      assert(approx(h3, mine.map(_._2).sum.toDouble / mine.length),
        s"label $l hit3")
    }
  }
}
