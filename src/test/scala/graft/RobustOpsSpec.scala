package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q221–q225 invariants the oracle hash gate can't express: scalar
  * re-derivations and the SNM recall guarantee on the planted near-dup
  * family.
  */
class RobustOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def approx(a: Double, b: Double, tol: Double = 1e-9): Boolean =
    math.abs(a - b) <= tol * math.max(1.0, math.max(math.abs(a),
      math.abs(b)))

  test("q221 class sizes reconcile and modal_share bounds hold") {
    val rows = SparkEntry.queries("q221_l_diversity")(spark, dir)
      .collect()
      .map(r => (r.getLong(2), r.getLong(3), r.getDouble(4),
        r.getBoolean(5)))
    assert(rows.nonEmpty)
    val nCust = graft.ops.OpsKit.tbl(spark, dir, "customer").count()
    assert(rows.map(_._1).sum == nCust) // classes partition the table
    rows.foreach { case (sz, l, share, diverse) =>
      assert(l >= 1 && l <= sz)
      // modal class is at least 1/l of the class and at most all of it
      assert(share * l >= 1.0 - 1e-9 && share <= 1.0)
      assert(diverse == (l >= 4)) // r12 policy: l >= 4 over 2500-bands
    }
  }

  test("q222 best stump matches an exhaustive scalar threshold search") {
    val best = SparkEntry.queries("q222_gini_stump")(spark, dir)
      .collect().head
    val docs = graft.ops.OpsKit.tbl(spark, dir, "documents")
      .select(col("n_chars").cast("long"),
        when(col("lang") === "en", 1L).otherwise(0L))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val n = docs.length.toDouble
    val pt = docs.map(_._2).sum.toDouble
    def gini(nn: Double, p: Double): Double = {
      val q = nn - p; (nn - (p * p + q * q) / nn)
    }
    val cands = docs.map(_._1).distinct.sorted.dropRight(1)
    val scored = cands.map { t =>
      val nl = docs.count(_._1 <= t).toDouble
      val plv = docs.filter(_._1 <= t).map(_._2).sum.toDouble
      (t, (gini(nl, plv) + gini(n - nl, pt - plv)) / n)
    }
    val (bt, bg) = scored.minBy { case (t, g) => (g, t) }
    assert(best.getLong(0) == bt, s"threshold ${best.getLong(0)} != $bt")
    assert(approx(best.getDouble(5), bg), "gini_split mismatch")
    // gain = root − split, and root impurity matches the scalar formula
    val root = 1.0 - (pt / n) * (pt / n) - ((n - pt) / n) * ((n - pt) / n)
    assert(approx(best.getDouble(6), root))
    assert(approx(best.getDouble(7), root - bg))
  }

  test("q223 histogram mass reconciles with the distinct vocabulary") {
    val rows = SparkEntry.queries("q223_feature_hash_collisions")(
      spark, dir).collect()
    val vocab = graft.ops.OpsKit.tbl(spark, dir, "documents")
      .select(explode(split(col("text"), " ")).as("t")).distinct().count()
    val nTok = rows.head.getLong(2)
    assert(nTok == vocab)
    // Σ load·n_slots over the histogram = vocabulary size
    assert(rows.map(r => r.getLong(0) * r.getLong(1)).sum == vocab)
    assert(rows.map(r => r.getLong(1)).sum == rows.head.getLong(3))
  }

  test("q224 SNM window catches nearly all planted drop-token pairs") {
    val pairs = SparkEntry.queries("q224_sorted_neighborhood")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3),
        r.getBoolean(4), r.getBoolean(5)))
    val nDocs = graft.ops.OpsKit.tbl(spark, dir, "documents").count()
    // candidate volume is exactly (w−1)·n − (1 + 2) boundary shortfalls
    assert(pairs.length == 2 * (2 * nDocs) - 3)
    val caught = pairs.count { case (_, _, _, _, planted) => planted }
    // the min-token-hash key keeps a planted pair adjacent unless the
    // dropped token WAS the min or a hash tie reordered — ≥ 80% recall
    // on the planted family at this scale
    assert(caught >= (0.8 * nDocs).toInt,
      s"caught $caught of $nDocs planted pairs")
    // every planted pair the window caught is a true near-dup at τ=½
    pairs.filter(_._5).foreach { case (a, b, j, dup, _) =>
      assert(j > 0.5 && dup, s"planted pair ($a,$b) jaccard=$j")
    }
  }

  test("q225 trimmed/winsorized means match a scalar sort-based check") {
    val got = SparkEntry.queries("q225_trimmed_mean")(spark, dir)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6),
        r.getDouble(7)))
      .toMap
    val ev = graft.ops.OpsKit.events(spark, dir)
      .select(col("event_type"), col("value"))
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    for ((t, (n, k, mean, tm, wm, lo, hi)) <- got) {
      val vs = ev.filter(_._1 == t).map(_._2).sorted
      assert(n == vs.length && k == vs.length * 5 / 100)
      val ki = k.toInt
      val kept = vs.slice(ki, vs.length - ki)
      assert(approx(mean, vs.sum / vs.length, 1e-6))
      assert(approx(tm, kept.sum / kept.length, 1e-6))
      assert(lo == vs(ki) && hi == vs(vs.length - ki - 1))
      val wins = vs.map(v => math.max(vs(ki),
        math.min(v, vs(vs.length - ki - 1))))
      assert(approx(wm, wins.sum / wins.length, 1e-6))
    }
  }
}
