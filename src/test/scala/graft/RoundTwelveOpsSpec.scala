package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Scalar re-derivations for the round-12 additions (q272–q278).
  *
  * The oracle hash gate proves Spark == DuckDB; these prove both equal
  * the textbook construction — recomputing each result in plain Scala
  * from collected raw rows (or a hand-built corpus with known answers),
  * the discipline that caught the q224/q248 vacuous-consistency bugs.
  */
class RoundTwelveOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("q272 Shapley: matches the exact coalition sum and is efficient") {
    // re-derive every φ from first principles: per-user (mask, conv)
    // collected, v(S) = Σ conv over masks ⊆ S, φ_i the weighted sum
    // over all 8 coalitions not containing i — then compare the exact
    // BIGINT numerators, and check the efficiency axiom Σφ = v(full)
    // − v(∅) that makes Shapley "a credit SPLIT" rather than scores
    val rows = SparkEntry.queries("q272_shapley_attribution")(spark, dir)
      .collect().map(r => r.getAs[String]("channel") ->
        (r.getAs[Long]("phi_num"), r.getAs[Long]("v_full"))).toMap
    assert(rows.size == 4)
    val ev = graft.ops.OpsKit.events(spark, dir)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    def early(t: String) =
      max(when(col("rn") <= 4 && col("event_type") === t, 1L)
        .otherwise(0L))
    val mu = ev.withColumn("rn", row_number().over(w))
      .groupBy(col("user_id"))
      .agg((early("click") + lit(2L) * early("view") +
        lit(4L) * early("signup") + lit(8L) * early("error")).as("mask"),
        max(when(col("event_type") === "purchase" && col("value") > 150.0,
          1L).otherwise(0L)).as("conv"))
      .collect().map(r => (r.getAs[Long]("mask"), r.getAs[Long]("conv")))
    def v(sset: Int): Long =
      mu.filter { case (m, _) => (m & sset) == m }.map(_._2).sum
    val weights = Map(0 -> 6L, 1 -> 2L, 2 -> 2L, 3 -> 6L)
    val names = Seq("click" -> 1, "view" -> 2, "signup" -> 4,
      "error" -> 8)
    for ((name, bit) <- names) {
      val phi = (0 until 16).filter(s => (s & bit) == 0).map { s =>
        weights(Integer.bitCount(s)) * (v(s | bit) - v(s))
      }.sum
      assert(rows(name)._1 == phi, s"$name: ${rows(name)._1} != $phi")
    }
    assert(rows.values.map(_._1).sum == 24L * (v(15) - v(0)),
      "efficiency axiom violated")
    assert(rows.values.head._2 == v(15))
  }

  test("q273 target encoding: leave-fold-out means recompute exactly") {
    val out = SparkEntry.queries("q273_target_encoding")(spark, dir)
      .collect().map(r => (r.getAs[String]("seg"), r.getAs[Long]("fold"))
        -> (r.getAs[Long]("n_out"), r.getAs[Double]("enc"),
            r.getAs[Double]("prior_f"))).toMap
    val raw = graft.ops.OpsKit.tbl(spark, dir, "orders")
      .join(graft.ops.OpsKit.tbl(spark, dir, "customer"),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment"), pmod(col("o_orderkey"), lit(5L)),
        col("o_totalprice"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    // recompute on the dsum grid: per-cell decimal(28,6) sums
    def g(xs: Seq[Double]): BigDecimal =
      xs.map(x => BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP))
        .sum
    for (((seg, fold), (nOut, enc, prior)) <- out) {
      val inSeg = raw.filter(_._1 == seg)
      val outFold = inSeg.filter(_._2 != fold)
      assert(outFold.size.toLong == nOut)
      val allOut = raw.filter(_._2 != fold)
      val priorRe = (g(allOut.map(_._3)).toDouble) / allOut.size.toDouble
      assert(math.abs(priorRe - prior) < 1e-9, s"prior $seg/$fold")
      val encRe = (g(outFold.map(_._3)).toDouble -
        0.0 + 10.0 * priorRe) / (outFold.size.toDouble + 10.0)
      // same ingredients, possibly different summation grouping →
      // tolerance, not bit-equality (the oracle supplies bit-equality)
      assert(math.abs(encRe - enc) < 1e-6, s"enc $seg/$fold $encRe $enc")
    }
  }

  test("q274 conformal: qhat is the ceil((n+1)(1-alpha)) residual by value") {
    val out = SparkEntry.queries("q274_conformal")(spark, dir).collect()
    assert(out.nonEmpty)
    val ev = graft.ops.OpsKit.events(spark, dir)
      .select(col("event_id"), col("event_type"), col("value"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    for (r <- out) {
      val t = r.getAs[String]("event_type")
      val train = ev.filter(e => e._2 == t && e._1 % 2 == 0).map(_._3)
      // μ on the dsum grid, exactly as davg computes it
      val mu = train.map(x => BigDecimal(x).setScale(6,
        BigDecimal.RoundingMode.HALF_UP)).sum.toDouble / train.length
      val res = ev.filter(e => e._2 == t && e._1 % 2 == 1)
        .map(e => math.abs(e._3 - mu)).sorted
      val n = res.length
      assert(r.getAs[Long]("n_cal") == n.toLong)
      val k = ((n + 1) * 9 + 9) / 10
      assert(r.getAs[Long]("k_rank") == k.toLong)
      assert(r.getAs[Double]("qhat") == res(k - 1), s"$t qhat")
      // and the conformal guarantee direction on the calibration set:
      // at least k of n residuals sit at or below qhat
      assert(res.count(_ <= r.getAs[Double]("qhat")) >= k)
    }
  }

  test("q275 vocab richness: exact FoF and Chao1 on a crafted corpus") {
    import spark.implicits._
    // shingle multiset engineered by hand: "a b c d" → {abc, bcd},
    // "a b c e" → {abc, bce}, repeated so abc×3, bcd×2, bce×1 —
    // f1 = f2 = f3 = 1, D = 3, bias-corrected chao1 = 3 + 1·0/(2·2) = 3,
    // Good–Turing r* : r=1 → 2·f2/f1 = 2, r=2 → 3·f3/f2 = 3
    val tmp = java.nio.file.Files.createTempDirectory("q275").toString
    Seq((1L, "a b c d"), (2L, "a b c e"), (3L, "a b c d"))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val rows = SparkEntry.queries("q275_vocab_richness")(spark, tmp)
      .collect().map(r => r.getAs[Long]("r") ->
        (r.getAs[Long]("f_r"), Option(r.getAs[java.lang.Double]("r_star")),
          r.getAs[Long]("types"), r.getAs[Long]("f1"),
          r.getAs[Long]("f2"), r.getAs[Double]("chao1"))).toMap
    assert(rows.keySet == Set(1L, 2L, 3L))
    assert(rows(1L)._1 == 1 && rows(2L)._1 == 1 && rows(3L)._1 == 1)
    assert(rows(1L)._3 == 3 && rows(1L)._4 == 1 && rows(1L)._5 == 1)
    assert(rows(1L)._6 == 3.0)
    assert(rows(1L)._2.contains(2.0) && rows(2L)._2.contains(3.0))
    assert(rows(3L)._2.isEmpty) // no r=4 class → no estimate, not 0
    // and on the real corpus the identity Σ f_r (full table) = types
    val real = SparkEntry.queries("q275_vocab_richness")(spark, dir)
      .collect()
    assert(real.nonEmpty && real.forall(_.getAs[Double]("chao1") >=
      real.head.getAs[Long]("types").toDouble))
  }

  test("q276 ablation: totals-minus-group equals a literal re-scan") {
    val out = SparkEntry.queries("q276_source_ablation")(spark, dir)
      .collect().map(r => r.getAs[String]("source") ->
        (r.getAs[Double]("excl_mean_chars"),
          r.getAs[Double]("excl_pass_rate"))).toMap
    val docs = graft.ops.OpsKit.tbl(spark, dir, "documents")
      .select(col("source"), col("n_chars")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    for ((src, (em, ep)) <- out) {
      val rest = docs.filter(_._1 != src)
      val emRe = rest.map(_._2).sum.toDouble / rest.size.toDouble
      val epRe = rest.count(_._2 >= 200).toDouble / rest.size.toDouble
      assert(math.abs(em - emRe) < 1e-9, s"$src mean")
      assert(math.abs(ep - epRe) < 1e-12, s"$src pass")
    }
  }

  test("q277 join-size: truth is the exact sum of squared key counts") {
    val r = SparkEntry.queries("q277_join_card_est")(spark, dir)
      .collect().head
    val counts = graft.ops.OpsKit.events(spark, dir)
      .groupBy(col("user_id")).agg(count(lit(1)).as("c"))
      .collect().map(_.getAs[Long]("c"))
    assert(r.getAs[Long]("true_pairs") == counts.map(c => c * c).sum)
    assert(r.getAs[Long]("n_users") == counts.length.toLong)
    assert(r.getAs[Long]("max_user_events") == counts.max)
    // the estimator is exact when every user in a bucket has the same
    // count; in general it must stay within the worst-bucket bound —
    // here just sanity: positive and within 10× of truth on this data
    val est = r.getAs[Double]("est_pairs")
    assert(est > 0 && est < 10.0 * r.getAs[Long]("true_pairs"))
  }

  test("q278 Bloom: no false negatives, confusion counts consistent") {
    val r = SparkEntry.queries("q278_bloom_antijoin")(spark, dir)
      .collect().head
    // the Bloom guarantee: every true member passes
    assert(r.getAs[Long]("n_true_pass") == r.getAs[Long]("n_true_members"))
    assert(r.getAs[Long]("n_bloom_pass") ==
      r.getAs[Long]("n_true_pass") + r.getAs[Long]("n_false_pos"))
    // independent ground truth for membership
    val flagged = graft.ops.OpsKit.tbl(spark, dir, "orders")
      .filter(col("o_totalprice") > 400000.0)
      .select(col("o_orderkey")).collect().map(_.getLong(0)).toSet
    val cand = graft.ops.OpsKit.tbl(spark, dir, "lineitem")
      .select(col("l_orderkey")).distinct()
      .collect().map(_.getLong(0))
    assert(r.getAs[Long]("n_candidates") == cand.length.toLong)
    assert(r.getAs[Long]("n_true_members") ==
      cand.count(flagged.contains).toLong)
    assert(r.getAs[Long]("bits_set") <= 8192L)
  }
}
