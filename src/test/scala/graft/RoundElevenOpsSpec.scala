package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-11 additions (q260–q265): scalar re-derivations and internal
  * invariants on top of the DuckDB hash gate — the gate proves
  * Spark == DuckDB, these prove both equal the textbook formula.
  */
class RoundElevenOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("q260 t-closeness matches a BigInt re-derivation per class") {
    val got = SparkEntry.queries("q260_t_closeness")(spark, dir)
      .collect()
      .map(r => (r.getInt(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4), r.getBoolean(5)))
      .toMap
    val cust = spark.read.parquet(s"$dir/customer.parquet")
      .select(col("c_nationkey"), col("c_mktsegment"),
        floor(col("c_acctbal") / lit(1000.0)).cast("long").as("band"))
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    val n = BigInt(cust.length)
    val global = cust.groupBy(_._3).map { case (b, xs) =>
      b -> BigInt(xs.length)
    }
    for (((nat, seg), rows) <- cust.groupBy(c => (c._1, c._2))) {
      val s = BigInt(rows.length)
      val byBand = rows.groupBy(_._3).map { case (b, xs) =>
        b -> BigInt(xs.length)
      }
      val num = global.map { case (b, g) =>
        (byBand.getOrElse(b, BigInt(0)) * n - g * s).abs
      }.sum
      val t = num.toDouble / (2.0 * s.toDouble * n.toDouble)
      val (cs, nb, tv, tc) = got((nat, seg))
      assert(cs == rows.length && nb == byBand.size)
      assert(math.abs(tv - t) < 1e-12, s"class ($nat,$seg): $tv vs $t")
      assert(tc == (tv <= 0.2))
    }
    assert(got.size == cust.map(c => (c._1, c._2)).distinct.length)
  }

  test("q261 exact ball sizes match a scalar BFS on the same edge set") {
    val got = SparkEntry.queries("q261_hyperanf")(spark, dir)
      .collect()
      .map(r => r.getInt(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5)))
      .toMap
    assert(got.keySet == Set(1, 2, 3))
    val corpus = graft.ops.LlmKit.corpusWithNearDups(spark, dir)
      .select(col("doc_id")).collect().map(_.getLong(0))
    val pairs = graft.ops.LlmKit
      .lshCandidatePairs(graft.ops.LlmKit.corpusWithNearDups(spark, dir))
      .select(col("id1"), col("id2")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val adj = scala.collection.mutable.Map
      .empty[Long, Set[Long]].withDefaultValue(Set.empty)
    for (v <- corpus) adj(v) = adj(v) + v
    for ((a, b) <- pairs) { adj(a) += b; adj(b) += a }
    var balls: Map[Long, Set[Long]] = corpus.map(v => v -> adj(v)).toMap
    for (r <- 1 to 3) {
      val (nn, exact, est, avg, ratio) = got(r)
      assert(nn == corpus.length.toLong)
      assert(exact == balls.values.map(_.size.toLong).sum,
        s"radius $r exact pairs")
      assert(math.abs(avg - exact.toDouble / nn) < 1e-12)
      assert(math.abs(ratio - est / exact.toDouble) < 1e-9)
      balls = balls.map { case (v, b) =>
        v -> b.flatMap(u => adj(u))
      }
    }
    // neighborhood function is monotone in the radius
    assert(got(1)._2 <= got(2)._2 && got(2)._2 <= got(3)._2)
    assert(got(1)._2 >= corpus.length) // every ball holds at least self
  }

  test("q269 harmonic centrality matches the scalar BFS telescoping sum") {
    val got = SparkEntry.queries("q269_harmonic_centrality")(spark, dir)
      .collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4),
          r.getDouble(5)))
      .toMap
    val corpus = graft.ops.LlmKit.corpusWithNearDups(spark, dir)
      .select(col("doc_id")).collect().map(_.getLong(0))
    val pairs = graft.ops.LlmKit
      .lshCandidatePairs(graft.ops.LlmKit.corpusWithNearDups(spark, dir))
      .select(col("id1"), col("id2")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val adj = scala.collection.mutable.Map
      .empty[Long, Set[Long]].withDefaultValue(Set.empty)
    for (v <- corpus) adj(v) = adj(v) + v
    for ((a, b) <- pairs) { adj(a) += b; adj(b) += a }
    assert(got.keySet == corpus.toSet)
    for (v <- corpus) {
      val ball1 = adj(v)
      val ball2 = ball1.flatMap(adj)
      val ball3 = ball2.flatMap(adj)
      val (s1, s2, s3, hcExact, hcEst) = got(v)
      assert(s1 == ball1.size && s2 == ball2.size && s3 == ball3.size,
        s"node $v ball sizes")
      val want = (s1 - 1).toDouble + (s2 - s1).toDouble / 2.0 +
        (s3 - s2).toDouble / 3.0
      assert(math.abs(hcExact - want) < 1e-12)
      // isolated nodes: every HC form is exactly zero (est uses e0=1
      // and all three register folds of a singleton are identical)
      if (ball3.size == 1) assert(hcExact == 0.0 && hcEst == 0.0)
    }
  }

  test("q262 IVM terms partition the full view and certify consistent") {
    val rows = SparkEntry.queries("q262_ivm_join")(spark, dir)
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getBoolean(3), r.getBoolean(4)))
      .toMap
    assert(rows.keySet == Set("view_old", "delta_orders_x_old_cust",
      "old_orders_x_delta_cust", "delta_x_delta", "view_full"))
    assert(rows.values.forall(v => v._3 && v._4),
      "IVM count/sum certification must hold")
    val parts = rows.collect {
      case (k, v) if k != "view_full" => v
    }
    assert(parts.map(_._1).sum == rows("view_full")._1)
    assert(math.abs(parts.map(_._2).sum - rows("view_full")._2) < 1e-6)
    // scalar witness: full view size from raw rows
    val orders = spark.read.parquet(s"$dir/orders.parquet")
      .select("o_custkey").collect().map(_.getLong(0))
    val custs = spark.read.parquet(s"$dir/customer.parquet")
      .select("c_custkey").collect().map(_.getLong(0)).toSet
    assert(rows("view_full")._1 == orders.count(custs.contains))
  }

  test("q263 importance scores match a BigInt re-derivation") {
    val got = SparkEntry.queries("q263_importance_select")(spark, dir)
      .collect()
      .map(r => r.getLong(0) ->
        (r.getLong(3), r.getDouble(4), r.getBoolean(5), r.getBoolean(6)))
      .toMap
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("lang"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    // re-derive the bucket table with the engine's own md5 hash (the
    // portable-hash contract is pinned elsewhere; here we reuse it)
    import spark.implicits._
    val hashed = docs.flatMap { case (id, lang, text) =>
        text.split(" ", -1).map(t => (id, lang, t))
      }.toSeq.toDF("doc_id", "lang", "tok")
      .select(col("doc_id"), col("lang"),
        pmod(graft.ops.LlmKit.strHash(col("tok")), lit(64)).as("f"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val rcnt = hashed.groupBy(_._3).map { case (f, xs) =>
      f -> BigInt(xs.length)
    }
    val tcnt = hashed.filter(_._2 == "en").groupBy(_._3).map {
      case (f, xs) => f -> BigInt(xs.length)
    }
    val nr = BigInt(hashed.length)
    val nt = BigInt(hashed.count(_._2 == "en"))
    for ((id, toks) <- hashed.groupBy(_._1)) {
      val byF = toks.groupBy(_._3).map { case (f, xs) =>
        f -> BigInt(xs.length)
      }
      val num = byF.map { case (f, c) =>
        c * (tcnt.getOrElse(f, BigInt(0)) + 1)
      }.sum * (nr + 64)
      val den = byF.map { case (f, c) => c * (rcnt(f) + 1) }.sum *
        (nt + 64)
      val (ntk, score, leaning, resampled) = got(id)
      assert(ntk == toks.length.toLong)
      assert(math.abs(score - num.toDouble / den.toDouble) < 1e-12,
        s"doc $id")
      assert(leaning == (num > den))
      // the deterministic draw makes score ≥ 2 a certain keep
      if (score >= 2.0) assert(resampled, s"doc $id: w>=2 must resample")
    }
  }

  test("q264 weights reconcile with m/u re-estimated from the output") {
    val rows = SparkEntry.queries("q264_fellegi_sunter")(spark, dir)
      .collect()
      .map(r => (r.getBoolean(2),
        Seq(r.getBoolean(3), r.getBoolean(4), r.getBoolean(5),
          r.getBoolean(6)),
        r.getDouble(7), r.getBoolean(8)))
    assert(rows.nonEmpty)
    val m = rows.count(_._1).toLong
    val u = rows.count(!_._1).toLong
    val am = (0 until 4).map(k => rows.count(r => r._1 && r._2(k)).toLong)
    val au = (0 until 4).map(k => rows.count(r => !r._1 && r._2(k)).toLong)
    for ((isM, a, w, pred) <- rows) {
      val want = (0 until 4).map { k =>
        if (a(k)) ((am(k) + 1) * (u + 2)).toDouble /
          ((au(k) + 1) * (m + 2)).toDouble
        else ((m - am(k) + 1) * (u + 2)).toDouble /
          ((u - au(k) + 1) * (m + 2)).toDouble
      }.foldLeft(1.0)(_ * _)
      assert(math.abs(w - want) < 1e-9 * math.max(1.0, want.abs))
      assert(pred == (w > 2.0)) // r12: reachable decision cut (was 8)
    }
    // the planted dups must separate IN AGGREGATE: the median match
    // weight exceeds the median non-match weight (per-pair dominance is
    // too strong — a planted dup disagrees on tok0 by construction)
    val nonM = rows.filter(!_._1).map(_._3).sorted
    val isM = rows.filter(_._1).map(_._3).sorted
    if (isM.nonEmpty && nonM.nonEmpty)
      assert(isM(isM.length / 2) > nonM(nonM.length / 2))
  }

  test("q266 DP release: mechanism bounds, clamping, and determinism") {
    def collectRelease() =
      SparkEntry.queries("q266_dp_release")(spark, dir).collect()
        .map(r => (r.getInt(0), r.getString(1)) ->
          (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
        .toMap
    val got = collectRelease()
    // true counts re-derived scalar-side
    val want = spark.read.parquet(s"$dir/customer.parquet")
      .select(col("c_nationkey"), col("c_mktsegment")).collect()
      .map(r => (r.getInt(0), r.getString(1)))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    assert(got.keySet == want.keySet)
    for ((k, (t, noise, rel, err)) <- got) {
      assert(t == want(k))
      assert(noise >= -24 && noise <= 24) // Binomial(48,½) − 24 support
      assert(rel == math.max(0L, t + noise))
      assert(err == math.abs(rel - t))
    }
    // the md5 coin pool makes the release DETERMINISTIC: same classes,
    // same noise, run to run
    assert(collectRelease() == got)
    // and the noise is not degenerate (some class got nonzero noise)
    assert(got.values.exists(_._2 != 0L))
  }

  test("q267 DBSCAN roles reconcile with a scalar union-find") {
    val got = SparkEntry.queries("q267_dbscan")(spark, dir).collect()
      .map { r =>
        r.getLong(0) -> (r.getString(1),
          if (r.isNullAt(2)) None else Some(r.getLong(2)))
      }.toMap
    val pairs = graft.ops.LlmKit
      .lshCandidatePairs(graft.ops.LlmKit.corpusWithNearDups(spark, dir))
      .select(col("id1"), col("id2")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val nbrs = scala.collection.mutable.Map
      .empty[Long, Set[Long]].withDefaultValue(Set.empty)
    for ((a, b) <- pairs) { nbrs(a) += b; nbrs(b) += a }
    val core = nbrs.filter(_._2.size >= 2).keySet.toSet
    // union-find over core-core edges, min-id representative
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    def union(a: Long, b: Long): Unit = {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    for ((a, b) <- pairs if core(a) && core(b)) union(a, b)
    for ((id, (role, rep)) <- got) role match {
      case "core" =>
        assert(core(id) && rep.contains(find(id)))
      case "border" =>
        assert(!core(id))
        val coreN = nbrs(id).filter(core)
        assert(coreN.nonEmpty && rep.contains(coreN.map(find).min))
      case "noise" =>
        assert(!core(id) && nbrs(id).forall(!core(_)) && rep.isEmpty)
      case other => fail(s"unknown role $other")
    }
    assert(got.values.exists(_._1 == "core"),
      "planted dups must produce core points")
  }

  test("q268 DM/IPS/DR reconcile with a scalar re-derivation") {
    val r = SparkEntry.queries("q268_dr_offpolicy")(spark, dir)
      .collect().head
    val (vDm, vIps, corr, vDr) =
      (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))
    assert(math.abs(vDr - (vDm + corr)) < 1e-12,
      "DR must equal DM + correction by construction")
    // scalar re-derivation with dsum's 6-decimal grid
    def d6(x: Double): BigDecimal =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val ev = graft.ops.OpsKit.events(spark, dir)
      .select(col("event_id"), col("event_type"), col("value"))
      .collect()
      .map(x => (x.getLong(0), x.getString(1), x.getDouble(2)))
    val modelHalf = ev.filter(_._1 % 2 == 0)
    val evalHalf = ev.filter(_._1 % 2 == 1)
    val qhat = modelHalf.groupBy(_._2).map { case (a, xs) =>
      a -> (xs.map(x => d6(x._3)).sum.toDouble / xs.length)
    }
    val nE = evalHalf.length
    val target = Set("click", "purchase")
    val byA = evalHalf.groupBy(_._2)
    def w(a: String, na: Int): Double =
      if (target(a)) 0.5 * nE.toDouble / na else 0.0
    // the query inner-joins model→eval, so only actions seen in BOTH
    // halves contribute to every term
    val wantDm = qhat.toSeq.filter(x => byA.contains(x._1)).map {
      case (a, q) => d6(if (target(a)) 0.5 * q else 0.0)
    }.sum.toDouble
    val wantResid = byA.filter(x => qhat.contains(x._1)).toSeq.map {
      case (a, xs) =>
        val sr = xs.map(x => d6(x._3)).sum.toDouble
        d6((sr - xs.length.toDouble * qhat(a)) * w(a, xs.length))
    }.sum.toDouble
    assert(math.abs(vDm - wantDm) < 1e-6, s"$vDm vs $wantDm")
    assert(math.abs(corr - wantResid / nE) < 1e-6)
    assert(r.getLong(0) == modelHalf.length.toLong)
    assert(r.getLong(1) == nE.toLong)
    // IPS from the eval half alone
    val wantIps = byA.filter(x => qhat.contains(x._1)).toSeq.map {
      case (a, xs) =>
        d6(xs.map(x => d6(x._3)).sum.toDouble * w(a, xs.length))
    }.sum.toDouble / nE
    assert(math.abs(vIps - wantIps) < 1e-6)
  }

  test("q271 removal effects match a scalar chain replay on the grid") {
    val got = SparkEntry.queries("q271_markov_attribution")(spark, dir)
      .collect()
      .map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    val channels = Seq("signup", "error", "click", "view")
    assert(got.keySet == channels.toSet)
    def d6(x: Double): BigDecimal =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    // journeys from raw events, truncated at first purchase
    val ev = graft.ops.OpsKit.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type")).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getLong(2),
        r.getString(3)))
    val trans = scala.collection.mutable.Map
      .empty[(String, String), Long].withDefaultValue(0L)
    for ((_, evs) <- ev.groupBy(_._1)) {
      val ordered = evs.sortBy(e => (e._2, e._3)).map(_._4)
      val cut = ordered.indexOf("purchase") match {
        case -1 => ordered.toSeq
        case i => ordered.take(i + 1).toSeq
      }
      val path = "START" +: cut.map(t =>
        if (t == "purchase") "CONV" else t)
      val full = if (path.last == "CONV") path else path :+ "DROP"
      full.sliding(2).foreach { case Seq(a, b) =>
        trans((a, b)) += 1L
      }
    }
    val tot = trans.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val pBase = trans.map { case ((a, b), c) =>
      (a, b) -> c.toDouble / tot(a)
    }.toMap
    def converge(removed: Option[String]): Double = {
      val p = scala.collection.mutable.Map
        .empty[(String, String), BigDecimal].withDefaultValue(BigDecimal(0))
      for (((a, b), pr) <- pBase if !removed.contains(a)) {
        val b2 = if (removed.contains(b)) "DROP" else b
        p((a, b2)) = p((a, b2)) + d6(pr) // the query's dsum collapse
      }
      p(("CONV", "CONV")) = BigDecimal(1); p(("DROP", "DROP")) = BigDecimal(1)
      var v = Map[String, BigDecimal]("START" -> BigDecimal(1))
      for (_ <- 1 to 8) {
        val nv = scala.collection.mutable.Map
          .empty[String, Seq[BigDecimal]].withDefaultValue(Nil)
        for ((s0, m) <- v; ((a, b), pr) <- p if a == s0)
          nv(b) = nv(b) :+ d6(m.toDouble * pr.toDouble)
        v = nv.view.mapValues(_.sum).toMap
      }
      v.getOrElse("CONV", BigDecimal(0)).toDouble
    }
    val pFull = converge(None)
    for (c <- channels) {
      val (gf, gr, eff, _) = got(c)
      assert(math.abs(gf - pFull) < 1e-5, s"$c p_full $gf vs $pFull")
      val pRem = converge(Some(c))
      assert(math.abs(gr - pRem) < 1e-5, s"$c p_removed $gr vs $pRem")
      assert(math.abs(eff - math.max(0.0, 1.0 - gr / gf)) < 1e-12)
    }
    // shares sum to 1 when any removal bites (the denominator rides
    // dsum's 6-decimal grid, so exactness is grid-bounded)
    val shares = got.values.map(_._4).sum
    if (got.values.exists(_._3 > 0)) assert(math.abs(shares - 1.0) < 1e-5)
    // sanity: the chain converts at all (purchases exist)
    assert(pFull > 0.5, s"pFull $pFull — most users purchase early")
  }

  test("q270 theta AnotB reconciles with a scalar sketch replay") {
    val got = SparkEntry.queries("q270_sketch_anotb")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))
      .toMap
    val M = 1152921504606846976L
    val hs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("source"),
        explode(split(col("text"), " ")).as("tok"))
      .select(col("source"), graft.ops.LlmKit.strHash(col("tok")).as("h"))
      .distinct().collect().map(r => (r.getString(0), r.getLong(1)))
    val bySrc = hs.groupBy(_._1).view
      .mapValues(_.map(_._2).toSet).toMap
    val sketch = bySrc.view
      .mapValues(_.toSeq.sorted.take(32)).toMap
    for (((a, b), (exactA, exactDiff, nRet, est)) <- got) {
      assert(exactA == bySrc(a).size)
      assert(exactDiff == (bySrc(a) -- bySrc(b)).size)
      val thA = if (sketch(a).size < 32) M else sketch(a).max
      val thB = if (sketch(b).size < 32) M else sketch(b).max
      val th = math.min(thA, thB)
      val retained = sketch(a)
        .filter(h => h < th && !sketch(b).contains(h))
      assert(nRet == retained.size.toLong, s"pair ($a,$b)")
      assert(math.abs(est - nRet.toDouble * M.toDouble / th.toDouble)
        < 1e-6)
    }
    assert(got.nonEmpty)
    // the estimator is unbiased enough to track the exact difference
    // in aggregate: mean est within 50% of mean exact across pairs
    val meanEst = got.values.map(_._4).sum / got.size
    val meanExact = got.values.map(_._2.toDouble).sum / got.size
    assert(math.abs(meanEst - meanExact) <= 0.5 * meanExact)
  }

  test("q265 top-k rows are exact, ranked, and contiguous per window") {
    val rows = SparkEntry.queries("q265_stream_topk")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getLong(4), r.getLong(5), r.getBoolean(6)))
    assert(rows.nonEmpty)
    assert(rows.forall(_._7), "space-saving counts must be exact here")
    assert(rows.forall(r => r._5 == r._6))
    for ((_, ws) <- rows.groupBy(_._1)) {
      val ranks = ws.map(_._3).sorted.toSeq
      assert(ranks == (1L to ws.length.toLong).toSeq,
        s"ranks $ranks")
      // counts non-increasing in rank order; ties broken token-asc
      val ordered = ws.sortBy(_._3)
      assert(ordered.sliding(2).forall {
        case Array(a, b) =>
          a._5 > b._5 || (a._5 == b._5 && a._4 < b._4)
        case _ => true
      })
      assert(ws.map(_._2).distinct.length == 1) // one n per window
    }
  }
}
