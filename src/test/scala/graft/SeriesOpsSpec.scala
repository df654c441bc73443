package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q227–q229 (series + projection operators): scalar re-derivations of
  * ACF, SAX symbolization and the JL projection, including the md5 sign
  * matrix, over the collected sf0.001 rows.
  */
class SeriesOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def approx(a: Double, b: Double, tol: Double = 1e-9): Boolean =
    math.abs(a - b) <= tol * math.max(1.0, math.max(math.abs(a),
      math.abs(b)))

  /** densified hourly count series per event type. */
  private def series: Map[String, Array[Long]] = {
    val hs = graft.ops.OpsKit.events(spark, dir)
      .select(col("event_type"),
        expr("unix_micros(ts) div 3600000000").as("h"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    hs.groupBy(_._1).map { case (t, rows) =>
      val counts = rows.groupBy(_._2).map { case (h, g) => h -> g.size }
      val (h0, h1) = (counts.keys.min, counts.keys.max)
      t -> (h0 to h1).map(h => counts.getOrElse(h, 0).toLong).toArray
    }
  }

  test("q227 r_k matches a scalar autocorrelation for every lag") {
    val got = SparkEntry.queries("q227_acf_seasonality")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(3)).toMap
    val ss = series
    assert(got.keys.map(_._1).toSet == ss.keySet)
    for (((t, k), rk) <- got) {
      val x = ss(t).map(_.toDouble)
      val n = x.length
      val mu = x.sum / n
      val c0 = x.map(v => (v - mu) * (v - mu)).sum
      val ck = (0 until n - k.toInt)
        .map(i => (x(i) - mu) * (x(i + k.toInt) - mu)).sum
      assert(approx(rk, ck / c0, 1e-6), s"$t lag $k: got $rk want ${ck / c0}")
    }
  }

  test("q228 motifs match a scalar SAX symbolization") {
    val got = SparkEntry.queries("q228_sax_motifs")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val want = series.flatMap { case (t, xs) =>
      val n = xs.length
      val mu = xs.map(_.toDouble).sum / n
      val sd = math.sqrt(
        xs.map(v => (v - mu) * (v - mu)).sum / n)
      val syms = xs.map { v =>
        if (sd == 0.0) "b"
        else {
          val z = (v - mu) / sd
          if (z < -0.6745) "a" else if (z < 0.0) "b"
          else if (z < 0.6745) "c" else "d"
        }
      }
      syms.sliding(3).map(_.mkString).toSeq.groupBy(identity)
        .map { case (m, g) => (t, m) -> g.size.toLong }
    }
    assert(got == want)
    // motif mass per stream = n−2
    for ((t, xs) <- series)
      assert(got.collect { case ((`t`, _), c) => c }.sum == xs.length - 2)
  }

  test("q229 projection, distances and ratios match a scalar JL run") {
    val rows = SparkEntry.queries("q229_jl_distortion")(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))
      .toMap
    // scalar strHash: first 15 hex chars of md5, base-16 → long
    def strHash(s2: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s2.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16)
    }
    val emb = graft.ops.OpsKit.tbl(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"))
      .collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(x =>
          math.floor(x.toDouble * 1048576.0).toLong).toArray)
      .toMap
    val signs = Array.tabulate(64, 16) { (i, j) =>
      if (strHash(s"jl:$i:$j") % 2 == 0) 1L else -1L
    }
    def proj(q: Array[Long]): Array[Long] =
      Array.tabulate(16)(j => (0 until 64).map(i => signs(i)(j) * q(i)).sum)
    assert(rows.nonEmpty)
    for ((id1, (d2o, d2p, ratio, mad)) <- rows.take(50)) {
      val (qa, qb) = (emb(id1), emb(id1 + 1))
      val wantO = (0 until 64).map(i =>
        (qa(i) - qb(i)) * (qa(i) - qb(i))).sum
      val (ya, yb) = (proj(qa), proj(qb))
      val wantP = (0 until 16).map(j =>
        (ya(j) - yb(j)) * (ya(j) - yb(j))).sum
      assert(d2o == wantO && d2p == wantP, s"pair $id1")
      assert(approx(ratio, wantP.toDouble / (16.0 * wantO)))
      assert(mad >= 0.0 && mad < 0.6, s"mean |ratio-1| = $mad")
    }
  }
}
