package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** KLL sketch buffer as a product type (tungsten row encoding, no kryo
  * blob): per-level value buffers with slack capacity + fill lengths,
  * per-level compaction counters (they seed the deterministic coin), and
  * the exact stream count. Level `l` items carry implicit weight `2^l`;
  * total weight is ALWAYS exactly `n` (compaction promotes an even count
  * of weight-w items as half as many weight-2w items, and an odd
  * straggler keeps its level — weight is conserved, never resampled).
  */
case class KllBuf(
    levels: Array[Array[Double]],
    lens: Array[Int],
    compactions: Array[Long],
    n: Long)

/** Quantile estimates at the requested fractions + the exact count. */
case class KllOut(est: Array[Double], n: Long)

/** Mergeable rank-quantile sketch as a typed
  * [[org.apache.spark.sql.expressions.Aggregator]] — the
  * Karnin–Lang–Liberty (KLL) sketch (FOCS 2016 — public algorithm; the
  * design also ships in Apache DataSketches).
  *
  * Why an Aggregator and not built-ins: exact percentiles (q50) need a
  * full shuffle of every value and `percentile` buffers a whole group in
  * memory; a binned histogram (q108) needs a bin width chosen before
  * seeing the data. The KLL sketch is the actual 100-TB quantile path:
  * O(k·log(n/k)) memory, mergeable across arbitrary partition trees
  * (partial aggregation works), ε ≈ O(1/k) guaranteed NORMALIZED RANK
  * error with no prior knowledge of the value range.
  *
  * Structure: a ladder of buffers; level l holds items of weight 2^l.
  * Inserts land in level 0; a level reaching its capacity is sorted and
  * every other item (starting at a coin offset) is promoted to the level
  * above — halving the count, doubling the weight. Capacities decay
  * geometrically below the top level (c = 2/3, floor 8), so total space
  * is ~k/(1−c).
  *
  * Determinism contract (the q196/q249 md5 trick): the compaction coin is
  * a bit of md5(level, that level's compaction ordinal) — NOT a random
  * draw — so a fixed input partitioning reproduces the identical sketch
  * bit-for-bit, which is what lets q254 sit behind the driver's hash
  * gate. Across DIFFERENT partitionings the sketch differs (merge trees
  * differ) but the rank-error bound holds for each — KllSpec asserts the
  * bound at 1, 7 and 32 partitions, and q254's output gates on the bound,
  * not on sketch internals.
  */
class KllQuantiles(k: Int, quantiles: Array[Double])
    extends Aggregator[Double, KllBuf, KllOut] {
  require(k >= 8, s"k must be >= 8, got $k")
  require(quantiles.forall(q => q >= 0.0 && q <= 1.0), "quantiles in [0,1]")

  override def zero: KllBuf =
    KllBuf(Array(Array.empty[Double]), Array(0), Array(0L), 0L)

  /** Capacity of `level` in a ladder currently `numLevels` tall: top
    * level k, each level below it ×(2/3), floored at 8. */
  private def capOf(level: Int, numLevels: Int): Int =
    math.max(8, math.ceil(
      k * math.pow(2.0 / 3.0, (numLevels - 1 - level).toDouble)).toInt)

  private def coin(level: Int, ordinal: Long): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(s"kll:$level:$ordinal".getBytes("UTF-8"))
    md(0) & 1
  }

  private def ensureCapacity(b: KllBuf, level: Int, extra: Int): KllBuf = {
    var r = b
    while (level >= r.levels.length)
      r = KllBuf(r.levels :+ Array.empty[Double], r.lens :+ 0,
        r.compactions :+ 0L, r.n)
    val buf = r.levels(level)
    val need = r.lens(level) + extra
    if (buf.length < need) {
      val grown = new Array[Double](math.max(need, math.max(16, buf.length * 2)))
      System.arraycopy(buf, 0, grown, 0, r.lens(level))
      r.levels(level) = grown
    }
    r
  }

  /** Sort level `l`, promote every other item (coin offset) one level up
    * with doubled weight, cascade upward while any level overflows. An
    * odd straggler (the post-coin tail element) stays at level l. */
  private def compact(b0: KllBuf, l: Int): KllBuf = {
    var b = b0
    val sz = b.lens(l)
    if (sz < 2) return b
    val buf = b.levels(l)
    java.util.Arrays.sort(buf, 0, sz)
    val c = coin(l, b.compactions(l))
    val even = sz - (sz % 2)
    // promote indices c, c+2, … within the even prefix; if sz is odd the
    // last (largest) item stays behind at level l with its weight
    val nPromote = even / 2
    b = ensureCapacity(b, l + 1, nPromote)
    val up = b.levels(l + 1)
    var i = 0
    while (i < nPromote) {
      up(b.lens(l + 1) + i) = buf(c + 2 * i)
      i += 1
    }
    b.lens(l + 1) += nPromote
    if (sz % 2 == 1) { buf(0) = buf(sz - 1); b.lens(l) = 1 }
    else b.lens(l) = 0
    b.compactions(l) += 1
    if (b.lens(l + 1) >= capOf(l + 1, b.levels.length)) compact(b, l + 1)
    else b
  }

  override def reduce(b0: KllBuf, x: Double): KllBuf = {
    var b = ensureCapacity(b0, 0, 1)
    b.levels(0)(b.lens(0)) = x
    b.lens(0) += 1
    b = b.copy(n = b.n + 1)
    if (b.lens(0) >= capOf(0, b.levels.length)) compact(b, 0) else b
  }

  override def merge(a: KllBuf, c: KllBuf): KllBuf = {
    if (a.n == 0) return c
    if (c.n == 0) return a
    val levels = math.max(a.levels.length, c.levels.length)
    var m = KllBuf(Array.fill(levels)(Array.empty[Double]),
      Array.fill(levels)(0), Array.fill(levels)(0L), a.n + c.n)
    var l = 0
    while (l < levels) {
      val la = if (l < a.levels.length) a.lens(l) else 0
      val lc = if (l < c.levels.length) c.lens(l) else 0
      m = ensureCapacity(m, l, la + lc)
      if (la > 0) System.arraycopy(a.levels(l), 0, m.levels(l), 0, la)
      if (lc > 0) System.arraycopy(c.levels(l), 0, m.levels(l), la, lc)
      m.lens(l) = la + lc
      // compaction ordinals accumulate across merges so post-merge coins
      // keep advancing deterministically rather than replaying offset 0
      m.compactions(l) =
        (if (l < a.compactions.length) a.compactions(l) else 0L) +
        (if (l < c.compactions.length) c.compactions(l) else 0L)
      l += 1
    }
    l = 0
    while (l < m.levels.length) {
      if (m.lens(l) >= capOf(l, m.levels.length)) m = compact(m, l)
      l += 1
    }
    m
  }

  override def finish(b: KllBuf): KllOut = {
    if (b.n == 0) return KllOut(quantiles.map(_ => Double.NaN), 0L)
    // materialize (value, weight) pairs, sort by value, walk cumulative
    // weight: estimate(q) = smallest value whose cumulative weight
    // reaches ceil(q·n) — total weight is exactly n by construction
    val total = (0 until b.levels.length).map(l => b.lens(l)).sum
    val vals = new Array[Double](total)
    val wts = new Array[Long](total)
    var idx = 0
    var l = 0
    while (l < b.levels.length) {
      val w = 1L << l
      var i = 0
      while (i < b.lens(l)) {
        vals(idx) = b.levels(l)(i); wts(idx) = w; idx += 1; i += 1
      }
      l += 1
    }
    val order = (0 until total).sortBy(vals(_))
    val est = quantiles.map { q =>
      val target = math.max(1L, math.ceil(q * b.n).toLong)
      var cum = 0L
      var j = 0
      var res = vals(order(total - 1))
      var found = false
      while (j < total && !found) {
        cum += wts(order(j))
        if (cum >= target) { res = vals(order(j)); found = true }
        j += 1
      }
      res
    }
    KllOut(est, b.n)
  }

  override def bufferEncoder: Encoder[KllBuf] = Encoders.product[KllBuf]
  override def outputEncoder: Encoder[KllOut] = Encoders.product[KllOut]
}
