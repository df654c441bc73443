package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Space-saving heavy-hitters buffer: parallel arrays instead of a Map so
  * the buffer stays a product type (tungsten row encoding, no kryo blob). */
case class TopKBuf(toks: Array[String], counts: Array[Long])

/** Top-k result: tokens and their counts, rank order. */
case class TopKOut(top_toks: Array[String], top_counts: Array[Long])

/** Space-saving top-k heavy hitters as a typed
  * [[org.apache.spark.sql.expressions.Aggregator]] — the custom-aggregate
  * extension surface (registered with `functions.udaf`, runs inside a
  * regular hash aggregate with map-side partial aggregation).
  *
  * Why an Aggregator and not built-ins: a one-pass bounded-memory top-k
  * over an unbounded key domain is not expressible with native aggregate
  * functions — `count + window rank` materializes EVERY distinct key
  * (fine at sf0.1, not against a 100 TB token stream), while this buffer
  * holds at most `cap` counters per group per partition, the
  * Metwally/Agrawal/El Abbadi space-saving summary (VLDB'05 — public
  * algorithm). Merges credit keys absent from a full buffer with that
  * buffer's minimum counter (the upper bound on what eviction could have
  * erased) before summing and re-truncating to `cap` — the standard
  * mergeable-summary treatment, which preserves the never-underestimate
  * invariant across arbitrary merge trees.
  *
  * Determinism contract: while the stream's distinct-key count stays
  * ≤ cap, no eviction ever fires, merge truncation never triggers, and
  * the result is EXACT regardless of partitioning — which is what the
  * DuckDB oracle checks (the synthetic vocabulary is far under cap=64).
  * Past cap the summary degrades to the documented ±(n/cap) error bound
  * instead of failing. All ties break (count desc, token asc) so even
  * exact results have one canonical order.
  */
class SpaceSavingTopK(cap: Int, k: Int)
    extends Aggregator[String, TopKBuf, TopKOut] {

  override def zero: TopKBuf = TopKBuf(Array.empty, Array.empty)

  override def reduce(b: TopKBuf, tok: String): TopKBuf = {
    val i = b.toks.indexOf(tok)
    if (i >= 0) { b.counts(i) += 1L; b }
    else if (b.toks.length < cap)
      TopKBuf(b.toks :+ tok, b.counts :+ 1L)
    else {
      // space-saving eviction: the new key inherits the smallest counter
      // + 1 (overestimates, never underestimates a heavy hitter); tie on
      // count evicts the lexicographically largest token — any fixed rule
      // works, it just has to be a total order
      var mi = 0
      var j = 1
      while (j < b.counts.length) {
        if (b.counts(j) < b.counts(mi) ||
          (b.counts(j) == b.counts(mi) && b.toks(j) > b.toks(mi))) mi = j
        j += 1
      }
      b.toks(mi) = tok
      b.counts(mi) += 1L
      b
    }
  }

  override def merge(a: TopKBuf, b: TopKBuf): TopKBuf = {
    // absent-key credit: a key missing from a FULL buffer may have been
    // evicted after counting up to that buffer's minimum counter, so it
    // is credited that minimum — the standard mergeable-summary merge,
    // and what keeps the never-underestimate invariant true ACROSS
    // merges (a plain sum-and-truncate can drop a key in an intermediate
    // merge and then under-report it later). A buffer under cap has
    // evicted nothing: absent there truly means zero, which is why the
    // under-cap regime stays exact (the q67 oracle contract).
    val creditA = if (a.toks.length < cap) 0L else a.counts.min
    val creditB = if (b.toks.length < cap) 0L else b.counts.min
    val cb = b.toks.zip(b.counts).toMap
    val m = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    var i = 0
    while (i < a.toks.length) {
      m.update(a.toks(i), a.counts(i) + cb.getOrElse(a.toks(i), creditB))
      i += 1
    }
    i = 0
    while (i < b.toks.length) {
      if (!m.contains(b.toks(i)))
        m.update(b.toks(i), creditA + b.counts(i))
      i += 1
    }
    val kept = m.toArray.sortBy { case (t, c) => (-c, t) }.take(cap)
    TopKBuf(kept.map(_._1), kept.map(_._2))
  }

  override def finish(r: TopKBuf): TopKOut = {
    val top = r.toks.zip(r.counts).sortBy { case (t, c) => (-c, t) }.take(k)
    TopKOut(top.map(_._1), top.map(_._2))
  }

  override def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
  override def outputEncoder: Encoder[TopKOut] = Encoders.product[TopKOut]
}
