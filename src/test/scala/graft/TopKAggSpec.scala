package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{SpaceSavingTopK, TopKBuf}

class TopKAggSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("space-saving semantics: never underestimates, counters sum to n") {
    val agg = new SpaceSavingTopK(2, 2)
    val stream = Seq("a", "a", "a", "b", "c", "a")
    val buf = stream.foldLeft(agg.zero)(agg.reduce)
    val out = agg.finish(buf)
    // 'a' (true count 4 > n/cap = 3) must survive eviction and lead
    assert(out.top_toks.head == "a")
    // space-saving overestimates, never underestimates
    assert(out.top_counts.head >= 4)
    // every reduce adds exactly 1, so counters always sum to n
    assert(buf.counts.sum == stream.length)
  }

  test("merge credits absent keys with the full buffer's min counter") {
    val agg = new SpaceSavingTopK(2, 2)
    // both buffers FULL (2 keys at cap 2): x absent from b could have
    // counted up to b's min (3) before eviction, so x is credited 3
    val a = TopKBuf(Array("x", "y"), Array(5L, 2L))
    val b = TopKBuf(Array("y", "z"), Array(3L, 4L))
    val m = agg.merge(a, b)
    assert(m.toks.length == 2)
    assert(m.toks.zip(m.counts).toMap == Map("x" -> 8L, "z" -> 6L))
    // under-cap buffers carry no credit: merge stays exact
    val e = agg.merge(TopKBuf(Array("x"), Array(5L)),
      TopKBuf(Array("y"), Array(3L)))
    assert(e.toks.zip(e.counts).toMap == Map("x" -> 5L, "y" -> 3L))
  }

  test("merge never underestimates a heavy hitter dropped mid-merge") {
    // the failure mode of naive sum-and-truncate: b is evicted in the
    // intermediate merge, then reappears — its final estimate must still
    // be >= its true total (4 + 6 = 10)
    val agg = new SpaceSavingTopK(2, 2)
    val m1 = agg.merge(TopKBuf(Array("a", "b"), Array(5L, 4L)),
      TopKBuf(Array("c", "d"), Array(5L, 4L)))
    val m2 = agg.merge(m1, TopKBuf(Array("b"), Array(6L)))
    val est = m2.toks.zip(m2.counts).toMap
    assert(est.getOrElse("b", Long.MaxValue) >= 10L)
  }

  test("q67 is partition-count invariant while vocabulary stays under cap") {
    val topk = udaf(new SpaceSavingTopK(64, 3))
    def run(parts: Int) =
      spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .repartition(parts)
        .select(col("source"), explode(split(col("text"), " ")).as("tok"))
        .groupBy(col("source"))
        .agg(topk(col("tok")).as("t"))
        .select(col("source"), col("t.top_toks"), col("t.top_counts"))
        .collect()
        .map(r => (r.getString(0), r.getSeq[String](1), r.getSeq[Long](2)))
        .sortBy(_._1)
        .toSeq
    assert(run(1) == run(8))
  }
}
