package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The hot-bucket guard in LlmKit.lshCandidatePairs: a degenerate LSH
  * bucket (k docs sharing a (band, bkey)) must not generate k²/2 candidate
  * pairs — the quadratic-straggler pattern a boilerplate-heavy crawl
  * produces — while recall on normal near-dup pairs stays untouched.
  */
class LshGuardSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  import graft.ops.LlmKit._

  /** Real docs plus a dropFirstToken near-dup of each — every base doc
    * has exactly one planted true pair. */
  private def normalCorpus = {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text")).limit(30)
    docs.unionByName(docs.select((col("doc_id") + 100000).as("doc_id"),
      dropFirstToken(col("text")).as("text")))
  }

  /** 200 byte-identical boilerplate docs: one signature, so one size-200
    * bucket in EVERY band — 19 900 pairs without the guard. */
  private def degenerate = {
    import spark.implicits._
    val boiler = "click here to accept cookies and continue to the site " +
      "terms of service apply all rights reserved contact us about help"
    (1 to 200).map(i => (1000000L + i, boiler)).toDF("doc_id", "text")
  }

  test("degenerate bucket is dropped; normal near-dup recall unchanged") {
    val normalPairs = lshCandidatePairs(normalCorpus)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(normalPairs.size >= 25, s"planted pairs missing: $normalPairs")

    val mixedPairs = lshCandidatePairs(normalCorpus.unionByName(degenerate))
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // not 19 900 + noise: every pair inside the degenerate bucket is gone
    assert(!mixedPairs.exists(p => p._1 > 1000000L && p._2 > 1000000L),
      "quadratic bucket leaked pairs past the cap")
    // and the guard cost no recall on the true pairs
    assert(mixedPairs == normalPairs,
      s"normal pairs changed: ${(mixedPairs diff normalPairs) ++ (normalPairs diff mixedPairs)}")
  }

  test("lshDroppedBuckets reports the 8 degenerate buckets") {
    val dropped = lshDroppedBuckets(normalCorpus.unionByName(degenerate))
      .collect()
    assert(dropped.length == 8, dropped.mkString(", "))
    assert(dropped.forall(_.getLong(2) == 200L), dropped.mkString(", "))
  }

  test("a planted near-cap bucket is kept AND bounds per-key join work") {
    import spark.implicits._
    // exactly MaxLshBucket identical docs: the largest bucket the cap
    // admits — one size-64 bucket per band, on top of the normal corpus
    val boiler = "lorem ipsum dolor sit amet consectetur adipiscing elit " +
      "sed do eiusmod tempor incididunt ut labore et dolore magna aliqua"
    val nearCap = (1 to MaxLshBucket).map(i => (2000000L + i, boiler))
      .toDF("doc_id", "text")
    val corpus = normalCorpus.unionByName(nearCap)
    // the guard's task-size invariant: after cappedBands NO surviving
    // (band, bkey) key exceeds the cap, so a band-join task's per-key
    // work is ≤ cap rows per side → ≤ cap² candidate combinations; with
    // a uniform bkey hash a shuffle partition is a sum of such bounded
    // keys, so no quadratic straggler task can exist whatever the corpus
    val maxBucket = cappedBands(shingleSigs(corpus))
      .groupBy(col("band"), col("bkey"))
      .agg(count(lit(1)).as("n"))
      .agg(max(col("n"))).head().getLong(0)
    assert(maxBucket <= MaxLshBucket, s"bucket of $maxBucket leaked past cap")
    // the near-cap bucket is KEPT: all C(64,2) identical-doc pairs emerge
    // (this is the recall side — the cap drops only degenerate buckets)
    val capPairs = lshCandidatePairs(corpus)
      .filter(col("id1") > 2000000L && col("id2") > 2000000L).count()
    assert(capPairs == MaxLshBucket.toLong * (MaxLshBucket - 1) / 2)
  }

  test("sub-cap buckets (exact duplicates under the cap) still pair") {
    import spark.implicits._
    // 5 identical docs — well under MaxLshBucket — must yield all C(5,2)
    // pairs at jaccard 1.0: the cap only removes degenerate buckets
    val five = (1 to 5).map(i => (i.toLong,
      "alpha beta gamma delta epsilon zeta eta theta iota kappa"))
      .toDF("doc_id", "text")
    assert(lshCandidatePairs(five).count() == 10)
  }
}
