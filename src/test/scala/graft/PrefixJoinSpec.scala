package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q120's completeness theorem, pinned in-repo (the driver's brute-force
  * DuckDB oracle proves it per run; this spec proves it per `sbt test`):
  * the prefix-filtered join must return EXACTLY the pairs a Spark-side
  * brute-force all-pairs scan finds at Jaccard ≥ 0.8 — the length and
  * positional filters may only drop pairs that provably cannot qualify.
  * Also checks the fixture is non-trivial (the planted near-dup corpus
  * yields matches) and every reported Jaccard is internally consistent.
  */
class PrefixJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("q120 equals Spark-side brute force (zero false negatives)") {
    import graft.ops.LlmKit
    val got = SparkEntry.queries("q120_prefix_simjoin")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.nonEmpty, "planted near-dup corpus produced no matches")
    assert(got.forall { case (_, _, j) => j >= 0.8 && j <= 1.0 })

    val toks = LlmKit.corpusWithNearDups(spark, dir)
      .select(col("doc_id"),
        array_sort(array_distinct(LlmKit.hashedShingles(col("text"))))
          .as("ts"))
    val a = toks.select(col("doc_id").as("id1"), col("ts").as("ts1"))
    val b = toks.select(col("doc_id").as("id2"), col("ts").as("ts2"))
    val brute = a.join(b, col("id1") < col("id2"))
      .select(col("id1"), col("id2"),
        size(array_intersect(col("ts1"), col("ts2"))).cast("long").as("i"),
        size(col("ts1")).cast("long").as("n1"),
        size(col("ts2")).cast("long").as("n2"))
      .filter(col("i") * 5 >= (col("n1") + col("n2") - col("i")) * 4)
      .select(col("id1"), col("id2"),
        (col("i").cast("double") /
          (col("n1") + col("n2") - col("i")).cast("double")).as("jaccard"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))

    assert(got.toSet == brute.toSet,
      s"prefix join diverged from brute force: " +
        s"missing=${(brute.toSet -- got.toSet).take(3)} " +
        s"extra=${(got.toSet -- brute.toSet).take(3)}")
  }
}
