package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.LlmKit

/** q103's guarantee, checked directly: the split is constant within every
  * near-dup candidate pair (the property a per-document random split
  * violates), and all three splits actually materialize. */
class LeakFreeSplitSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("no LSH candidate pair crosses the q103 split") {
    val split = SparkEntry.queries("q103_leakfree_split")(spark, dir)
      .select(col("doc_id"), col("split")).cache()
    val pairs = LlmKit.lshCandidatePairs(
      LlmKit.corpusWithNearDups(spark, dir))
      .select(col("id1"), col("id2"))
    val crossing = pairs
      .join(split.select(col("doc_id").as("id1"), col("split").as("s1")),
        Seq("id1"))
      .join(split.select(col("doc_id").as("id2"), col("split").as("s2")),
        Seq("id2"))
      .filter(col("s1") =!= col("s2"))
    assert(crossing.count() == 0, "a near-dup pair crosses the split")

    val counts = split.groupBy(col("split")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(Set("train", "val", "test").subsetOf(counts.keySet),
      s"a split bucket is empty: $counts")
    assert(counts("train") > counts("val") &&
      counts("train") > counts("test"), s"80/10/10 shape lost: $counts")
  }
}
