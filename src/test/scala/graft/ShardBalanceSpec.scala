package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q109's contract: snake assignment balances shard TOKEN totals, and
  * every document lands in exactly one shard. */
class ShardBalanceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.01"

  test("snake shards balance token totals within 2%") {
    val assigned = SparkEntry.queries("q109_shard_assign")(spark, dir)
    val totals = assigned.groupBy(col("shard"))
      .agg(sum(col("n_tokens")).as("tok"), count(lit(1)).as("docs"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(totals.length == 8, s"expected 8 shards, got ${totals.length}")
    val toks = totals.map(_._2.toDouble)
    val spread = (toks.max - toks.min) / (toks.sum / toks.length)
    assert(spread < 0.02, s"token spread $spread >= 2%: ${totals.toSeq}")
    // exactly one shard per doc, no doc dropped
    val n = graft.ops.OpsKit.tbl(spark, dir, "documents").count()
    assert(assigned.count() == n)
    assert(assigned.select(col("doc_id")).distinct().count() == n)
  }
}
