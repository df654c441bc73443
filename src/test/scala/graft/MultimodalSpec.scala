package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.MultimodalOps

/** The typed mapPartitions decode pipeline must agree with the declarative
  * q37 layer on every shared field — payload handling, modality routing,
  * and the stub decode are the same contract in both shapes. */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("typed extractMeta agrees with declarative q37 on all rows") {
    val typed = MultimodalOps.extractMeta(
      MultimodalOps.mediaFromDocuments(spark, dir))
      .collect().map(m => m.doc_id ->
        (m.modality, m.n_bytes.toLong, m.width.toLong, m.height.toLong,
          m.frames.toLong)).toMap

    val declarative = MultimodalOps.all.head.fn(spark, dir)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("modality"), r.getAs[Long]("n_bytes"),
          r.getAs[Long]("width"), r.getAs[Long]("height"),
          r.getAs[Long]("frames"))).toMap

    assert(typed.nonEmpty)
    assert(typed == declarative)
  }

  test("payload round-trips utf-8 bytes") {
    val r = MultimodalOps.mediaFromDocuments(spark, dir).head()
    assert(new String(r.payload, "UTF-8").nonEmpty)
  }
}
