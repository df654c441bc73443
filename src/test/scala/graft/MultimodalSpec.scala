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

  test("frame sampling strides the stub frame count, videos only") {
    val media = MultimodalOps.mediaFromDocuments(spark, dir)
    val frames = MultimodalOps.sampleFrames(media, everyN = 4).collect()
    assert(frames.nonEmpty)
    // only sampled indices appear, and every index is a stride multiple
    assert(frames.forall(_.frame_idx % 4 == 0))
    // per-doc frame rows == ceil(frames/4) of the stub frame count
    val metaFrames = MultimodalOps.extractMeta(media)
      .filter(_.modality == "video").collect()
      .map(m => m.doc_id -> m.frames).toMap
    val got = frames.groupBy(_.doc_id).map { case (k, v) => k -> v.length }
    assert(got == metaFrames.map { case (k, n) => k -> ((n + 3) / 4) })
    // slices are bounded payload windows
    assert(frames.forall(f => f.payload_slice.length <= 16))
  }

  test("media embeddings are unit-scale histograms usable by the ANN ops") {
    import org.apache.spark.sql.functions._
    val emb = MultimodalOps.embedMedia(
      MultimodalOps.mediaFromDocuments(spark, dir))
    val df = emb.toDF()
    assert(df.count() > 0)
    // the embedding column feeds the same native cosine path as q31
    val self = df.select(
      graft.ops.LlmKit.cosine(col("embedding"), col("embedding")).as("c"))
    // self-cosine == 1 exactly for any nonzero vector
    assert(self.filter(col("c") < 0.999999).count() == 0)
  }
}
