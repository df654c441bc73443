package graft.ops

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling (LLM-pipeline surface): media payloads are
  * opaque BINARY columns + typed metadata, exactly how a 100 TB multimodal
  * corpus is laid out in parquet. Two layers:
  *
  *  - q37: the declarative layer — byte-level metadata extraction (size,
  *    modality routing, checksum, stub-decoded dimensions) as pure column
  *    expressions with a DuckDB oracle;
  *  - [[extractMeta]]: the typed mapPartitions layer a real decoder plugs
  *    into — the Spark-side plumbing (schema, batch iteration, partition
  *    routing) is real and tested; only [[decodeDims]] is a deterministic
  *    STUB because no image/audio codec ships in this environment.
  *
  * The payloads here are synthesized from `documents.text` bytes (the
  * testdata has no binary table) — the plumbing is payload-agnostic.
  */
object MultimodalOps {
  import OpsKit._

  final case class MediaRecord(doc_id: Long, modality: String,
      payload: Array[Byte])
  final case class MediaMeta(doc_id: Long, modality: String, n_bytes: Int,
      width: Int, height: Int, frames: Int)

  /** STUB decoder: a real implementation would parse the container header
    * (PNG/JPEG dims, WAV sample count, MP4 frame count). Deterministic
    * fake derived from the payload bytes so tests are exact. */
  def decodeDims(payload: Array[Byte]): (Int, Int) =
    (64 + (payload.length % 256), 64 + ((payload.length * 7) % 256))

  /** Typed decode pipeline: batch-iterates each partition once (the shape
    * a vectorized decoder needs), no shuffle — decode parallelism is
    * inherited from the scan partitioning. */
  def extractMeta(ds: Dataset[MediaRecord]): Dataset[MediaMeta] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.map { r =>
      val (w, h) = decodeDims(r.payload)
      val frames = if (r.modality == "video") (r.payload.length % 24) + 1 else 1
      MediaMeta(r.doc_id, r.modality, r.payload.length, w, h, frames)
    })
  }

  final case class FrameRecord(doc_id: Long, frame_idx: Int,
      payload_slice: Array[Byte])
  final case class MediaEmbedding(doc_id: Long, modality: String,
      embedding: Array[Float])

  /** Frame sampling: one output row per sampled frame index, stride
    * `everyN` — the explode-with-stride shape video pretraining pipelines
    * use (sample k-th frames, not all). flatMap keeps it partition-local
    * (no shuffle); the payload "slice" is a STUB byte window where a real
    * build would seek the container's frame offset. Frame count comes from
    * the same stub decode as [[extractMeta]], so the two layers agree. */
  def sampleFrames(ds: Dataset[MediaRecord], everyN: Int): Dataset[FrameRecord] = {
    import ds.sparkSession.implicits._
    ds.filter(_.modality == "video").flatMap { r =>
      val frames = (r.payload.length % 24) + 1
      (0 until frames by everyN).map { i =>
        val from = (i * 16) % math.max(r.payload.length, 1)
        val until = math.min(from + 16, r.payload.length)
        FrameRecord(r.doc_id, i, r.payload.slice(from, until))
      }
    }
  }

  /** Feature extraction: payload → fixed-width float vector. The vector
    * here is a deterministic byte-histogram STUB (a real encoder — CLIP,
    * wav2vec — plugs into the same mapPartitions slot); its output feeds
    * the ANN/similarity operators unchanged, which is the point: one
    * embedding column contract across text and media. */
  val EmbedDim = 8
  def embedMedia(ds: Dataset[MediaRecord]): Dataset[MediaEmbedding] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.map { r =>
      val v = new Array[Float](EmbedDim)
      var i = 0
      while (i < r.payload.length) {
        v(r.payload(i) & (EmbedDim - 1)) += 1f
        i += 1
      }
      val n = math.max(r.payload.length, 1).toFloat
      MediaEmbedding(r.doc_id, r.modality, v.map(_ / n))
    })
  }

  /** documents → MediaRecord dataset (payload = utf-8 bytes, modality
    * routed by size like q37). */
  def mediaFromDocuments(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    tbl(spark, dir, "documents")
      .select(col("doc_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (pmod(length(col("text")), lit(3)) + 1).cast("int")).as("modality"),
        encode(col("text"), "utf-8").as("payload"))
      .as[MediaRecord]
  }

  def all: Seq[NamedQuery] = Seq(
    NamedQuery(
      "q37_multimodal_meta",
      (s, d) => {
        val payload = encode(col("text"), "utf-8")
        val nBytes = length(payload).cast("long")
        tbl(s, d, "documents").select(
          col("doc_id"),
          nBytes.as("n_bytes"),
          element_at(array(lit("image"), lit("audio"), lit("video")),
            (pmod(nBytes, lit(3)) + 1).cast("int")).as("modality"),
          (lit(64L) + pmod(nBytes, lit(256))).as("width"),
          (lit(64L) + pmod(nBytes * 7, lit(256))).as("height"),
          when(pmod(nBytes, lit(3)) === 2, pmod(nBytes, lit(24)) + 1)
            .otherwise(1L).as("frames"),
          md5(col("text")).as("checksum"))
      },
      Some("""SELECT doc_id,
             |  octet_length(encode(text)) AS n_bytes,
             |  (['image', 'audio', 'video'])[octet_length(encode(text)) % 3 + 1]
             |    AS modality,
             |  64 + octet_length(encode(text)) % 256 AS width,
             |  64 + (octet_length(encode(text)) * 7) % 256 AS height,
             |  CASE WHEN octet_length(encode(text)) % 3 = 2
             |       THEN octet_length(encode(text)) % 24 + 1 ELSE 1 END
             |    AS frames,
             |  md5(text) AS checksum
             |FROM documents""".stripMargin)),
  )
}
