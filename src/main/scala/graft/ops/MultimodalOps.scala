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
  *    routing) is real and tested. [[decodeDims]] parses PNG/BMP/WAV
  *    container headers in pure JVM code (no codec dependency); only
  *    unknown containers fall back to a deterministic STUB, and pixel/
  *    sample decode (the codec part) stays out of scope in this
  *    environment.
  *
  * The payloads here are synthesized from `documents.text` bytes (the
  * testdata has no binary table) — the plumbing is payload-agnostic.
  */
object MultimodalOps {
  import OpsKit._

  final case class MediaRecord(doc_id: Long, modality: String,
      payload: Array[Byte])
  final case class MediaMeta(doc_id: Long, modality: String, n_bytes: Int,
      width: Int, height: Int, frames: Int, animated: Boolean,
      has_alpha: Boolean)

  /** Container-header decode, pure JVM (no codec dependency):
    *
    *  - PNG → IHDR (width, height) — big-endian ints at offsets 16/20;
    *  - BMP → BITMAPINFOHEADER (biWidth, |biHeight|) — little-endian at
    *    18/22 (negative height = top-down row order, dims unchanged);
    *  - WAV (PCM) → (sample_rate, n_channels) in the same two slots —
    *    little-endian at 24/22 of the canonical RIFF/WAVE/fmt layout;
    *  - JPEG → a bounded SOF marker walk (r15): skip fill bytes and
    *    standalone markers, hop segments by their big-endian lengths,
    *    stop at the first frame header (SOF0…SOF15 minus DHT/JPG/DAC)
    *    and read (height, width) big-endian at +5/+7 — dimensions never
    *    need entropy decode;
    *  - GIF → logical screen descriptor: (width, height) little-endian
    *    at 6/8 after the GIF87a/GIF89a magic;
    *  - WebP (r16) → RIFF/WEBP container, first chunk dispatched by
    *    fourcc: VP8X extended header (24-bit little-endian canvas
    *    width−1/height−1 at 24/27), VP8 lossy bitstream (0x9D012A start
    *    code, 14-bit little-endian dims at 26/28), VP8L lossless
    *    (0x2F signature, 14+14 bits packed little-endian from 21);
    *  - TIFF (r16) → "II*\0"/"MM\0*" byte-order header, then a bounded
    *    IFD entry walk for tags 256/257 (ImageWidth/ImageLength),
    *    reading inline SHORT(3)/LONG(4) values in the file's declared
    *    endianness — dimensions never need strip/tile decode.
    *
    * No-false-positive discipline: the PNG/BMP/WAV/TIFF sniffs require
    * structural ZERO bytes and JPEG requires 0xFF bytes — neither occurs
    * in NUL-free utf-8 text, so a text payload can never wander into
    * those parsers. GIF's 6-byte magic is printable ASCII; it is matched
    * exactly, so only a text that literally starts "GIF87a"/"GIF89a"
    * could reach the GIF branch (~2⁻⁴⁸ for arbitrary text, absent from
    * the corpora — MultimodalSpec pins fixtures for both real and text
    * payloads); WebP requires the 8 printable bytes "RIFF"+"WEBP" in
    * their exact slots (~2⁻⁶⁴) AND a recognized chunk fourcc, else it
    * falls through. Everything else falls back to the deterministic STUB,
    * the same formula q37's declarative twin computes; the two layers
    * stay in exact agreement (MultimodalSpec). Pixel/sample DECODE (the
    * part that needs a codec library) remains out of scope here; a real
    * decoder replaces the fallback, not the plumbing. */
  /** Magic-byte container sniff shared by [[decodeDims]],
    * [[decodeMediaFlags]], and the typed meta layer — recognition ONLY
    * (returns "png"/"bmp"/"wav"/"jpeg"/"gif"/"webp"/"tiff"/"raw"); each
    * consumer then walks only the structure it needs. Each predicate
    * carries the minimum length its consumer's fixed-offset reads need,
    * so a positive sniff licenses those reads. The no-false-positive
    * discipline documented above (structural zero/0xFF byte
    * requirements) lives here, shared by every layer. */
  def sniffContainer(payload: Array[Byte]): String = {
    def u8(i: Int): Int = payload(i) & 0xff
    def le32(i: Int): Int =
      (u8(i + 3) << 24) | (u8(i + 2) << 16) | (u8(i + 1) << 8) | u8(i)
    def ascii(i: Int, s: String): Boolean =
      payload.length >= i + s.length &&
        s.indices.forall(k => u8(i + k) == s.charAt(k).toInt)
    if (payload.length >= 24 &&
      u8(0) == 0x89 && ascii(1, "PNG") && u8(4) == 0x0d && u8(5) == 0x0a &&
      u8(6) == 0x1a && u8(7) == 0x0a && ascii(12, "IHDR")) "png"
    else if (payload.length >= 26 && ascii(0, "BM") && le32(14) == 40)
      "bmp"
    else if (payload.length >= 28 && ascii(0, "RIFF") &&
      ascii(8, "WAVE") && ascii(12, "fmt ") && le32(16) == 16) "wav"
    else if (payload.length >= 4 &&
      u8(0) == 0xff && u8(1) == 0xd8 && u8(2) == 0xff) "jpeg"
    else if (payload.length >= 13 && ascii(0, "GIF8") &&
      (u8(4) == '7'.toInt || u8(4) == '9'.toInt) && u8(5) == 'a'.toInt)
      "gif"
    else if (payload.length >= 16 && ascii(0, "RIFF") && ascii(8, "WEBP"))
      "webp"
    else if (payload.length >= 8 &&
      ((u8(0) == 'I'.toInt && u8(1) == 'I'.toInt && u8(2) == 42 &&
        u8(3) == 0) ||
        (u8(0) == 'M'.toInt && u8(1) == 'M'.toInt && u8(2) == 0 &&
          u8(3) == 42))) "tiff"
    else "raw"
  }

  def decodeDims(payload: Array[Byte]): (Int, Int) = {
    def u8(i: Int): Int = payload(i) & 0xff
    def be16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    def be32(i: Int): Int =
      (u8(i) << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    def le32(i: Int): Int =
      (u8(i + 3) << 24) | (u8(i + 2) << 16) | (u8(i + 1) << 8) | u8(i)
    def le16(i: Int): Int = (u8(i + 1) << 8) | u8(i)
    def ascii(i: Int, s: String): Boolean =
      payload.length >= i + s.length &&
        s.indices.forall(k => u8(i + k) == s.charAt(k).toInt)
    // WebP: dispatch on the first chunk's fourcc; every branch reads
    // fixed offsets guarded by length — unknown chunks fall through
    def webpDims(): Option[(Int, Int)] = {
      if (ascii(12, "VP8X") && payload.length >= 30) {
        // 24-bit little-endian canvas dims, stored minus one
        val w = (u8(24) | (u8(25) << 8) | (u8(26) << 16)) + 1
        val h = (u8(27) | (u8(28) << 8) | (u8(29) << 16)) + 1
        Some((w, h))
      } else if (ascii(12, "VP8 ") && payload.length >= 30 &&
          u8(23) == 0x9d && u8(24) == 0x01 && u8(25) == 0x2a) {
        // lossy keyframe: 14-bit dims (upper 2 bits are scaling hints)
        Some((le16(26) & 0x3fff, le16(28) & 0x3fff))
      } else if (ascii(12, "VP8L") && payload.length >= 25 &&
          u8(20) == 0x2f) {
        // lossless: 14+14 bits packed little-endian after the signature
        val bits = (u8(21).toLong | (u8(22).toLong << 8) |
          (u8(23).toLong << 16) | (u8(24).toLong << 24))
        Some((((bits & 0x3fff) + 1).toInt,
          (((bits >> 14) & 0x3fff) + 1).toInt))
      } else None
    }
    // TIFF: bounded IFD walk in the declared byte order; inline
    // SHORT/LONG values only (width/height always fit inline) — any
    // truncated structure falls through to the stub, never throws
    def tiffDims(): Option[(Int, Int)] = {
      val le = u8(0) == 'I'.toInt
      def r16(i: Int): Int = if (le) le16(i) else be16(i)
      def r32(i: Int): Int = if (le) le32(i) else be32(i)
      val ifd = r32(4)
      // compare as `ifd > length - 2`, NOT `ifd + 2 > length`: a crafted
      // IFD offset near Int.MaxValue wraps `ifd + 2` negative and slips
      // past the bounds check into u8(ifd) (r16 ADVICE); the subtraction
      // form can't overflow (length >= 0)
      if (ifd < 0 || ifd > payload.length - 2) return None
      val n = r16(ifd)
      var w = -1
      var h = -1
      var k = 0
      while (k < n && ifd + 2 + 12 * (k + 1) <= payload.length) {
        val e = ifd + 2 + 12 * k
        val tag = r16(e)
        val v = r16(e + 2) match {
          case 3 => r16(e + 8) // SHORT, inline
          case 4 => r32(e + 8) // LONG, inline
          case _ => -1
        }
        if (tag == 256) w = v else if (tag == 257) h = v
        k += 1
      }
      if (w >= 0 && h >= 0) Some((w, h)) else None
    }
    // SOF walk: returns (w, h) or falls through to the stub on any
    // malformed structure (truncated segment, EOI/SOS before a frame
    // header) — bounded by the payload length, never throws
    def jpegDims(): Option[(Int, Int)] = {
      var i = 2
      while (i + 3 < payload.length && u8(i) == 0xff) {
        val m = u8(i + 1)
        if (m == 0xff) i += 1 // fill byte
        else if (m == 0x01 || (m >= 0xd0 && m <= 0xd8)) i += 2 // standalone
        else if (m == 0xd9 || m == 0xda) return None // EOI/SOS: no SOF seen
        else {
          val len = be16(i + 2)
          if (len < 2) return None
          val isSof = m >= 0xc0 && m <= 0xcf &&
            m != 0xc4 && m != 0xc8 && m != 0xcc
          if (isSof) {
            if (i + 8 >= payload.length) return None
            return Some((be16(i + 7), be16(i + 5))) // (width, height)
          }
          i += 2 + len
        }
      }
      None
    }
    sniffContainer(payload) match {
      case "png" => (be32(16), be32(20))
      case "bmp" => (le32(18), math.abs(le32(22)))
      case "wav" => (le32(24), le16(22))
      case "gif" => (le16(6), le16(8))
      case kind =>
        val parsed = kind match {
          case "jpeg" => jpegDims()
          case "webp" => webpDims()
          case "tiff" => tiffDims()
          case _ => None
        }
        parsed.getOrElse(
          (64 + (payload.length % 256), 64 + ((payload.length * 7) % 256)))
    }
  }

  /** Animated-container metadata (r17): frame count and the animation/
    * alpha capability bits — the columns a multimodal curation pipeline
    * filters on before paying for a video-style decode.
    *
    *  - GIF → a bounded block walk after the logical screen descriptor
    *    (skipping the global color table when flagged): extension
    *    blocks (0x21) hop their size-prefixed sub-blocks, each image
    *    descriptor (0x2C) counts one frame and hops its local color
    *    table + LZW data sub-blocks, the trailer (0x3B) stops the walk.
    *    Every read is length-guarded and the index strictly advances,
    *    so the walk is bounded by the payload and never throws; an
    *    unknown separator byte (e.g. raw text riding after a bare
    *    13-byte header) stops it. `animated` = more than one frame.
    *  - WebP VP8X → the extended-header flags byte at offset 20
    *    (bit 0x02 = animation, bit 0x10 = alpha); when the animation bit
    *    is set the frame count comes from enumerating the container's
    *    ANMF chunks with a bounded overflow-safe RIFF chunk walk — no
    *    codec needed, the chunk layout IS the frame inventory.
    *  - any other RECOGNIZED container → Some((1, false, false)): a
    *    still.
    *  - unrecognized payloads → None ([[decodeMediaFlagsOpt]]), so the
    *    typed meta layer can keep its documented per-modality stub for
    *    raw payloads; the total form [[decodeMediaFlags]] floors them at
    *    (1, false, false).
    *
    * Returns (frames ≥ 1, animated, has_alpha). */
  def decodeMediaFlags(payload: Array[Byte]): (Int, Boolean, Boolean) =
    decodeMediaFlagsOpt(payload).getOrElse((1, false, false))

  def decodeMediaFlagsOpt(
      payload: Array[Byte]): Option[(Int, Boolean, Boolean)] = {
    def u8(i: Int): Int = payload(i) & 0xff
    def ascii(i: Int, s: String): Boolean =
      payload.length >= i + s.length &&
        s.indices.forall(k => u8(i + k) == s.charAt(k).toInt)
    val kind = sniffContainer(payload)
    val isGif = kind == "gif"
    val isVp8x = kind == "webp" && payload.length >= 21 &&
      ascii(12, "VP8X")
    if (isVp8x) {
      val flags = u8(20)
      val animated = (flags & 0x02) != 0
      val alpha = (flags & 0x10) != 0
      // animated: enumerate ANMF chunks with a bounded RIFF chunk walk
      // (fourcc + le32 size + payload + pad-to-even). Sizes are hopped
      // in Long so a crafted 31-bit size can't wrap the index (the r16
      // tiffDims lesson); any truncated or overrunning chunk stops the
      // walk; an animation flag with no ANMF chunks floors at 1.
      val frames =
        if (!animated) 1
        else {
          var i = 12
          var n = 0
          var done = false
          while (!done && i + 8 <= payload.length) {
            if (ascii(i, "ANMF")) n += 1
            val sz = (u8(i + 4).toLong | (u8(i + 5).toLong << 8) |
              (u8(i + 6).toLong << 16) | (u8(i + 7).toLong << 24))
            val adv = 8L + sz + (sz & 1L)
            if (i.toLong + adv > payload.length) done = true
            else i += adv.toInt
          }
          math.max(n, 1)
        }
      Some((frames, animated, alpha))
    } else if (isGif) {
      var i = 13
      val packed = u8(10)
      if ((packed & 0x80) != 0) i += 3 * (1 << ((packed & 7) + 1))
      // hop a size-prefixed sub-block chain; returns the index past its
      // 0 terminator (or past the payload end, which stops the walk)
      def hopSubBlocks(start: Int): Int = {
        var j = start
        while (j < payload.length && u8(j) != 0) j += u8(j) + 1
        j + 1
      }
      var frames = 0
      var done = false
      while (!done && i < payload.length) {
        u8(i) match {
          case 0x3b => done = true // trailer
          case 0x21 => // extension: separator + label, then sub-blocks
            i = hopSubBlocks(i + 2)
          case 0x2c => // image descriptor
            if (i + 10 > payload.length) done = true
            else {
              frames += 1
              val lp = u8(i + 9)
              i += 10
              if ((lp & 0x80) != 0) i += 3 * (1 << ((lp & 7) + 1))
              i += 1 // LZW minimum code size
              i = hopSubBlocks(i)
            }
          case _ => done = true // not a GIF block: stop, never guess
        }
      }
      Some((math.max(frames, 1), frames > 1, false))
    } else if (kind != "raw") Some((1, false, false))
    else None
  }

  /** Minimal VALID container headers for the three image formats the
    * decode layer parses — fixture builders shared by MultimodalSpec and
    * q300's synthesize-then-parse oracle round-trip (the payload body
    * rides after the header; dims must fit the container's field widths:
    * 16-bit for GIF/JPEG, 31-bit for PNG). */
  def mkPng(w: Int, h: Int, body: Array[Byte]): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(33 + body.length)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
    b.put(Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
      .map(_.toByte))
    b.putInt(13); b.put("IHDR".getBytes("US-ASCII"))
    b.putInt(w); b.putInt(h); b.put(Array[Byte](8, 6, 0, 0, 0))
    b.put(body)
    b.array()
  }

  /** GIF89a with `frames` image descriptors, each preceded by a graphic
    * control extension (exercising the extension hop) and carrying one
    * 1-byte LZW data sub-block — 22 bytes per frame — then the 0x3B
    * trailer; the body rides after the trailer, where the frame walk
    * never reads. The legacy 3-arg form keeps the bare-header shape
    * (body straight after the descriptor) so the walk's
    * unknown-separator stop stays covered by existing fixtures. */
  def mkGif(w: Int, h: Int, body: Array[Byte]): Array[Byte] =
    mkGif(w, h, body, 0)

  def mkGif(w: Int, h: Int, body: Array[Byte], frames: Int): Array[Byte] = {
    val blocks = if (frames > 0) 22 * frames + 1 else 0
    val b = java.nio.ByteBuffer.allocate(13 + blocks + body.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("GIF89a".getBytes("US-ASCII"))
    b.putShort(w.toShort); b.putShort(h.toShort)
    b.put(Array[Byte](0, 0, 0)) // packed flags, bg color, aspect
    for (_ <- 0 until frames) {
      // graphic control extension: 0x21 0xF9, one 4-byte sub-block, 0
      b.put(Array(0x21, 0xf9, 0x04, 0x00, 0x00, 0x00, 0x00, 0x00)
        .map(_.toByte))
      // image descriptor + packed 0 (no local color table)
      b.put(0x2c.toByte)
      b.putShort(0); b.putShort(0)
      b.putShort(w.toShort); b.putShort(h.toShort)
      b.put(0.toByte)
      // LZW min code size + one 1-byte data sub-block + terminator
      b.put(Array[Byte](2, 1, 0, 0))
    }
    if (frames > 0) b.put(0x3b.toByte) // trailer
    b.put(body)
    b.array()
  }

  /** SOI + APP0(JFIF) + DHT stub + SOF0 — the DHT segment before the
    * frame header exercises the walk's skip-by-length hop. */
  def mkJpeg(w: Int, h: Int, body: Array[Byte]): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(2 + 18 + 6 + 19 + body.length)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
    b.put(Array(0xff, 0xd8).map(_.toByte)) // SOI
    b.put(Array(0xff, 0xe0).map(_.toByte)) // APP0
    b.putShort(16); b.put("JFIF".getBytes("US-ASCII")); b.put(0.toByte)
    b.put(Array[Byte](1, 2, 0, 0, 1, 0, 1, 0, 0))
    b.put(Array(0xff, 0xc4).map(_.toByte)) // DHT (skipped by the walk)
    b.putShort(4); b.putShort(0)
    b.put(Array(0xff, 0xc0).map(_.toByte)) // SOF0
    b.putShort(17); b.put(8.toByte)
    b.putShort(h.toShort); b.putShort(w.toShort)
    b.put(3.toByte)
    b.put(Array[Byte](1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1))
    b.put(body)
    b.array()
  }

  /** RIFF/WEBP with a VP8X extended header — 24-bit little-endian canvas
    * dims (stored minus one); dims must fit 24 bits. */
  def mkWebp(w: Int, h: Int, body: Array[Byte]): Array[Byte] =
    mkWebp(w, h, body, animated = false, alpha = false)

  def mkWebp(w: Int, h: Int, body: Array[Byte], animated: Boolean,
      alpha: Boolean): Array[Byte] =
    mkWebp(w, h, body, animated, alpha, if (animated) 1 else 0)

  /** VP8X flags byte (r17): bit 0x02 = animation, bit 0x10 = alpha.
    * An animated container carries a real ANIM chunk (background +
    * loop count, 6 bytes) and `frames` 16-byte ANMF stub chunks — 14 +
    * 24·frames bytes after the VP8X chunk — so the ANMF enumeration
    * walk parses genuine RIFF chunk structure; the body rides after
    * the last chunk. */
  def mkWebp(w: Int, h: Int, body: Array[Byte], animated: Boolean,
      alpha: Boolean, frames: Int): Array[Byte] = {
    val extra = if (animated) 14 + 24 * frames else 0
    val b = java.nio.ByteBuffer.allocate(30 + extra + body.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII"))
    b.putInt(22 + extra + body.length) // RIFF payload size
    b.put("WEBP".getBytes("US-ASCII"))
    b.put("VP8X".getBytes("US-ASCII"))
    b.putInt(10) // VP8X chunk size
    val flags = (if (animated) 0x02 else 0) | (if (alpha) 0x10 else 0)
    b.put(Array[Byte](flags.toByte, 0, 0, 0)) // flags + reserved
    def le24(v: Int): Unit = {
      b.put((v & 0xff).toByte)
      b.put(((v >> 8) & 0xff).toByte)
      b.put(((v >> 16) & 0xff).toByte)
    }
    le24(w - 1); le24(h - 1)
    if (animated) {
      b.put("ANIM".getBytes("US-ASCII"))
      b.putInt(6)
      b.put(Array[Byte](0, 0, 0, 0, 0, 0)) // bg color + loop count
      for (_ <- 0 until frames) {
        b.put("ANMF".getBytes("US-ASCII"))
        b.putInt(16)
        b.put(new Array[Byte](16)) // x/y/w-1/h-1/duration/flags stub
      }
    }
    b.put(body)
    b.array()
  }

  /** Little-endian TIFF: header + one 2-entry IFD — ImageWidth (256) as
    * an inline LONG and ImageLength (257) as an inline SHORT, so both
    * inline value paths of the walk are exercised; height must fit 16
    * bits. The BE ("MM") variant is covered by a handcrafted spec
    * fixture. */
  def mkTiff(w: Int, h: Int, body: Array[Byte]): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(38 + body.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("II".getBytes("US-ASCII")); b.putShort(42)
    b.putInt(8) // IFD offset
    b.putShort(2) // entry count
    b.putShort(256.toShort); b.putShort(4); b.putInt(1); b.putInt(w)
    b.putShort(257.toShort); b.putShort(3); b.putInt(1)
    b.putShort(h.toShort); b.putShort(0)
    b.putInt(0) // next-IFD pointer
    b.put(body)
    b.array()
  }

  /** Typed decode pipeline: batch-iterates each partition once (the shape
    * a vectorized decoder needs), no shuffle — decode parallelism is
    * inherited from the scan partitioning. */
  def extractMeta(ds: Dataset[MediaRecord]): Dataset[MediaMeta] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.map { r =>
      val (w, h) = decodeDims(r.payload)
      // container-decoded animation metadata wins whenever the payload
      // IS a recognized container (r17 verdict item 2: the typed layer
      // other multimodal ops consume must expose what the byte walks
      // already recover); only a raw payload keeps the documented
      // per-modality frame stub, preserving exact agreement with q37's
      // declarative twin on document-derived corpora.
      val (frames, animated, alpha) =
        decodeMediaFlagsOpt(r.payload).getOrElse(
          (if (r.modality == "video") (r.payload.length % 24) + 1 else 1,
            false, false))
      MediaMeta(r.doc_id, r.modality, r.payload.length, w, h, frames,
        animated, alpha)
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

  final case class ResizedMedia(doc_id: Long, modality: String,
      src_w: Int, src_h: Int, out_w: Int, out_h: Int,
      payload: Array[Byte])

  /** Resize: cap the longer image side at `maxDim`, preserving aspect
    * ratio — the normalization pass vision pretraining runs before
    * batching. Target dimensions are EXACT integer arithmetic over the
    * header-decoded source dims (floor of w·maxDim/longSide, floored at
    * 1 — never a float, so the plan is engine- and partition-count-
    * deterministic); payloads at or under the cap pass through
    * untouched (no re-encode of already-small media). The pixel resample
    * itself needs a codec, so the output payload is a deterministic
    * stride-sample of the source bytes proportional to the area ratio —
    * the STUB slot a real scaler (libvips, ffmpeg) replaces; the
    * mapPartitions batch shape, the typed schema, and the dimension
    * arithmetic are the real, tested plumbing (same contract as
    * [[extractMeta]]'s decode layer). */
  def resizeMedia(ds: Dataset[MediaRecord], maxDim: Int): Dataset[ResizedMedia] = {
    require(maxDim >= 1, "maxDim must be positive")
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.map { r =>
      val (w, h) = decodeDims(r.payload)
      val long = math.max(w, h)
      if (long <= maxDim || long == 0)
        ResizedMedia(r.doc_id, r.modality, w, h, w, h, r.payload)
      else {
        val ow = math.max(1, w * maxDim / long)
        val oh = math.max(1, h * maxDim / long)
        // stride-sample the payload to ~area-ratio size (codec stub)
        val n = r.payload.length
        val target = math.max(1,
          (n.toLong * ow * oh / math.max(1L, w.toLong * h)).toInt)
        val stride = math.max(1, n / target)
        val out = new Array[Byte]((n + stride - 1) / stride)
        var i = 0
        while (i < out.length) { out(i) = r.payload(i * stride); i += 1 }
        ResizedMedia(r.doc_id, r.modality, w, h, ow, oh, out)
      }
    })
  }

  /** 64-bit average-hash over the payload: the byte stream is cut into
    * 64 equal slices, each slice's mean brightness-proxy is compared to
    * the global mean, bit i = slice i above average — the classic aHash
    * layout with the pixel DECODE stubbed to raw bytes (the same
    * documented codec-stub contract as [[embedMedia]]/[[resizeMedia]]:
    * a real decoder feeds grayscale pixels into this same function and
    * nothing downstream changes). Properties the spec pins: identical
    * payloads collide exactly; a single-byte perturbation moves at most
    * a few bits (Hamming-near), where any cryptographic hash scatters —
    * which is the entire point of a PERCEPTUAL signature. */
  def aHash64(payload: Array[Byte]): Long = {
    val n = payload.length
    if (n == 0) return 0L
    val sums = new Array[Long](64)
    val cnts = new Array[Long](64)
    var i = 0
    while (i < n) {
      // slice index via the exact integer split i*64/n (monotone,
      // partition-free — no float boundaries)
      val s = (i.toLong * 64 / n).toInt
      sums(s) += payload(i) & 0xff
      cnts(s) += 1
      i += 1
    }
    var total = 0L
    i = 0
    while (i < 64) { total += sums(i); i += 1 }
    var bits = 0L
    i = 0
    while (i < 64) {
      // slice mean > global mean, compared in exact cross-multiplied
      // integers: sums(i)·n > total·cnts(i) — no double division
      if (cnts(i) > 0 && sums(i) * n > total * cnts(i))
        bits |= (1L << i)
      i += 1
    }
    bits
  }

  final case class MediaSig(doc_id: Long, modality: String, ahash: Long,
      frames: Int, animated: Boolean, has_alpha: Boolean)

  /** Perceptual-signature projection: one aHash64 per record, tagged
    * with the container-decoded animation metadata (r17 verdict item 2)
    * so near-dup clustering can stratify stills from animations without
    * a second payload pass. Grouping on the signature (or
    * pigeonhole-joining its 16-bit words, q152) gives near-dup media
    * clusters without ever comparing payloads pairwise. */
  def mediaSignatures(ds: Dataset[MediaRecord]): Dataset[MediaSig] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.map { r =>
      val (frames, animated, alpha) =
        decodeMediaFlagsOpt(r.payload).getOrElse((1, false, false))
      MediaSig(r.doc_id, r.modality, aHash64(r.payload), frames,
        animated, alpha)
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

    // ----- q131: resize plan report (target-dimension arithmetic) ---------
    // The declarative twin of [[resizeMedia]]'s dimension arithmetic,
    // under the oracle gate: for every media row (q37's stub-decoded
    // dims), the aspect-preserving target at a 192-pixel long-side cap —
    // floor(dim·cap/longSide), floored at 1, pass-through at or under
    // the cap — rolled up per modality (rows to resize, mean shrink
    // ratio via exact integer area sums + one trailing division). The
    // integer target-dim formula is the CONTRACT the typed resize op
    // implements; registering it means a drifted floor/rounding choice
    // fails the driver's hash gate, not just a unit test.
    NamedQuery(
      "q131_resize_plan",
      (s, d) => {
        val nBytes = length(encode(col("text"), "utf-8")).cast("long")
        val w = lit(64L) + pmod(nBytes, lit(256))
        val h = lit(64L) + pmod(nBytes * 7, lit(256))
        val cap = lit(192L)
        val long = greatest(w, h)
        val ow = when(long <= cap, w)
          .otherwise(greatest(w * cap.cast("long") / long, lit(1L))
            .cast("long"))
        val oh = when(long <= cap, h)
          .otherwise(greatest(h * cap.cast("long") / long, lit(1L))
            .cast("long"))
        tbl(s, d, "documents")
          .select(
            element_at(array(lit("image"), lit("audio"), lit("video")),
              (pmod(nBytes, lit(3)) + 1).cast("int")).as("modality"),
            (long > cap).as("resized"),
            (w * h).as("src_area"), (ow * oh).as("out_area"))
          .groupBy(col("modality"))
          .agg(count(lit(1)).as("n_media"),
            sum(when(col("resized"), 1L).otherwise(0L)).as("n_resized"),
            (sum(col("out_area")).cast("double") /
              sum(col("src_area")).cast("double")).as("area_ratio"))
      },
      Some("""WITH m AS (
             |  SELECT
             |    (['image', 'audio', 'video'])
             |      [octet_length(encode(text)) % 3 + 1] AS modality,
             |    64 + octet_length(encode(text)) % 256 AS w,
             |    64 + (octet_length(encode(text)) * 7) % 256 AS h
             |  FROM documents),
             |r AS (
             |  SELECT modality, w, h, greatest(w, h) > 192 AS resized,
             |    CASE WHEN greatest(w, h) <= 192 THEN w
             |      ELSE greatest(w * 192 // greatest(w, h), 1) END AS ow,
             |    CASE WHEN greatest(w, h) <= 192 THEN h
             |      ELSE greatest(h * 192 // greatest(w, h), 1) END AS oh
             |  FROM m)
             |SELECT modality, COUNT(*) AS n_media,
             |  CAST(SUM(CASE WHEN resized THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_resized,
             |  CAST(SUM(ow * oh) AS DOUBLE) / CAST(SUM(w * h) AS DOUBLE)
             |    AS area_ratio
             |FROM r GROUP BY modality""".stripMargin)),

    // ----- q300: container-dimension decode, certified end-to-end ---------
    // The header-parse layer (PNG IHDR, GIF logical screen descriptor,
    // JPEG SOF marker walk — r15; WebP VP8X and TIFF IFD walk — r16)
    // under the oracle hash gate via a synthesize-then-parse
    // round-trip: each document's doc_id derives target dims, a REAL
    // container header with those dims wraps the text bytes (PNG / GIF
    // / JPEG / WebP / TIFF / raw, round-robin by id), and the Spark
    // side recovers the dims by PARSING THE BYTES in the typed decode
    // layer (decodeDims — the same code path a production corpus scan
    // runs). The oracle knows only the generative formula, so a wrong
    // endianness, a mis-hopped JPEG segment, a mis-packed 24-bit VP8X
    // field, or a mis-walked IFD entry flips the hash. Typed
    // mapPartitions, partition-local, one corpus scan — the byte-level
    // work rides the scan like extractMeta.
    NamedQuery(
      "q300_container_dims",
      (s, d) => {
        import s.implicits._
        tbl(s, d, "documents")
          .select(col("doc_id"), col("text"))
          .as[(Long, String)]
          .mapPartitions(_.map { case (id, text) =>
            val body = text.getBytes("UTF-8")
            val w = (64 + (id * 13) % 1000).toInt
            val h = (64 + (id * 29) % 1000).toInt
            // animated metadata plant (r17): GIFs carry 1..4 real frame
            // blocks, WebPs set the VP8X animation/alpha bits on id
            // grids — all recovered by PARSING the bytes below
            val payload = (id % 6) match {
              case 0 => mkPng(w, h, body)
              case 1 => mkGif(w, h, body, frames = (1 + (id / 6) % 4).toInt)
              case 2 => mkJpeg(w, h, body)
              case 3 =>
                val anim = (id / 6) % 2 == 0
                mkWebp(w, h, body, animated = anim,
                  alpha = (id / 6) % 3 == 0,
                  frames = if (anim) (2 + (id / 12) % 3).toInt else 0)
              case 4 => mkTiff(w, h, body)
              case _ => body
            }
            val container = (id % 6) match {
              case 0 => "png"
              case 1 => "gif"
              case 2 => "jpeg"
              case 3 => "webp"
              case 4 => "tiff"
              case _ => "raw"
            }
            val (dw, dh) = decodeDims(payload)
            val (frames, animated, hasAlpha) = decodeMediaFlags(payload)
            (id, container, dw.toLong, dh.toLong, payload.length.toLong,
              frames.toLong, animated, hasAlpha)
          })
          .toDF("doc_id", "container", "width", "height", "n_bytes",
            "frames", "animated", "has_alpha")
      },
      Some("""SELECT doc_id,
             |  (['png', 'gif', 'jpeg', 'webp', 'tiff', 'raw'])
             |    [doc_id % 6 + 1] AS container,
             |  CASE WHEN doc_id % 6 = 5
             |    THEN 64 + octet_length(encode(text)) % 256
             |    ELSE 64 + (doc_id * 13) % 1000 END AS width,
             |  CASE WHEN doc_id % 6 = 5
             |    THEN 64 + (octet_length(encode(text)) * 7) % 256
             |    ELSE 64 + (doc_id * 29) % 1000 END AS height,
             |  CAST(octet_length(encode(text)) + CASE doc_id % 6
             |    WHEN 0 THEN 33
             |    WHEN 1 THEN 13 + 22 * (1 + (doc_id // 6) % 4) + 1
             |    WHEN 2 THEN 45
             |    WHEN 3 THEN 30 + CASE WHEN (doc_id // 6) % 2 = 0
             |      THEN 14 + 24 * (2 + (doc_id // 12) % 3) ELSE 0 END
             |    WHEN 4 THEN 38
             |    ELSE 0 END AS BIGINT) AS n_bytes,
             |  CAST(CASE WHEN doc_id % 6 = 1 THEN 1 + (doc_id // 6) % 4
             |    WHEN doc_id % 6 = 3 AND (doc_id // 6) % 2 = 0
             |      THEN 2 + (doc_id // 12) % 3
             |    ELSE 1 END AS BIGINT) AS frames,
             |  ((doc_id % 6 = 1 AND (doc_id // 6) % 4 > 0)
             |   OR (doc_id % 6 = 3 AND (doc_id // 6) % 2 = 0)) AS animated,
             |  (doc_id % 6 = 3 AND (doc_id // 6) % 3 = 0) AS has_alpha
             |FROM documents""".stripMargin)),

    // ----- q312: animation-aware curation filter over the TYPED layer -----
    // The downstream consumer the r17 verdict asked for: the typed
    // extractMeta layer (the mapPartitions pipeline every other
    // multimodal op composes with) now carries frames/animated/alpha,
    // and this query exercises it end to end under the oracle gate —
    // synthesize q300's container corpus (GIF frame blocks, VP8X
    // flag/ANMF grids, stills, raw), recover the metadata by PARSING
    // THE BYTES through extractMeta (not decodeMediaFlags directly:
    // the point is the layer other ops consume), then apply the
    // curation rule a video-aware pretraining pipeline runs before
    // paying for decode — keep stills and short animations (≤3
    // frames), drop long ones — rolled up per container. The oracle
    // knows only the generative formulas, so a typed-layer field that
    // drifts from the byte walks (or a raw-payload stub that stops
    // matching q37's contract) flips the hash. One corpus scan;
    // partition-local byte work riding the scan, exactly like q300.
    NamedQuery(
      "q312_anim_curation",
      (s, d) => {
        import s.implicits._
        val media = tbl(s, d, "documents")
          .select(col("doc_id"), col("text"))
          .as[(Long, String)]
          .mapPartitions(_.map { case (id, text) =>
            val body = text.getBytes("UTF-8")
            val w = (64 + (id * 13) % 1000).toInt
            val h = (64 + (id * 29) % 1000).toInt
            val payload = (id % 6) match {
              case 0 => mkPng(w, h, body)
              case 1 => mkGif(w, h, body, frames = (1 + (id / 6) % 4).toInt)
              case 2 => mkJpeg(w, h, body)
              case 3 =>
                val anim = (id / 6) % 2 == 0
                mkWebp(w, h, body, animated = anim,
                  alpha = (id / 6) % 3 == 0,
                  frames = if (anim) (2 + (id / 12) % 3).toInt else 0)
              case 4 => mkTiff(w, h, body)
              case _ => body
            }
            MediaRecord(id,
              Seq("image", "audio", "video")(body.length % 3), payload)
          })
        extractMeta(media).toDF()
          .withColumn("container",
            element_at(array(lit("png"), lit("gif"), lit("jpeg"),
              lit("webp"), lit("tiff"), lit("raw")),
              (pmod(col("doc_id"), lit(6)) + 1).cast("int")))
          .groupBy(col("container"))
          .agg(count(lit(1)).as("n_media"),
            sum(when(col("animated"), 1L).otherwise(0L)).as("n_animated"),
            sum(when(col("has_alpha"), 1L).otherwise(0L)).as("n_alpha"),
            sum(col("frames").cast("long")).as("total_frames"),
            max(col("frames").cast("long")).as("max_frames"),
            sum(when(!col("animated") || col("frames") <= 3, 1L)
              .otherwise(0L)).as("n_keep"))
      },
      Some("""WITH m AS (
             |  SELECT doc_id,
             |    (['png', 'gif', 'jpeg', 'webp', 'tiff', 'raw'])
             |      [doc_id % 6 + 1] AS container,
             |    CAST(CASE WHEN doc_id % 6 = 1 THEN 1 + (doc_id // 6) % 4
             |      WHEN doc_id % 6 = 3 AND (doc_id // 6) % 2 = 0
             |        THEN 2 + (doc_id // 12) % 3
             |      WHEN doc_id % 6 = 5
             |          AND octet_length(encode(text)) % 3 = 2
             |        THEN octet_length(encode(text)) % 24 + 1
             |      ELSE 1 END AS BIGINT) AS frames,
             |    ((doc_id % 6 = 1 AND (doc_id // 6) % 4 > 0)
             |     OR (doc_id % 6 = 3 AND (doc_id // 6) % 2 = 0))
             |      AS animated,
             |    (doc_id % 6 = 3 AND (doc_id // 6) % 3 = 0) AS has_alpha
             |  FROM documents)
             |SELECT container, COUNT(*) AS n_media,
             |  CAST(SUM(CASE WHEN animated THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_animated,
             |  CAST(SUM(CASE WHEN has_alpha THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_alpha,
             |  CAST(SUM(frames) AS BIGINT) AS total_frames,
             |  CAST(MAX(frames) AS BIGINT) AS max_frames,
             |  CAST(SUM(CASE WHEN NOT animated OR frames <= 3
             |    THEN 1 ELSE 0 END) AS BIGINT) AS n_keep
             |FROM m GROUP BY container""".stripMargin)),
  )
}
