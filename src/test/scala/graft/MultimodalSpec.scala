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

  test("container headers decode without codecs; unknown falls back to stub") {
    import java.nio.{ByteBuffer, ByteOrder}
    def png(w: Int, h: Int): Array[Byte] = {
      val b = ByteBuffer.allocate(33).order(ByteOrder.BIG_ENDIAN)
      b.put(Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
        .map(_.toByte))
      b.putInt(13); b.put("IHDR".getBytes("US-ASCII"))
      b.putInt(w); b.putInt(h); b.put(Array[Byte](8, 6, 0, 0, 0))
      b.array()
    }
    def bmp(w: Int, h: Int): Array[Byte] = {
      val b = ByteBuffer.allocate(54).order(ByteOrder.LITTLE_ENDIAN)
      b.put('B'.toByte); b.put('M'.toByte)
      b.putInt(54); b.putShort(0); b.putShort(0); b.putInt(54)
      b.putInt(40); b.putInt(w); b.putInt(h)
      b.putShort(1); b.putShort(24)
      b.putInt(0); b.putInt(0); b.putInt(0); b.putInt(0); b.putInt(0)
      b.putInt(0)
      b.array()
    }
    def wav(rate: Int, ch: Int): Array[Byte] = {
      val b = ByteBuffer.allocate(44).order(ByteOrder.LITTLE_ENDIAN)
      b.put("RIFF".getBytes("US-ASCII")); b.putInt(36)
      b.put("WAVE".getBytes("US-ASCII"))
      b.put("fmt ".getBytes("US-ASCII")); b.putInt(16)
      b.putShort(1); b.putShort(ch.toShort); b.putInt(rate)
      b.putInt(rate * ch * 2); b.putShort((ch * 2).toShort); b.putShort(16)
      b.put("data".getBytes("US-ASCII")); b.putInt(0)
      b.array()
    }
    assert(MultimodalOps.decodeDims(png(640, 480)) == ((640, 480)))
    assert(MultimodalOps.decodeDims(bmp(1024, 768)) == ((1024, 768)))
    // negative biHeight = top-down row order; dimensions are unchanged
    assert(MultimodalOps.decodeDims(bmp(32, -32)) == ((32, 32)))
    assert(MultimodalOps.decodeDims(wav(44100, 2)) == ((44100, 2)))
    // r15 containers: JPEG SOF walk (the fixture carries APP0 + DHT
    // segments BEFORE the frame header, so the length hops are real)
    // and the GIF logical screen descriptor
    val jbody = "jpeg body bytes".getBytes("UTF-8")
    assert(MultimodalOps.decodeDims(
      MultimodalOps.mkJpeg(800, 600, jbody)) == ((800, 600)))
    assert(MultimodalOps.decodeDims(
      MultimodalOps.mkGif(320, 200, jbody)) == ((320, 200)))
    // a text payload that merely CONTAINS the magic deeper in never
    // routes into a parser
    val trap = ("some text then GIF89a later and ÿØ too")
      .getBytes("ISO-8859-1")
    assert(MultimodalOps.decodeDims(trap) ==
      ((64 + trap.length % 256, 64 + (trap.length * 7) % 256)))
    val junk = "just some text bytes".getBytes("UTF-8")
    assert(MultimodalOps.decodeDims(junk) ==
      ((64 + junk.length % 256, 64 + (junk.length * 7) % 256)))

    // the typed pipeline carries the parsed dims end-to-end
    import spark.implicits._
    val media = Seq(
      MultimodalOps.MediaRecord(1L, "image", png(640, 480)),
      MultimodalOps.MediaRecord(2L, "image", bmp(1024, 768)),
      MultimodalOps.MediaRecord(3L, "audio", wav(44100, 2)),
      MultimodalOps.MediaRecord(4L, "image", junk),
      MultimodalOps.MediaRecord(5L, "image",
        MultimodalOps.mkJpeg(1920, 1080, jbody)),
      MultimodalOps.MediaRecord(6L, "image",
        MultimodalOps.mkGif(256, 144, jbody))).toDS()
    val metas = MultimodalOps.extractMeta(media).collect()
      .map(m => m.doc_id -> ((m.width, m.height))).toMap
    assert(metas(1L) == ((640, 480)))
    assert(metas(2L) == ((1024, 768)))
    assert(metas(3L) == ((44100, 2)))
    assert(metas(4L) ==
      ((64 + junk.length % 256, 64 + (junk.length * 7) % 256)))
    assert(metas(5L) == ((1920, 1080)))
    assert(metas(6L) == ((256, 144)))
  }

  test("r16 containers: WebP (VP8X/VP8/VP8L) and TIFF (LE/BE) headers") {
    import java.nio.{ByteBuffer, ByteOrder}
    val body = "webp tiff body".getBytes("UTF-8")
    // VP8X extended header — 24-bit canvas dims (the q300 fixture)
    assert(MultimodalOps.decodeDims(
      MultimodalOps.mkWebp(16384, 9000, body)) == ((16384, 9000)))
    // VP8 lossy keyframe: 0x9D012A start code, 14-bit dims
    def webpVp8(w: Int, h: Int): Array[Byte] = {
      val b = ByteBuffer.allocate(30).order(ByteOrder.LITTLE_ENDIAN)
      b.put("RIFF".getBytes("US-ASCII")); b.putInt(22)
      b.put("WEBP".getBytes("US-ASCII"))
      b.put("VP8 ".getBytes("US-ASCII")); b.putInt(10)
      b.put(Array[Byte](0, 0, 0)) // frame tag
      b.put(Array(0x9d, 0x01, 0x2a).map(_.toByte))
      b.putShort(w.toShort); b.putShort(h.toShort)
      b.array()
    }
    assert(MultimodalOps.decodeDims(webpVp8(640, 360)) == ((640, 360)))
    // VP8L lossless: 0x2F signature, 14+14 bits packed little-endian
    def webpVp8l(w: Int, h: Int): Array[Byte] = {
      val b = ByteBuffer.allocate(25).order(ByteOrder.LITTLE_ENDIAN)
      b.put("RIFF".getBytes("US-ASCII")); b.putInt(17)
      b.put("WEBP".getBytes("US-ASCII"))
      b.put("VP8L".getBytes("US-ASCII")); b.putInt(5)
      b.put(0x2f.toByte)
      val bits = (w - 1) | ((h - 1) << 14)
      b.putInt(bits)
      b.array()
    }
    assert(MultimodalOps.decodeDims(webpVp8l(1000, 750)) == ((1000, 750)))
    // an unknown first chunk must fall through to the stub, not parse
    val unk = {
      val b = ByteBuffer.allocate(20).order(ByteOrder.LITTLE_ENDIAN)
      b.put("RIFF".getBytes("US-ASCII")); b.putInt(12)
      b.put("WEBP".getBytes("US-ASCII"))
      b.put("ANMF".getBytes("US-ASCII"))
      b.array()
    }
    assert(MultimodalOps.decodeDims(unk) ==
      ((64 + unk.length % 256, 64 + (unk.length * 7) % 256)))

    // TIFF little-endian builder: LONG width + SHORT height (both
    // inline value paths)
    assert(MultimodalOps.decodeDims(
      MultimodalOps.mkTiff(70000, 4321, body)) == ((70000, 4321)))
    // TIFF big-endian (MM) — handcrafted, SHORT values in BE slots
    def tiffBe(w: Int, h: Int): Array[Byte] = {
      val b = ByteBuffer.allocate(38).order(ByteOrder.BIG_ENDIAN)
      b.put("MM".getBytes("US-ASCII")); b.putShort(42)
      b.putInt(8)
      b.putShort(2)
      b.putShort(256.toShort); b.putShort(3); b.putInt(1)
      b.putShort(w.toShort); b.putShort(0)
      b.putShort(257.toShort); b.putShort(3); b.putInt(1)
      b.putShort(h.toShort); b.putShort(0)
      b.putInt(0)
      b.array()
    }
    assert(MultimodalOps.decodeDims(tiffBe(1234, 567)) == ((1234, 567)))
    // an IFD missing either dim tag falls back to the stub
    def tiffNoDims(): Array[Byte] = {
      val b = ByteBuffer.allocate(26).order(ByteOrder.LITTLE_ENDIAN)
      b.put("II".getBytes("US-ASCII")); b.putShort(42)
      b.putInt(8)
      b.putShort(1)
      b.putShort(259.toShort); b.putShort(3); b.putInt(1)
      b.putShort(1); b.putShort(0) // Compression=1, no width/height
      b.putInt(0)
      b.array()
    }
    val nd = tiffNoDims()
    assert(MultimodalOps.decodeDims(nd) ==
      ((64 + nd.length % 256, 64 + (nd.length * 7) % 256)))
    // truncated structures never throw (the fuzz test covers these
    // families too once the prefixes route into the new parsers)
    for (fix <- Seq(MultimodalOps.mkWebp(100, 100, body),
        MultimodalOps.mkTiff(100, 100, body), webpVp8(64, 64));
        n <- 0 to fix.length)
      MultimodalOps.decodeDims(fix.take(n))
  }

  test("r17 animated metadata: GIF frame walk and VP8X flag bits") {
    val body = "the payload body".getBytes("UTF-8")
    // multi-frame GIF: the walk hops each frame's graphic control
    // extension, descriptor, and LZW sub-blocks, stops at the trailer
    for (n <- 1 to 5) {
      val g = MultimodalOps.mkGif(320, 200, body, frames = n)
      assert(MultimodalOps.decodeMediaFlags(g) === ((n, n > 1, false)),
        s"frames=$n")
      // dims are unchanged by the frame blocks
      assert(MultimodalOps.decodeDims(g) === ((320, 200)))
    }
    // legacy bare-header shape (text straight after the descriptor):
    // the walk stops at the first non-block byte and reports one frame
    val bare = MultimodalOps.mkGif(64, 64, body)
    assert(MultimodalOps.decodeMediaFlags(bare) === ((1, false, false)))
    // a local color table is hopped, not parsed as blocks: handcraft a
    // 1-frame GIF whose descriptor flags a 2-entry LCT (6 bytes)
    val lct = {
      val b = java.nio.ByteBuffer.allocate(13 + 10 + 6 + 4 + 1)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put("GIF89a".getBytes("US-ASCII"))
      b.putShort(8); b.putShort(8); b.put(Array[Byte](0, 0, 0))
      b.put(0x2c.toByte); b.putShort(0); b.putShort(0)
      b.putShort(8); b.putShort(8)
      b.put(0x80.toByte) // LCT flag, size code 0 -> 2 entries
      b.put(Array[Byte](1, 2, 3, 4, 5, 6)) // the LCT
      b.put(Array[Byte](2, 1, 0, 0)) // LZW + one sub-block + term
      b.put(0x3b.toByte)
      b.array()
    }
    assert(MultimodalOps.decodeMediaFlags(lct) === ((1, false, false)))
    // VP8X flag bits: all four combinations round-trip (the animated
    // builder emits one ANMF stub by default)
    for (anim <- Seq(true, false); alpha <- Seq(true, false)) {
      val w = MultimodalOps.mkWebp(100, 50, body, anim, alpha)
      assert(MultimodalOps.decodeMediaFlags(w) === ((1, anim, alpha)))
      assert(MultimodalOps.decodeDims(w) === ((100, 50)))
    }
    // ANMF enumeration: the RIFF chunk walk counts every frame chunk,
    // hopping the VP8X and ANIM chunks and ignoring the trailing body
    for (n <- 1 to 4) {
      val w = MultimodalOps.mkWebp(64, 64, body, animated = true,
        alpha = false, frames = n)
      assert(MultimodalOps.decodeMediaFlags(w) === ((n, true, false)),
        s"anmf=$n")
      assert(MultimodalOps.decodeDims(w) === ((64, 64)))
    }
    // animation flag with NO ANMF chunks floors at one frame
    val flagOnly = MultimodalOps.mkWebp(64, 64, body, animated = true,
      alpha = false, frames = 0)
    assert(MultimodalOps.decodeMediaFlags(flagOnly) === ((1, true, false)))
    // truncation never throws anywhere in the chunk walk
    val w3 = MultimodalOps.mkWebp(64, 64, body, animated = true,
      alpha = true, frames = 3)
    for (n <- 0 to w3.length) MultimodalOps.decodeMediaFlags(w3.take(n))
    // non-animated containers report the still default
    assert(MultimodalOps.decodeMediaFlags(
      MultimodalOps.mkPng(10, 10, body)) === ((1, false, false)))
    assert(MultimodalOps.decodeMediaFlags(body) === ((1, false, false)))
    // truncation never throws anywhere in the walk
    val g3 = MultimodalOps.mkGif(320, 200, body, frames = 3)
    for (n <- 0 to g3.length) MultimodalOps.decodeMediaFlags(g3.take(n))
  }

  test("decodeDims never throws on malformed headers: fuzz + truncation") {
    import java.nio.{ByteBuffer, ByteOrder}
    // same fixture builders as the decode test above
    def png(w: Int, h: Int): Array[Byte] = {
      val b = ByteBuffer.allocate(33).order(ByteOrder.BIG_ENDIAN)
      b.put(Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
        .map(_.toByte))
      b.putInt(13); b.put("IHDR".getBytes("US-ASCII"))
      b.putInt(w); b.putInt(h); b.put(Array[Byte](8, 6, 0, 0, 0))
      b.array()
    }
    def bmp(w: Int, h: Int): Array[Byte] = {
      val b = ByteBuffer.allocate(54).order(ByteOrder.LITTLE_ENDIAN)
      b.put('B'.toByte); b.put('M'.toByte)
      b.putInt(54); b.putShort(0); b.putShort(0); b.putInt(54)
      b.putInt(40); b.putInt(w); b.putInt(h)
      b.putShort(1); b.putShort(24)
      b.putInt(0); b.putInt(0); b.putInt(0); b.putInt(0); b.putInt(0)
      b.putInt(0)
      b.array()
    }
    def wav(rate: Int, ch: Int): Array[Byte] = {
      val b = ByteBuffer.allocate(44).order(ByteOrder.LITTLE_ENDIAN)
      b.put("RIFF".getBytes("US-ASCII")); b.putInt(36)
      b.put("WAVE".getBytes("US-ASCII"))
      b.put("fmt ".getBytes("US-ASCII")); b.putInt(16)
      b.putShort(1); b.putShort(ch.toShort); b.putInt(rate)
      b.putInt(rate * ch * 2); b.putShort((ch * 2).toShort); b.putShort(16)
      b.put("data".getBytes("US-ASCII")); b.putInt(0)
      b.array()
    }
    def stub(len: Int) = (64 + len % 256, 64 + (len * 7) % 256)
    val fixtures = Seq(
      ("png", png(640, 480), 24),   // min bytes each sniff needs before
      ("bmp", bmp(1024, 768), 26),  // it may claim the payload
      ("wav", wav(44100, 2), 28),
      // r15: JPEG may sniff from 4 bytes but a truncated walk falls
      // back to the stub (asserted by the no-throw loop below, not the
      // below-minimum check); GIF needs the full 13-byte descriptor
      ("jpeg", MultimodalOps.mkJpeg(800, 600, Array.emptyByteArray), 4),
      ("gif", MultimodalOps.mkGif(320, 200, Array.emptyByteArray), 13))

    // every truncated prefix (valid magic, short payload included) must
    // decode without throwing; below the sniff minimum it MUST be the
    // stub, never a partial parse of garbage offsets
    for ((name, full, minLen) <- fixtures; n <- 0 to full.length) {
      val p = full.take(n)
      val got = MultimodalOps.decodeDims(p)
      if (n < minLen)
        assert(got == stub(n), s"$name prefix $n: expected stub, got $got")
    }

    // every single-byte mutation of each valid header (ambiguous sniffs:
    // magic intact but structure wrong, or magic broken) decodes without
    // throwing — it may parse or fall back, but it cannot crash the scan
    for ((_, full, _) <- fixtures; i <- full.indices; bit <- Seq(0x01, 0x80)) {
      val m = full.clone()
      m(i) = (m(i) ^ bit).toByte
      MultimodalOps.decodeDims(m)
    }

    // seeded random fuzz: arbitrary byte soup of many lengths never
    // throws, and anything that fails all three sniffs is exactly the
    // deterministic stub
    val rnd = new scala.util.Random(20260813L)
    for (_ <- 1 to 2000) {
      val p = new Array[Byte](rnd.nextInt(64))
      rnd.nextBytes(p)
      val got = MultimodalOps.decodeDims(p)
      val sniffed = p.length >= 24 // below any sniff minimum: always stub
      if (!sniffed) assert(got == stub(p.length))
    }
  }

  test("resize caps the long side, preserves aspect, passes small media") {
    import java.nio.{ByteBuffer, ByteOrder}
    def png(w: Int, h: Int): Array[Byte] = {
      val b = ByteBuffer.allocate(33).order(ByteOrder.BIG_ENDIAN)
      b.put(Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
        .map(_.toByte))
      b.putInt(13); b.put("IHDR".getBytes("US-ASCII"))
      b.putInt(w); b.putInt(h); b.put(Array[Byte](8, 6, 0, 0, 0))
      b.array()
    }
    import spark.implicits._
    val media = Seq(
      MultimodalOps.MediaRecord(1L, "image", png(640, 480)),
      MultimodalOps.MediaRecord(2L, "image", png(100, 50))).toDS()
    val out = MultimodalOps.resizeMedia(media, 256).collect()
      .map(r => r.doc_id -> r).toMap
    // 640×480 capped to 256 on the long side: 256×192, aspect exact
    assert((out(1L).out_w, out(1L).out_h) == ((256, 192)))
    assert((out(1L).src_w, out(1L).src_h) == ((640, 480)))
    // stub payload shrinks roughly with the area ratio, never to zero
    assert(out(1L).payload.length > 0 &&
      out(1L).payload.length < png(640, 480).length)
    // already within the cap: dims AND payload pass through untouched
    assert((out(2L).out_w, out(2L).out_h) == ((100, 50)))
    assert(out(2L).payload.sameElements(png(100, 50)))
    // deterministic: a second run produces identical bytes
    val again = MultimodalOps.resizeMedia(media, 256).collect()
      .map(r => r.doc_id -> r).toMap
    assert(again(1L).payload.sameElements(out(1L).payload))
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

  test("aHash64 is a perceptual signature: stable under small edits") {
    val base = Array.tabulate(4096)(i => ((i * 31 + 7) % 251).toByte)
    val h0 = MultimodalOps.aHash64(base)
    // identical payloads collide exactly
    assert(MultimodalOps.aHash64(base.clone()) == h0)
    // a single-byte perturbation moves at most a few bits — the
    // near-duplicate property a cryptographic hash cannot give
    val tweaked = base.clone(); tweaked(100) = (tweaked(100) + 40).toByte
    val ham = java.lang.Long.bitCount(MultimodalOps.aHash64(tweaked) ^ h0)
    assert(ham <= 4, s"1-byte edit moved $ham bits")
    // structurally different content lands far away
    val other = Array.tabulate(4096)(i => ((i / 64) % 2 * 200).toByte)
    val far = java.lang.Long.bitCount(MultimodalOps.aHash64(other) ^ h0)
    assert(far > 8, s"distinct content only $far bits apart")
    // degenerate inputs are total, not exceptional
    assert(MultimodalOps.aHash64(Array.emptyByteArray) == 0L)
    assert(MultimodalOps.aHash64(Array[Byte](42)) == 0L)
  }

  test("mediaSignatures clusters byte-identical docs, distributed") {
    import spark.implicits._
    val recs = Seq(
      MultimodalOps.MediaRecord(1L, "image",
        Array.tabulate(512)(i => (i % 97).toByte)),
      MultimodalOps.MediaRecord(2L, "image",
        Array.tabulate(512)(i => (i % 97).toByte)),
      MultimodalOps.MediaRecord(3L, "image",
        Array.tabulate(512)(i => (255 - i % 97).toByte))).toDS()
    val sigs = MultimodalOps.mediaSignatures(recs).collect()
      .map(s => s.doc_id -> s.ahash).toMap
    assert(sigs(1L) == sigs(2L), "identical payloads must collide")
    assert(sigs(1L) != sigs(3L), "inverted payload must not collide")
  }

  test("typed layer carries container animation metadata (r17 verdict 2)") {
    // extractMeta and mediaSignatures must agree with the byte walks on
    // real containers, and with the documented per-modality stub on raw
    // payloads — the two sources the typed layer unifies
    import spark.implicits._
    val body = "typed layer payload".getBytes("UTF-8")
    val recs = Seq(
      MultimodalOps.MediaRecord(1L, "image",
        MultimodalOps.mkGif(64, 64, body, frames = 3)),
      MultimodalOps.MediaRecord(2L, "image",
        MultimodalOps.mkWebp(64, 64, body, animated = true, alpha = true,
          frames = 4)),
      MultimodalOps.MediaRecord(3L, "image",
        MultimodalOps.mkPng(64, 64, body)),
      // raw payload with video modality: the stub frame count survives
      // (exact q37 agreement on document-derived corpora)
      MultimodalOps.MediaRecord(4L, "video", body)).toDS()
    val metas = MultimodalOps.extractMeta(recs).collect()
      .map(m => m.doc_id -> ((m.frames, m.animated, m.has_alpha))).toMap
    assert(metas(1L) === ((3, true, false)))
    assert(metas(2L) === ((4, true, true)))
    assert(metas(3L) === ((1, false, false)))
    assert(metas(4L) === (((body.length % 24) + 1, false, false)))
    // mediaSignatures tags the same container metadata alongside ahash
    val sigs = MultimodalOps.mediaSignatures(recs).collect()
      .map(s => s.doc_id -> ((s.frames, s.animated, s.has_alpha))).toMap
    assert(sigs(1L) === ((3, true, false)))
    assert(sigs(2L) === ((4, true, true)))
    assert(sigs(3L) === ((1, false, false)))
    // signatures describe the container: a raw payload is a still
    assert(sigs(4L) === ((1, false, false)))
  }

  test("sniffContainer: one shared recognition for all three layers") {
    val body = "sniff body".getBytes("UTF-8")
    assert(MultimodalOps.sniffContainer(
      MultimodalOps.mkPng(10, 10, body)) === "png")
    assert(MultimodalOps.sniffContainer(
      MultimodalOps.mkGif(10, 10, body)) === "gif")
    assert(MultimodalOps.sniffContainer(
      MultimodalOps.mkJpeg(10, 10, body)) === "jpeg")
    assert(MultimodalOps.sniffContainer(
      MultimodalOps.mkWebp(10, 10, body)) === "webp")
    assert(MultimodalOps.sniffContainer(
      MultimodalOps.mkTiff(10, 10, body)) === "tiff")
    assert(MultimodalOps.sniffContainer(body) === "raw")
    assert(MultimodalOps.sniffContainer(Array.emptyByteArray) === "raw")
  }
}
