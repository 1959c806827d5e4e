package graft.ext

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq((1L, "hello world"), (2L, "")).toDF("doc_id", "text")

  test("mediaTable lifts text into opaque payload + typed metadata") {
    val m = Multimodal.mediaTable(docs)
    assert(m.columns.toSeq == Seq("doc_id", "payload", "mime", "n_bytes"))
    val r = m.orderBy("doc_id").collect()
    assert(r(0).getAs[Array[Byte]]("payload").length == 11)
    assert(r(0).getLong(3) == 11L && r(1).getLong(3) == 0L)
  }

  test("resize checksums one stride-sampled byte per target cell") {
    // "hello world" = 11 bytes < 64 target cells -> stride 1, all bytes kept
    val out = Multimodal.resize(spark, Multimodal.mediaTable(docs), 8, 8)
      .collect().sortBy(_.doc_id)
    val expected = "hello world".getBytes.map(_ & 0xff).sum.toLong
    assert(out(0).checksum == expected)
    assert(out(0).target_w == 8 && out(0).target_h == 8)
    assert(out(1).checksum == 0L) // empty payload
  }

  test("sampleFrames keeps every k-th fixed-size frame with exact byte accounting") {
    // 11 bytes / frameBytes=4 -> frames 0..2; every=2 keeps frames 0 and 2
    val out = Multimodal.sampleFrames(spark, Multimodal.mediaTable(docs),
        frameBytes = 4, every = 2)
      .collect().filter(_.doc_id == 1L).sortBy(_.frame_idx)
    assert(out.map(_.frame_idx).toSeq == Seq(0, 2))
    assert(out(0).n_frame_bytes == 4 && out(1).n_frame_bytes == 3) // tail frame
    val b = "hello world".getBytes.map(_ & 0xff)
    assert(out(0).checksum == b.slice(0, 4).sum.toLong)
    assert(out(1).checksum == b.slice(8, 11).sum.toLong)
    // empty payload emits no frames
    assert(Multimodal.sampleFrames(spark, Multimodal.mediaTable(docs))
      .filter(_.doc_id == 2L).count() == 0)
  }

  test("extractFeatures produces deterministic typed features per record (stub codec)") {
    val out1 = Multimodal.extractFeatures(spark, Multimodal.mediaTable(docs))
      .collect().sortBy(_.doc_id)
    val out2 = Multimodal.extractFeatures(spark, Multimodal.mediaTable(docs))
      .collect().sortBy(_.doc_id)
    assert(out1.length == 2)
    assert(out1.head.features.length == 8)
    assert(out1.head.features.sameElements(out2.head.features)) // deterministic
    assert(out1(1).width == 1 && out1(1).features.forall(_ == 0.0f)) // empty payload
  }

  test("decodeImage reads a real BMP exactly: dims, channel means, luma stats") {
    // 4x2 gradient: pixel j has gray value 10*j -> every stat is hand-computable
    val bmp = Multimodal.encodeGrayBmp(4, 2, j => 10 * j)
    val Some((w, h, f)) = Multimodal.decodeImage(bmp)
    assert(w == 4 && h == 2)
    val grays = (0 until 8).map(10 * _)
    val mean = grays.sum / 8.0
    assert(math.abs(f(0) - mean / 255.0) < 1e-6) // meanR == gray mean
    assert(f(0) == f(1) && f(1) == f(2) && f(2) == f(3)) // grayscale: all channels equal
    assert(math.abs(f(5) - 0.0f) < 1e-6) // min luma 0
    assert(math.abs(f(6) - 70 / 255.0) < 1e-6) // max luma 70
    assert(math.abs(f(7) - 4.0 / 6.0) < 1e-6) // aspect w/(w+h)
  }

  test("decodeImage reads a real PNG (second JDK codec) and rejects garbage") {
    val img = new java.awt.image.BufferedImage(
      3, 5, java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until 15).foreach(j => img.setRGB(j % 3, j / 3, 0x00ff00)) // pure green
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    val Some((w, h, f)) = Multimodal.decodeImage(out.toByteArray)
    assert(w == 3 && h == 5)
    assert(f(0) == 0.0f && f(1) == 1.0f && f(2) == 0.0f) // R=0, G=255, B=0
    assert(math.abs(f(3) - 85 / 255.0) < 1e-6) // luma (0+255+0)/3 = 85
    assert(math.abs(f(4)) < 1e-6) // constant image: zero std
    assert(Multimodal.decodeImage("not an image".getBytes).isEmpty)
  }

  test("bmpRoundTrip: encode->real decode returns exact dims and luma sum") {
    val rt = Multimodal.bmpRoundTrip(spark, Multimodal.mediaTable(docs))
      .orderBy("doc_id").collect()
    // doc 1: "hello world" (11 bytes) -> w = 1+11%16 = 12, h = 1+1%16 = 2
    val b = "hello world".getBytes.map(_ & 0xff)
    val expected = (0 until 24).map(j => b(j % 11)).sum.toLong
    assert(rt(0).getLong(1) == 12L && rt(0).getLong(2) == 2L)
    assert(rt(0).getLong(3) == expected)
    // doc 2: empty payload passes through with zero dims
    assert(rt(1).getLong(1) == 0L && rt(1).getLong(3) == 0L)
  }

  test("decodeAudio reads a real WAV exactly: every PCM sample round-trips") {
    val samples = Array(0, 1000, -1000, 32767, -32768, 12345, -1)
    val wav = Multimodal.encodePcmWav(samples, sampleRate = 8000f)
    val (fmt, back) = Multimodal.decodeAudio(wav).get
    assert(fmt.getChannels == 1 && fmt.getSampleRate == 8000f)
    assert(back.toSeq == samples.toSeq)
    // garbage bytes do not decode (caller falls back to the stub)
    assert(Multimodal.decodeAudio("not a wav".getBytes).isEmpty)
  }

  test("decode dispatch routes audio/wav to the real codec (sample count + channels)") {
    val wav = Multimodal.encodePcmWav(Array(100, -100, 200, -200, 0))
    val (n, ch, feats) = Multimodal.decode(wav, "audio/wav")
    assert(n == 5 && ch == 1)
    // meanAmp = (100+100+200+200+0)/5/32768
    assert(math.abs(feats(0) - 600.0 / 5 / 32768.0) < 1e-6)
    // an unknown mime with the same bytes goes to the stub instead
    val (sw, _, _) = Multimodal.decode(wav, "audio/mpeg")
    assert(sw == 1 + wav.length % 640)
  }

  test("wavRoundTrip: encode->real decode returns exact sample count and amplitude sum") {
    val rt = Multimodal.wavRoundTrip(spark, Multimodal.mediaTable(docs))
      .orderBy("doc_id").collect()
    // doc 1: "hello world" (11 bytes) -> n = 1+11%64 = 12 samples;
    // amp_sum = sum over j<12 of |byte(j%11) - 128|
    val b = "hello world".getBytes.map(_ & 0xff)
    val expected = (0 until 12).map(j => math.abs(b(j % 11) - 128)).sum.toLong
    assert(rt(0).getLong(1) == 12L && rt(0).getLong(2) == 1L)
    assert(rt(0).getLong(3) == expected)
    // doc 2: empty payload passes through as zeros
    assert(rt(1).getLong(1) == 0L && rt(1).getLong(3) == 0L)
  }

  test("wavAudioStats: energy/peak/mean-crossings replay the byte arithmetic") {
    val st = Multimodal.wavAudioStats(spark, Multimodal.mediaTable(docs))
      .orderBy("doc_id").collect()
    // doc 1: "hello world" -> 12 samples, s_j = (b(j%11)-128)<<8
    val b = "hello world".getBytes.map(_ & 0xff)
    val s = (0 until 12).map(j => (b(j % 11) - 128) << 8)
    val sum = s.map(_.toLong).sum
    val mc = (1 until 12).count(j =>
      (s(j - 1).toLong * 12 - sum >= 0) != (s(j).toLong * 12 - sum >= 0))
    assert(st(0).getLong(1) == 12L)
    assert(st(0).getLong(2) == mc.toLong)
    assert(st(0).getLong(3) == s.map(v => v.toLong * v).sum)
    assert(st(0).getLong(4) == s.map(v => math.abs(v).toLong).max)
    // varied bytes MUST cross their own mean (the feature is not degenerate
    // on ASCII, unlike a plain sign-based ZCR)
    assert(st(0).getLong(2) > 0L)
    // doc 2: empty payload -> all zeros
    assert((1 to 4).forall(i => st(1).getLong(i) == 0L))
  }
}
