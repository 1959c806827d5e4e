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
}
