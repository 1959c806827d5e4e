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
