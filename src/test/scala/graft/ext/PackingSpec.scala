package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class PackingSpec extends SparkSpec {
  import spark.implicits._

  private def docs(lens: (Long, Int)*) =
    lens.toSeq.toDF("doc_id", "len")

  test("packChunks lays docs end-to-end and splits boundary crossers") {
    val out = Packing.packChunks(docs(0L -> 6, 1L -> 3, 2L -> 8), "doc_id",
        col("len"), capacity = 10)
      .as[(Long, Long, Long, Long)].collect().toSet
    // axis: doc0 [0,6) doc1 [6,9) doc2 [9,17) → doc2 splits at 10
    assert(out == Set(
      (0L, 0L, 0L, 6L), (1L, 0L, 6L, 9L),
      (2L, 0L, 9L, 10L), (2L, 1L, 10L, 17L)))
  }

  test("every chunk except the last is exactly full; spans tile without gaps") {
    val n = 200
    val d = (0 until n).map(i => (i.toLong, 1 + (i * 37) % 95)).toSeq
    val chunks = Packing.packChunks(docs(d: _*), "doc_id", col("len"), 128)
    val stats = Packing.chunkStats(chunks, 128)
      .orderBy("chunk_id").as[(Long, Long, Long, Double)].collect()
    val total = d.map(_._2.toLong).sum
    stats.init.foreach { case (_, _, tok, fill) =>
      assert(tok == 128 && fill == 1.0) }
    assert(stats.map(_._3).sum == total)
    assert(stats.map(_._1).toSeq == stats.indices.map(_.toLong))
  }

  test("bucketed prefix sum matches the single-window reference; zero-length docs drop") {
    val d = (0 until 500).map(i => (i.toLong, (i * 13) % 40)).toSeq // some zeros
    val df = docs(d: _*)
    // tiny bucketWidth forces many buckets → the two-level path is exercised
    val fast = Packing.packChunks(df, "doc_id", col("len"), 256, bucketWidth = 16)
    val ref = {
      val w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
      df.where(col("len") > 0)
        .withColumn("s", coalesce(sum(col("len").cast("long")).over(w), lit(0L)))
        .withColumn("chunk_id", explode(sequence(
          floor(col("s") / 256), floor((col("s") + col("len") - 1) / 256))))
        .select(col("doc_id"), col("chunk_id"),
          greatest(col("s"), col("chunk_id") * 256L).as("tok_start"),
          least(col("s") + col("len"), (col("chunk_id") + 1) * 256L).as("tok_end"))
    }
    assert(fast.as[(Long, Long, Long, Long)].collect().toSet ==
      ref.as[(Long, Long, Long, Long)].collect().toSet)
    assert(fast.where(col("doc_id").isin(0L)).count() == 0) // len(doc 0) = 0
  }

  test("packWholeDocs: next-fit whole-doc assignment, one-doc overhang allowed") {
    // lens 5, 4, 3 at capacity 6: starts 0, 5, 9 → doc 2 stays WHOLE in
    // chunk 0 (load 9 overhangs by its own tail), doc 3 opens chunk 1
    val docs = Seq((1L, 5L), (2L, 4L), (3L, 3L)).toDF("doc_id", "len")
    val got = Packing.packWholeDocs(docs, "doc_id", col("len"), capacity = 6)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 0L, 5L), (2L, 0L, 4L), (3L, 1L, 3L)))
    // vs packChunks, which SPLITS doc 2 across the boundary
    val split = Packing.packChunks(docs, "doc_id", col("len"), capacity = 6)
      .where(col("doc_id") === 2L).count()
    assert(split == 2L)
  }
}
