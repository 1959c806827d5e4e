package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("cosine: identical=1, orthogonal=0, opposite=-1") {
    val df = Seq(
      (Seq(1.0f, 0.0f), Seq(1.0f, 0.0f)),
      (Seq(1.0f, 0.0f), Seq(0.0f, 1.0f)),
      (Seq(1.0f, 0.0f), Seq(-1.0f, 0.0f))).toDF("a", "b")
      .select(Similarity.cosine(col("a"), col("b")).as("c"))
    assert(df.collect().map(_.getDouble(0)).toSeq == Seq(1.0, 0.0, -1.0))
  }

  test("cosine with an all-zero vector is NULL, not an ANSI divide-by-zero failure") {
    val r = Seq((Seq(0.0f, 0.0f), Seq(1.0f, 2.0f))).toDF("a", "b")
      .select(Similarity.cosine(col("a"), col("b")).as("c")).head
    assert(r.isNullAt(0))
  }

  test("bruteForceTopK ranks nearest first with deterministic tiebreaks") {
    val vecs = Seq(
      (0L, Seq(1.0f, 0.0f)),
      (1L, Seq(0.9f, 0.1f)),   // closest to 0
      (2L, Seq(0.0f, 1.0f)),   // orthogonal to 0
      (3L, Seq(0.7f, 0.3f))).toDF("vec_id", "embedding")
    val out = Similarity.bruteForceTopK(vecs, vecs.where(col("vec_id") === 0),
        "vec_id", "embedding", k = 2)
      .orderBy("rank").collect().map(r => (r.getLong(1), r.getLong(3)))
    assert(out.toSeq == Seq((1L, 1L), (3L, 2L)))
  }

  test("embeddingNearDup finds high-cosine pairs within a bucket only") {
    val vecs = Seq(
      (0L, 1, Seq(1.0f, 0.0f)),
      (1L, 1, Seq(0.99f, 0.01f)), // same bucket, near
      (2L, 2, Seq(1.0f, 0.0f))    // near but different bucket
    ).toDF("vec_id", "label", "embedding")
    val out = Similarity.embeddingNearDup(vecs, "vec_id", "embedding", "label", 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq((0L, 1L)))
  }

  test("lshBucket assigns equal vectors to equal buckets deterministically") {
    val vecs = Seq(
      (0L, Seq.fill(4)(1.0f)),
      (1L, Seq.fill(4)(1.0f))).toDF("vec_id", "embedding")
    val b = vecs.select(Similarity.lshBucket(col("embedding"), 4, 4).as("b"))
      .collect().map(_.getLong(0))
    assert(b(0) == b(1))
  }

  test("lshTopK recall vs brute force is usable on the real corpus (sf0.001)") {
    val e = graft.io.Tables(spark, "/root/testdata/sf0.001").embeddings
    val q = e.where(col("vec_id") < 10)
    val exact = Similarity.bruteForceTopK(e, q, "vec_id", "embedding", k = 5)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // this corpus's nearest neighbors sit near cos≈0.4 (bit-agreement
    // p≈0.63): with 4 planes × 6 tables expected recall ≈ 1-(1-p⁴)⁶ ≈ 0.65
    val approx = Similarity.lshTopK(e, q, "vec_id", "embedding", k = 5,
        nPlanes = 4, tables = 6)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.4, s"LSH recall collapsed: $recall")
    assert(approx.nonEmpty && approx.size <= exact.size)
  }

  test("native vec_dot/cosine_sim match the HOF fold bit-for-bit") {
    assert(spark.catalog.functionExists("vec_dot"), "GraftExtensions not loaded")
    val vecs = Seq(
      (Seq(0.3f, -1.2f, 7.5f, 0.01f), Seq(2.0f, 0.5f, -0.25f, 9.9f)),
      (Seq(1.0f, 2.0f, 3.0f, 4.0f), Seq(4.0f, 3.0f, 2.0f, 1.0f))).toDF("a", "b")
    val both = vecs.select(
      call_function("vec_dot", col("a"), col("b")).as("nd"),
      Similarity.dot(col("a"), col("b")).as("hd"),
      call_function("cosine_sim", col("a"), col("b")).as("nc"),
      Similarity.cosine(col("a"), col("b")).as("hc")).collect()
    both.foreach { r =>
      assert(r.getDouble(0) == r.getDouble(1))
      assert(r.getDouble(2) == r.getDouble(3))
    }
  }

  test("native expressions handle null elements and length mismatch") {
    val df = Seq(
      (Seq[java.lang.Float](1.0f, null), Seq[java.lang.Float](1.0f, 2.0f)),
      (Seq[java.lang.Float](1.0f, 2.0f, 3.0f), Seq[java.lang.Float](1.0f, 1.0f)))
      .toDF("a", "b")
      .select(call_function("vec_dot", col("a"), col("b")).as("d"))
      .collect()
    assert(df(0).isNullAt(0))
    // ragged arrays → NULL, matching the HOF fold (zip_with null-pads the
    // shorter side, propagating NULL) — the same query must not change
    // results depending on whether the native extension is registered
    assert(df(1).isNullAt(0))
  }

  test("lshTopK finds the same top neighbor as brute force for close vectors") {
    val vecs = Seq(
      (0L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
      (1L, Seq(0.99f, 0.01f, 0.0f, 0.0f)),
      (2L, Seq(0.98f, 0.02f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val out = Similarity.lshTopK(vecs, vecs.where(col("vec_id") === 0),
        "vec_id", "embedding", k = 1, nPlanes = 2, dim = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // with 2 planes the bucket is coarse; near-identical vectors share it
    assert(out.toSeq == Seq((0L, 1L)))
  }

  test("LSH-bucketed near-dup finds planted high-cosine pairs (same sign pattern → same bucket)") {
    val vecs = Seq(
      (1L, Seq(1.0f, 0.02f, 0.0f, 0.0f)),
      (2L, Seq(0.99f, 0.01f, 0.0f, 0.0f)),   // near-dup of 1
      (3L, Seq(-1.0f, -0.02f, 0.0f, 0.0f))   // antipode: different bucket
    ).toDF("vec_id", "embedding")
      .withColumn("b", Similarity.lshBucket(col("embedding"), 2, 4))
    val pairs = Similarity.embeddingNearDup(vecs, "vec_id", "embedding", "b",
        threshold = 0.9)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("zero-norm vectors never rank (NaN guard): a zero corpus vector is excluded, not rank 1") {
    val vecs = Seq(
      (0L, Seq(1.0f, 0.0f)),
      (1L, Seq(0.9f, 0.1f)),
      (2L, Seq(0.0f, 0.0f))   // zero vector: cosine undefined
    ).toDF("vec_id", "embedding")
    val out = Similarity.bruteForceTopK(vecs, vecs.where(col("vec_id") === 0),
        "vec_id", "embedding", k = 2)
      .select("n_id").as[Long].collect().toSet
    assert(out == Set(1L)) // NOT 2L at rank 1 via NaN
  }

  test("ndcgByQuery: perfect order = 1.0; out-of-range candidate rank degrades, never NaN") {
    val truth = Seq((1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3))
      .toDF("q_id", "n_id", "rank")
    val perfect = Similarity.ndcgByQuery(truth, truth, k = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(perfect(1L) == 1.0, s"got $perfect")
    // a candidate list DEEPER than k (rank 4 > k=3): the miss at rank 4
    // contributes rel 0 via the runtime-log2 fallback discount — the
    // query's ndcg must stay finite (r10 folded to NaN and one such row
    // poisoned the whole sum)
    val deep = truth.union(Seq((1L, 99L, 4)).toDF("q_id", "n_id", "rank"))
    val got = Similarity.ndcgByQuery(truth, deep, k = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(!got(1L).isNaN && got(1L) == 1.0, s"got $got")
    // and an out-of-range HIT (truth-relevant doc at candidate rank 4)
    // degrades gracefully: finite, between 0 and 1
    val lateHit = Seq((1L, 99L, 1), (1L, 98L, 2), (1L, 97L, 3), (1L, 10L, 4))
      .toDF("q_id", "n_id", "rank")
    val lh = Similarity.ndcgByQuery(truth, lateHit, k = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(!lh(1L).isNaN && lh(1L) > 0.0 && lh(1L) < 1.0, s"got $lh")
  }

  test("quantize maps [mn,mx] to [0,255] codes; constant vectors to zeros; dequant error bounded") {
    val vecs = Seq(
      (0L, Seq(0.0f, 0.5f, 1.0f)),
      (1L, Seq(2.0f, 2.0f, 2.0f))).toDF("vec_id", "embedding")
    val rows = Similarity.quantize(vecs, "vec_id", "embedding")
      .collect().map(r => r.getLong(0) ->
        ((r.getDouble(1), r.getDouble(2), r.getSeq[Long](3)))).toMap
    assert(rows(0L) == ((0.0, 1.0, Seq(0L, 127L, 255L)))) // 0.5*255 floors to 127
    assert(rows(1L) == ((2.0, 2.0, Seq(0L, 0L, 0L))))
    // dequantization error bound: |x - (mn + code/255*(mx-mn))| <= (mx-mn)/255
    val (mn, mx, codes) = rows(0L)
    val orig = Seq(0.0, 0.5, 1.0)
    codes.zip(orig).foreach { case (c, x) =>
      assert(math.abs(x - (mn + c.toDouble / 255 * (mx - mn))) <= (mx - mn) / 255)
    }
  }

  test("semanticDedup canonicalizes planted clusters; far vectors keep themselves") {
    val vecs = Seq(
      (0L, Seq(1.0f, 0.0f)),       // group A: pairwise cosine ~0.999+
      (1L, Seq(0.999f, 0.001f)),
      (2L, Seq(0.998f, 0.002f)),
      (10L, Seq(0.0f, 1.0f)),      // group B
      (11L, Seq(0.001f, 0.999f)),
      (20L, Seq(0.7f, 0.7f))       // cosine ~0.707 to both groups: kept
    ).toDF("vec_id", "embedding").repartition(4)
    val out = Similarity.semanticDedup(vecs, "vec_id", "embedding",
        k = 2, iters = 2, threshold = 0.95)
      .select("vec_id", "component").as[(Long, Long)].collect().toMap
    // each planted group collapses to its minimum id through the pair
    // chain; the isolated vector is its own component
    assert(out(0L) == 0L && out(1L) == 0L && out(2L) == 0L)
    assert(out(10L) == 10L && out(11L) == 10L)
    assert(out(20L) == 20L)
  }

  test("semanticDedup is chain-transitive within a cell: a~b, b~c merge even when a!~c") {
    // 3 coplanar vectors 15 degrees apart: adjacent cosine ~0.966 >= 0.95,
    // endpoints cosine(30 deg) ~0.866 < 0.95 — only the CHAIN links them
    def at(deg: Double) = Seq(math.cos(math.toRadians(deg)).toFloat,
      math.sin(math.toRadians(deg)).toFloat)
    val vecs = Seq((5L, at(0)), (6L, at(15)), (7L, at(30)))
      .toDF("vec_id", "embedding")
    val out = Similarity.semanticDedup(vecs, "vec_id", "embedding",
        k = 1, iters = 1, threshold = 0.95)
      .select("vec_id", "component").as[(Long, Long)].collect().toMap
    assert(out == Map(5L -> 5L, 6L -> 5L, 7L -> 5L))
  }
}
