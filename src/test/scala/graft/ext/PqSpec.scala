package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

class PqSpec extends SparkSpec {
  import spark.implicits._

  test("encode: m in-range codes per vector; identical vectors get identical codes") {
    val vecs = Seq(
      (0L, (0 until 8).map(_.toFloat)),
      (1L, (0 until 8).map(_.toFloat)),          // clone of 0
      (2L, (0 until 8).map(i => (7 - i).toFloat))
    ).toDF("vec_id", "embedding")
    val cbs = Pq.train(vecs, "vec_id", "embedding", m = 2, dsub = 4, ksub = 2)
    val codes = Pq.encode(vecs, "vec_id", "embedding", cbs)
      .as[(Long, Seq[Int])].collect().toMap
    assert(codes.values.forall(_.length == 2))
    codes.values.flatten.foreach(c => assert(c >= 0 && c < 2))
    assert(codes(0L) == codes(1L))
  }

  test("ADC is EXACT when every subspace has at most ksub distinct subvectors") {
    // 3 distinct patterns per subspace, ksub = 4: after one Lloyd round each
    // populated cell holds identical subvectors, so its mean IS the pattern
    // and the ADC lookup reproduces the true dot product bit-for-bit
    val pats = Seq(
      Seq(1.0f, 0.0f, 2.0f, 0.5f),
      Seq(0.0f, 3.0f, 1.0f, 1.5f),
      Seq(2.0f, 1.0f, 0.0f, 2.5f))
    val vecs = (0 until 9).map { i =>
      (i.toLong, pats(i % 3) ++ pats((i / 3) % 3))
    }.toDF("vec_id", "embedding")
    val cbs = Pq.train(vecs, "vec_id", "embedding", m = 2, dsub = 4, ksub = 4)
    val adc = Pq.adcTopK(vecs, vecs.where(col("vec_id") < 3),
        "vec_id", "embedding", cbs, k = 8, roundTo = 6)
      .select("q_id", "n_id", "adc").as[(Long, Long, Double)].collect()
      .map { case (q, n, s) => (q, n) -> s }.toMap
    val exact = vecs.as[(Long, Seq[Float])].collect().toMap
    def dot(a: Seq[Float], b: Seq[Float]) =
      a.zip(b).foldLeft(0.0)((acc, p) => acc + p._1.toDouble * p._2.toDouble)
    adc.foreach { case ((q, n), s) =>
      assert(math.abs(s - dot(exact(q), exact(n))) < 1e-6,
        s"ADC($q,$n)=$s != exact ${dot(exact(q), exact(n))}")
    }
  }

  test("ragged codebooks (dropped Lloyd cell) encode positionally correct codes") {
    // subspace 0 keeps 2 codewords, subspace 1 trained down to 1 — the
    // shape train() returns when a Lloyd cell ends up empty. The flattened
    // native-kernel layout would misread this (offsets assume uniform
    // ksub), so encode must route ragged geometries to the composed form.
    val ragged: Pq.Codebooks =
      Seq(Seq(Seq(0.0, 0.0), Seq(10.0, 10.0)), Seq(Seq(5.0, 5.0)))
    val vecs = Seq(
      (0L, Seq(9.0f, 9.0f, 1.0f, 1.0f)),   // sub0 → code 1 (near [10,10])
      (1L, Seq(1.0f, 1.0f, 7.0f, 7.0f))    // sub0 → code 0 (near [0,0])
    ).toDF("vec_id", "embedding")
    val codes = Pq.encode(vecs, "vec_id", "embedding", ragged)
      .as[(Long, Seq[Int])].collect().toMap
    assert(codes(0L) == Seq(1, 0), s"got ${codes(0L)}")
    assert(codes(1L) == Seq(0, 0), s"got ${codes(1L)}")
    // ADC against the ragged book must use per-subspace offsets (0, 2)
    val adc = Pq.adcTopK(vecs, vecs.where(col("vec_id") === 0L),
        "vec_id", "embedding", ragged, k = 1, roundTo = 6)
      .select("q_id", "n_id", "adc").as[(Long, Long, Double)].collect()
    // dt(q0) = [dot(sub0,[0,0])=0, dot(sub0,[10,10])=180, dot(sub1,[5,5])=10]
    // n1 codes = (0,0) → adc = 0 + 10
    assert(adc.toSeq == Seq((0L, 1L, 10.0)), s"got ${adc.toSeq}")
  }

  test("kernel NaN ordering matches the composed array_min/array_max forms") {
    // NaN vector: every assignment score is NaN. Composed array_min over
    // (score, code) structs treats NaN scores as equal-greatest and
    // tiebreaks to the SMALLEST code → 0; nearest_cell's array_max analog
    // tiebreaks to the LARGEST cell id. The kernels must agree.
    val nan = Seq((0L, Seq(Float.NaN, Float.NaN, Float.NaN, Float.NaN)))
      .toDF("vec_id", "embedding")
    val cbs: Pq.Codebooks =
      Seq(Seq(Seq(1.0, 0.0), Seq(0.0, 1.0)), Seq(Seq(1.0, 1.0), Seq(2.0, 2.0)))
    assert(spark.catalog.functionExists("pq_codes"),
      "native kernels must be registered for this parity test")
    val codes = Pq.encode(nan, "vec_id", "embedding", cbs)
      .as[(Long, Seq[Int])].collect().head._2
    assert(codes == Seq(0, 0), s"pq_codes NaN tiebreak: got $codes")
    val cell = nan.select(call_function("nearest_cell", col("embedding"),
        typedLit(Array(1.0, 0.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0)),
        typedLit(Array(3, 7)), lit(4)).as("c"))
      .as[Int].collect().head
    assert(cell == 7, s"nearest_cell NaN tiebreak: got $cell (want largest id)")
  }

  test("ADC recall@5 vs exact dot top-5 is usable on the real corpus (sf0.001)") {
    val e = graft.io.Tables(spark, "/root/testdata/sf0.001").embeddings
    val q = e.where(col("vec_id") < 10)
    val cbs = Pq.train(e, "vec_id", "embedding", m = 16, dsub = 4, ksub = 16)
    val approx = Pq.adcTopK(e, q, "vec_id", "embedding", cbs, k = 5)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    // exact top-5 by the SAME metric ADC approximates (raw dot product)
    val d = Similarity.dot(col("a.embedding"), col("b.embedding"))
    val exact = q.as("a").crossJoin(e.as("b"))
      .where(col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("q_id"), col("b.vec_id").as("n_id"),
        round(d, 4).as("dp"))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("q_id"))
          .orderBy(col("dp").desc, col("n_id"))))
      .where(col("rank") <= 5)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val recall = approx.intersect(exact).size.toDouble / exact.size
    info(s"PQ ADC recall@5 = $recall")
    // iid-random embeddings are PQ's adversarial case (no cluster structure
    // for the codebooks to exploit); measured 0.42 at m=16/ksub=16 vs 0.04
    // at m=4 — pin a floor with corpus-regeneration margin so a mechanism
    // regression (not data noise) is what trips it
    assert(recall >= 0.2, s"PQ recall@5 $recall below floor")
  }
}
