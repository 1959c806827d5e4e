package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

class PcaSpec extends SparkSpec {
  import spark.implicits._

  test("VectorMoments sums, gram and count survive partial merge") {
    val df = Seq(
      Array(1.0f, 2.0f), Array(3.0f, 4.0f), Array(5.0f, 6.0f))
      .toDF("v").repartition(3)
    val (n, s, g) = df.select(col("v")).as[Array[Float]]
      .select(VectorMoments.toColumn).head()
    assert(n == 3L)
    assert(s.toSeq == Seq(9.0, 12.0))
    // gram row-major: [Σx², Σxy, Σxy, Σy²]
    assert(g.toSeq == Seq(1 + 9 + 25.0, 2 + 12 + 30.0, 2 + 12 + 30.0, 4 + 16 + 36.0))
  }

  test("fitProject2 recovers a planted dominant direction") {
    // x = t·u + small noise, u = (3,4)/5: pc1 must align with u (|cos|>0.99)
    // in PROJECTION terms — corr(pc1, t) — and pc2 carries the residual.
    val u = Array(0.6, 0.8)
    val rnd = new scala.util.Random(7)
    val rows = (0 until 400).map { i =>
      val t = rnd.nextGaussian() * 10
      val e1 = rnd.nextGaussian() * 0.1
      val e2 = rnd.nextGaussian() * 0.1
      (i.toLong, Array((t * u(0) + e1).toFloat, (t * u(1) + e2).toFloat), t)
    }
    val df = rows.map { case (id, v, _) => (id, v) }.toDF("vec_id", "embedding")
    val proj = Pca.fitProject2(df, "vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val ts = rows.map { case (id, _, t) => id -> t }.toMap
    val xs = rows.map(r => proj(r._1)._1)
    val ys = rows.map(r => ts(r._1))
    def corr(a: Seq[Double], b: Seq[Double]): Double = {
      val (ma, mb) = (a.sum / a.size, b.sum / b.size)
      val cov = a.zip(b).map { case (x, y) => (x - ma) * (y - mb) }.sum
      val (sa, sb) = (math.sqrt(a.map(x => (x - ma) * (x - ma)).sum),
        math.sqrt(b.map(x => (x - mb) * (x - mb)).sum))
      cov / (sa * sb)
    }
    assert(math.abs(corr(xs, ys)) > 0.99)
    // variance ordering: pc1 must capture (far) more than pc2
    def variance(a: Seq[Double]): Double = {
      val m = a.sum / a.size
      a.map(x => (x - m) * (x - m)).sum / a.size
    }
    val pc2s = rows.map(r => proj(r._1)._2)
    assert(variance(xs) > 10 * variance(pc2s))
    // projections are centered (mean ~ 0 by construction)
    assert(math.abs(xs.sum / xs.size) < 0.01)
  }

  test("fitProject2 is deterministic across runs and repartitionings") {
    val df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val a = Pca.fitProject2(df, "vec_id", "embedding")
      .orderBy("vec_id").collect().toSeq
    val b = Pca.fitProject2(df.repartition(13), "vec_id", "embedding")
      .orderBy("vec_id").collect().toSeq
    assert(a.nonEmpty && a == b)
  }

  test("oracleSql2 names every generated CTE it references") {
    val sql = Pca.oracleSql2("embeddings", "vec_id", "embedding", dim = 64)
    // chain wiring: both component chains fully generated, referenced tails exist
    assert(sql.contains("p1v24") && sql.contains("p2v24"))
    assert(sql.contains("p1w1 ") || sql.contains("p1w1\n") || sql.contains("p1w1 AS"))
    assert(!sql.contains("p1v25") && !sql.contains("p2v25"))
  }
}
