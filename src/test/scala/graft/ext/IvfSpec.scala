package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

class IvfSpec extends SparkSpec {
  import spark.implicits._

  test("VectorCentroid aggregates element-wise means with partial merge") {
    val df = Seq(
      (0, Array(1.0f, 3.0f)), (0, Array(3.0f, 5.0f)),
      (1, Array(10.0f, 10.0f))).toDF("cell", "vec").repartition(3)
    val out = Ivf.centroids(df, "cell", "vec")
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1).toSeq).toMap
    assert(out(0) == Seq(2.0, 4.0))
    assert(out(1) == Seq(10.0, 10.0))
  }

  test("ivfTopK searches only probed cells and ranks by cosine") {
    val vecs = Seq(
      (0L, 1, Seq(1.0f, 0.0f)),
      (1L, 1, Seq(0.95f, 0.05f)),
      (2L, 2, Seq(0.0f, 1.0f)),
      (3L, 2, Seq(0.05f, 0.95f))).toDF("vec_id", "label", "embedding")
    val out = Ivf.ivfTopK(vecs, vecs.where(col("vec_id") === 0),
        "vec_id", "embedding", "label", k = 2, nprobe = 1)
      .orderBy("rank").collect().map(_.getLong(1))
    assert(out.head == 1L) // nearest neighbor in the probed (own) cell
    assert(!out.contains(2L) || out.length <= 2)
  }

  test("kmeansCells recovers separable clusters") {
    val rnd = new scala.util.Random(7)
    def around(base: Seq[Float]) = base.map(v => v + rnd.nextFloat() * 0.05f)
    val clusters = Seq(
      Seq(1.0f, 0.0f, 0.0f), Seq(0.0f, 1.0f, 0.0f), Seq(0.0f, 0.0f, 1.0f))
    val rows = for {
      (base, ci) <- clusters.zipWithIndex
      j <- 0 until 20
    } yield ((ci * 20 + j).toLong, around(base), ci)
    val df = rows.map { case (id, v, ci) => (id, v, ci) }
      .toDF("vec_id", "embedding", "true_cluster")
    val cells = Ivf.kmeansCells(df, "vec_id", "embedding", k = 3, iters = 3)
    // each learned cell must be pure: one true cluster per cell
    val purity = cells.groupBy("cell")
      .agg(countDistinct("true_cluster").as("n"))
      .collect().map(_.getLong(1))
    assert(purity.forall(_ == 1L), s"mixed cells: ${purity.toSeq}")
    assert(purity.length == 3)
  }

  test("ivfTopK works over kmeans-learned cells") {
    val e = graft.io.Tables(spark, "/root/testdata/sf0.001").embeddings
    val cells = Ivf.kmeansCells(e, "vec_id", "embedding", k = 8, iters = 2)
    val out = Ivf.ivfTopK(cells, cells.where(col("vec_id") < 5),
      "vec_id", "embedding", "cell", k = 3, nprobe = 2)
    assert(out.count() > 0)
    assert(out.groupBy("q_id").count().collect().forall(_.getLong(1) <= 3))
  }

  test("ivfTopK recall vs brute force on the real corpus (label cells, nprobe=3)") {
    val e = graft.io.Tables(spark, "/root/testdata/sf0.001").embeddings
    val q = e.where(col("vec_id") < 10)
    val exact = Similarity.bruteForceTopK(e, q, "vec_id", "embedding", k = 5)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Ivf.ivfTopK(e, q, "vec_id", "embedding", "label", k = 5, nprobe = 3)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    // random embeddings don't cluster by label; 3/10 cells ≈ 30% of the
    // corpus searched — recall should be at least in that neighborhood
    assert(recall >= 0.2, s"IVF recall collapsed: $recall")
  }
}
