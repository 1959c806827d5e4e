package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization (PQ) for embedding search — the classic ANN memory
  * lever (Jégou et al., "Product Quantization for Nearest Neighbor Search",
  * public literature): the vector space is split into `m` subspaces, each
  * subspace k-means'd into `ksub` codewords, and every corpus vector is
  * stored as `m` small codes (here 4 × 16 codes = 4 bytes) instead of
  * dim × 4 float bytes — a 64× compression at dim 64. Queries score
  * against codes by ADC (asymmetric distance computation): the query
  * precomputes its dot product against every codeword ONCE (m × ksub
  * values), and each candidate then costs `m` table lookups + adds instead
  * of a dim-length dot product.
  *
  * 100 TB posture: training state is m × ksub × dsub doubles — collected
  * and re-broadcast as literals, the corpus never moves; encoding is one
  * narrow projection; ADC search shuffles only the (q_id, dt) query frame
  * (broadcast — queries are the small side) and per-pair work is O(m).
  * The same determinism contract as [[Ivf.kmeansCells]]: seeding is a
  * total order over an engine-neutral hash, assignment ties break on code,
  * scores round before ranking — so a second engine can replay training,
  * encoding, AND search bit-stably (see `topk_sim_pq`'s unrolled oracle).
  */
object Pq {

  /** Per-subspace codebooks, positionally coded: `cbs(s)(i)` is codeword
    * `i` of subspace `s` (centroids sorted by their training cell id, so
    * positional code == training code while all cells stay populated). */
  type Codebooks = Seq[Seq[Seq[Double]]]

  /** 1-based sub-vector slice of subspace `s` (length `dsub`). */
  private def subCol(vec: Column, s: Int, dsub: Int): Column =
    slice(vec, s * dsub + 1, dsub)

  /** Positional code of the L2-nearest codeword. argmin ||x−c||² over c ==
    * argmin (c·c − 2·x·c) — the ||x||² term is constant per row, and this
    * form needs only dot products, which both engines compute as the same
    * sequential double fold. Ties break toward the smaller code. `cc` is
    * the driver-precomputed c·c (same left-to-right fold as the runtime
    * dot, so the replayed oracle agrees up to assignment margins). */
  private def assignCol(df: DataFrame, sub: Column,
                        cents: Seq[Seq[Double]]): Column = {
    val d = Similarity.pdot(df) _
    array_min(array(cents.zipWithIndex.map { case (c, code) =>
      val cc = c.foldLeft(0.0)((acc, x) => acc + x * x)
      struct((lit(cc) - lit(2.0) * d(sub, typedlit(c))).as("score"),
        lit(code).as("code"))
    }: _*)).getField("code")
  }

  /** Train per-subspace codebooks: deterministic seeding (first `ksub`
    * rows by `orderHash`, `idCol` tiebreak — same contract as
    * [[Ivf.kmeansCells]]), then ONE Lloyd refinement per subspace (assign
    * against the seeds, recompute means via the typed [[VectorCentroid]]
    * aggregator). Each subspace costs one bounded collect (ksub × dsub
    * doubles) plus one aggregation job over the corpus. */
  def train(df: DataFrame, idCol: String, vecCol: String,
            m: Int, dsub: Int, ksub: Int,
            orderHash: Option[Column] = None, seed: Long = 42L): Codebooks = {
    val work = df.persist()
    val seedOrder = orderHash.getOrElse(xxhash64(col(idCol), lit(seed)))
    val out = (0 until m).map { s =>
      val sub = work.select(col(idCol),
        subCol(col(vecCol), s, dsub).as("__sub"))
      val seeds: Seq[Seq[Double]] = sub
        .orderBy(seedOrder, col(idCol))
        .limit(ksub).select(col("__sub")).collect()
        .map(_.getSeq[Float](0).map(_.toDouble).toSeq).toSeq
      val assigned = sub.withColumn("cell", assignCol(sub, col("__sub"), seeds))
      Ivf.centroids(assigned, "cell", "__sub").collect()
        .map(r => r.getInt(0) -> r.getSeq[Double](1).toSeq)
        .sortBy(_._1).map(_._2).toSeq
    }
    work.unpersist()
    out
  }

  /** Encode every vector as its `m` positional codes (the compressed
    * representation a 100 TB index stores instead of the vectors). */
  def encode(df: DataFrame, idCol: String, vecCol: String,
             cbs: Codebooks): DataFrame = {
    val dsub = cbs.head.head.length
    df.select(col(idCol), array(cbs.zipWithIndex.map { case (cb, s) =>
      assignCol(df, subCol(col(vecCol), s, dsub), cb)
    }: _*).as("codes"))
  }

  /** ADC top-k: approximate dot(query, candidate) = Σ_s dt[s][code_s],
    * where dt is the query's per-codeword dot table, computed ONCE per
    * query row. Scores round to `roundTo` BEFORE ranking with an n_id
    * tiebreak — the same stability contract as every other top-k path.
    * The query side must be small (it broadcasts with its dt). */
  def adcTopK(corpus: DataFrame, queries: DataFrame,
              idCol: String, vecCol: String, cbs: Codebooks,
              k: Int, roundTo: Int = 4): DataFrame = {
    val dsub = cbs.head.head.length
    val d = Similarity.pdot(corpus) _
    // flattened dt: subspace s's codewords start at offsets(s)
    val offsets = cbs.scanLeft(0)(_ + _.length).init
    val dt = array((for {
      (cb, s) <- cbs.zipWithIndex
      c <- cb
    } yield d(subCol(col(vecCol), s, dsub), typedlit(c))): _*)
    val q = broadcast(queries.select(col(idCol).as("q_id"), dt.as("dt")))
    val n = encode(corpus, idCol, vecCol, cbs)
      .select(col(idCol).as("n_id"), col("codes"))
    val scored = n.crossJoin(q).where(col("n_id") =!= col("q_id"))
      .select(col("q_id"), col("n_id"),
        round(aggregate(
          zip_with(col("codes"), typedlit(offsets), (cd, off) =>
            element_at(col("dt"), (off + cd + lit(1)).cast("int"))),
          lit(0.0), (acc, v) => acc + v), roundTo).as("adc"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("adc").desc, col("n_id"))
    scored.select(col("q_id"), col("n_id"), col("adc"),
        row_number().over(w).cast("long").as("rank"))
      .where(col("rank") <= k)
  }
}
