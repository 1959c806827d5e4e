package graft.ext
import graft.Ckpt.CkptOps

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic content-hash sampling — the reproducible alternative to
  * seeded RNG sampling (`df.stat.sampleBy`) for corpus work. A row's
  * keep/drop decision is a pure function of its CONTENT, so the sample is
  * identical across runs, engines, partitionings and cluster sizes, needs
  * no seed coordination, and composes with dedup/splits that use the same
  * md5 machinery ([[TextOps.hashBucket]]). The price: sampling the same
  * corpus twice gives the SAME rows (that is usually the point), and exact
  * duplicates sample together (dedup first — the pipeline order is
  * dedup → sample anyway).
  */
object Sampling {

  /** Uniform-looking deterministic fraction in [0, 1): md5's top 13 hex
    * digits (52 bits — exactly representable in a double) scaled by 2^-52.
    * Both the int→double cast and the power-of-two division are exact, so
    * `hashFrac(x) < p` decides identically on every engine.
    *
    * NULL content hashes to NULL, and a NULL fraction fails every `< p`
    * filter — [[weightedBy]]/[[mixSources]] therefore DROP null-content
    * rows even at rate 1.0. That is the contract (a corpus row with no
    * content has no stable identity to sample on); coalesce upstream if
    * null must mean something. */
  def hashFrac(c: Column): Column =
    conv(substring(md5(c), 1, 13), 16, 10).cast("long").cast("double") /
      lit(4503599627370496.0) // 2^52

  /** Keep each row with probability `weight` (a per-row Column in [0,1]),
    * decided by the row's own content hash: quality-weighted subsampling,
    * length-balanced sampling, any importance scheme. Plans as one
    * filter — fully pushed, no shuffle, no state. */
  def weightedBy(df: DataFrame, contentCol: Column, weight: Column): DataFrame =
    df.where(hashFrac(contentCol) < weight)

  /** Domain mixing: subsample each source to its target rate — the
    * data-mixture control every pre-training corpus build ends with.
    * `rates` maps source → keep-rate; absent sources keep `default`.
    * The rate lookup is a literal map (broadcast-free, pure expression). */
  def mixSources(df: DataFrame, contentCol: Column, sourceCol: Column,
                 rates: Map[String, Double], default: Double): DataFrame = {
    val rate = rates.foldLeft(lit(default)) { case (acc, (src, r)) =>
      when(sourceCol === src, lit(r)).otherwise(acc)
    }
    df.where(hashFrac(contentCol) < rate)
  }

  /** Exact-k weighted sampling WITHOUT replacement per stratum — the
    * Efraimidis–Spirakis reservoir rule (Inf. Proc. Letters 97(5), 2006)
    * made deterministic: each row draws u from its content hash
    * ([[hashFrac]]'s 52-bit integer, shifted to (0, 1]) and ranks by
    * key = ln(u)/w; the top k keys per stratum are EXACTLY a weight-
    * proportional sample without replacement. Fraction-based
    * [[weightedBy]] cannot promise a sample SIZE; this cannot promise a
    * rate — pick by which contract the pipeline needs. Rows with
    * weight ≤ 0 are excluded (they cannot be drawn).
    *
    * Determinism: u is exact (52-bit int + 1, divided by 2^52 — both
    * exact), so ln and the divide see identical doubles on every engine;
    * ties (exact-duplicate content AND equal weight) break on `idCol`.
    * Scale: the rank filter plans as WindowGroupLimit — each partition
    * keeps its local top-k before the stratum shuffle, so the full
    * corpus never moves. */
  def weightedTopK(df: DataFrame, idCol: String, contentCol: Column,
                   weight: Column, stratumCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    import org.apache.spark.sql.expressions.Window
    val h = conv(substring(md5(contentCol), 1, 13), 16, 10).cast("long")
    val u = (h.cast("double") + 1.0) / lit(4503599627370496.0) // (0, 1]
    val key = log(u) / weight
    val w = Window.partitionBy(stratumCol).orderBy(key.desc, col(idCol))
    df.where(weight > 0)
      .select(col(stratumCol), col(idCol),
        row_number().over(w).as("rn"))
      .where(col("rn") <= k)
  }

  /** Stratified sampling with per-stratum keep rates — the deterministic
    * replacement for `df.stat.sampleBy` (whose seeded per-partition RNG
    * ties the sample to the engine AND the physical partitioning, so the
    * "same" split differs across runs and engines). Here the decision is
    * the row's content hash against the stratum's rate: exactly
    * reproducible everywhere, which makes train/dev splits auditable.
    * Strata absent from `rates` keep nothing (sampleBy's contract).
    * Same plan shape as [[mixSources]]: one pushed filter, no shuffle. */
  def stratifiedBy(df: DataFrame, contentCol: Column, stratumCol: Column,
                   rates: Map[String, Double]): DataFrame =
    mixSources(df, contentCol, stratumCol, rates, default = 0.0)

  /** Class-balanced EXACT downsampling: keep exactly k rows per class,
    * where k is the minority class size — the imbalanced-training fix
    * where [[stratifiedBy]]'s proportional rates are the wrong tool
    * (proportional keeps the imbalance; balanced equalizes it). Which
    * rows survive is decided by content-hash order with an id tiebreak —
    * deterministic across runs, engines, and partitionings, like every
    * sampler here. Null-content rows are dropped (no stable identity to
    * order on — the [[hashFrac]] contract).
    *
    * Plan: one class-count aggregation reduced to a broadcast 1-row min,
    * one per-class rank window (parallel across classes; the rank filter
    * is WindowGroupLimit-shaped once k is known). No corpus shuffle
    * beyond the class partition. */
  def balancedSample(df: DataFrame, contentCol: Column, classCol: Column,
                     idCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = df.where(contentCol.isNotNull).withColumn("__cls", classCol)
    val k = d.groupBy("__cls").agg(count(lit(1)).as("__n"))
      .agg(min(col("__n")).as("__k"))
    val w = Window.partitionBy(col("__cls"))
      .orderBy(hashFrac(contentCol).asc, col(idCol).asc)
    d.withColumn("__rn", row_number().over(w).cast("long"))
      .crossJoin(broadcast(k))
      .where(col("__rn") <= col("__k"))
      .drop("__rn", "__k", "__cls")
  }

  /** Deterministic negative sampling for contrastive training: every
    * anchor row gets `k` negatives drawn by content-hash RANK adjacency —
    * rank all rows by (hashFrac(content), id), negative j of the anchor
    * at rank r is the row at rank ((r−1+j) mod N)+1. Hash order is
    * uniform-pseudorandom w.r.t. content yet exactly reproducible, so the
    * pairing survives re-runs, engines, and repartitioning — the property
    * RNG-based negative samplers lose. Self-pairings (possible only when
    * N ≤ k wraps the ring) are dropped. Returns (anchor_id, j, neg_id).
    *
    * Scale: one [[graft.ops.Rank.globalRank]] two-level rank (hash-prefix
    * buckets), a k-way explode, one equality self-join on the target rank
    * — fan-out exactly k per row, no sampling shuffle of content. */
  def negativeSample(df: DataFrame, idCol: String, contentCol: Column,
                     k: Int = 3): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val keyed = df.where(contentCol.isNotNull)
      .select(col(idCol).as("id"), hashFrac(contentCol).as("__hf"))
    val ranked = graft.ops.Rank.globalRank(keyed, col("__hf"), col("id"),
        floor(col("__hf") * 64).cast("long"), rankCol = "__r")
      .select(col("id"), col("__r"))
      .ckpt() // self-joined + counted: rank derived once
    val n = ranked.agg(count(lit(1)).as("__N"))
    ranked.crossJoin(broadcast(n))
      .select(col("id").as("anchor_id"), col("__r"), col("__N"),
        explode(sequence(lit(1), lit(k))).as("j"))
      .withColumn("__tr", pmod(col("__r") - 1 + col("j"), col("__N")) + 1)
      .join(ranked.select(col("id").as("neg_id"), col("__r").as("__tr")),
        Seq("__tr"))
      .where(col("anchor_id") =!= col("neg_id"))
      .select(col("anchor_id"), col("j").cast("long").as("j"), col("neg_id"))
  }

  /** Temperature-based source rebalancing — the multilingual-pretraining
    * mixing rule (target share ∝ natural share^tau; tau < 1 flattens the
    * distribution toward the tail). A filter can only DOWN-sample, so the
    * per-source keep rate is r_s = (n_s / n_min)^(tau-1): the smallest
    * source keeps everything (rate 1) and every larger source is cut to
    * its tau-flattened share. Rates derive from the data itself with one
    * count aggregation, broadcast back, and applied as the same
    * content-hash filter as [[mixSources]] — no shuffle of the corpus.
    * Rates are rounded to 6 decimals BEFORE the hashFrac compare so
    * pow()'s last-ulp libm differences cannot flip a row across engines.
    * Deterministic end to end: same corpus → same kept set, any cluster
    * shape. */
  def temperatureMix(df: DataFrame, contentCol: Column, sourceCol: Column,
                     tau: Double): DataFrame = {
    require(tau > 0 && tau <= 1, s"tau must be in (0, 1] (got $tau)")
    val counts = df.groupBy(sourceCol.as("__src"))
      .agg(count(lit(1)).as("__n"))
    val rates = counts
      .crossJoin(broadcast(counts.agg(min(col("__n")).as("__nmin"))))
      .select(col("__src"),
        round(pow(col("__n").cast("double") / col("__nmin"), tau - 1.0), 6)
          .as("__rate"))
    df.join(broadcast(rates), sourceCol === col("__src"))
      .where(hashFrac(contentCol) < col("__rate"))
      .drop("__src", "__rate")
  }

  /** Deterministic shard assignment for training output: shard =
    * content-hash mod `nShards`. A pure map — no shuffle, no global
    * ordering, no coordination — which is the ONLY shape that holds at
    * 100 TB: any balance-perfect striping (row_number over a global
    * size-descending sort) needs a total order, i.e. a single-partition
    * window or a range exchange the write then immediately un-does. Hash
    * sharding is balanced to O(1/sqrt(docs_per_shard)) by the law of large
    * numbers — at a million docs per shard the spread is ~0.1%, and
    * [[shardStats]] is the cheap audit that proves it on a given corpus.
    * Composes with [[graft.io.Sinks]] partitioned writes (`partitionBy` on
    * this column) and stays stable when the corpus around a doc changes —
    * the same property every other md5-keyed stage here relies on. */
  def assignShard(contentCol: Column, nShards: Int): Column =
    TextOps.hashBucket(contentCol, nShards)

  /** Per-shard balance audit for [[assignShard]]: document count and total
    * token weight per shard. One aggregation — at any scale this is a
    * map-side-combined groupBy over nShards groups. */
  def shardStats(df: DataFrame, contentCol: Column, weight: Column,
                 nShards: Int): DataFrame =
    df.groupBy(assignShard(contentCol, nShards).as("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(weight).as("n_tokens"))

  /** Deterministic global training order: every row gets a dense 1-based
    * position in the order of its id's md5 — the reproducible "shuffle the
    * corpus before training" step (hash order is uniform, so consecutive
    * positions are an unbiased mix of sources/domains).
    *
    * The order is GLOBAL but the plan never global-sorts: the md5 hex
    * prefix (2 hex digits → 256 shards) pre-partitions the order, because
    * sorting by (prefix, full-hash) IS sorting by full-hash. Per-shard
    * dense ranks come from a 256-way parallel window; shard base offsets
    * are a prefix sum over the 256-row shard-count table (the same
    * two-level trick as [[Packing]]'s chunk offsets — the single-partition
    * stage is O(#shards), never O(rows)). position = shard offset +
    * within-shard rank. */
  def trainOrder(df: DataFrame, idCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hashed = df.withColumn("__h", md5(col(idCol).cast("string")))
      .withColumn("__shard", substring(col("__h"), 1, 2))
    val offsets = hashed.groupBy("__shard").agg(count(lit(1)).as("__c"))
      .withColumn("__off", coalesce(sum("__c").over(
        Window.orderBy("__shard").rowsBetween(
          Window.unboundedPreceding, -1)), lit(0L)))
      .select("__shard", "__off")
    hashed
      .withColumn("__rn", row_number().over(
        Window.partitionBy("__shard").orderBy(col("__h"), col(idCol))))
      .join(broadcast(offsets), "__shard")
      .select(col(idCol), (col("__off") + col("__rn")).as("pos"))
  }

  /** Leakage-safe train/val/test split: duplicate (or near-duplicate)
    * documents must land in the SAME split, or held-out evaluation scores
    * training data through clones — the per-doc content hash
    * ([[TextOps.splitLabel]]) cannot see that two DIFFERENT texts are
    * paraphrases, so a near-dup pair can straddle train/test. Here the
    * decision is made once per duplicate GROUP: `pairs` is any verified
    * duplicate pair list (exact, MinHash, SimHash, embedding — the same
    * frames the dedup family produces), its transitive closure
    * ([[Dedup.connectedComponents]]) names each group by its minimum id,
    * and the split hash is computed on that representative, so every group
    * member inherits one label. Unpaired docs hash their own id.
    *
    * Scale: CC is O(log n) shuffle rounds over the PAIR list (≪ corpus);
    * the corpus itself pays one hash-join against the (pair-sized)
    * component map plus a pure projection. Returns `df` + `component` +
    * `split`. Cross-engine determinism is [[hashFrac]]'s: md5 of the
    * representative id decides identically on any engine, which is what
    * makes the split auditable long after the corpus ships. */
  def splitByGroup(df: DataFrame, pairs: DataFrame, idCol: String,
                   trainFrac: Double = 0.8, valFrac: Double = 0.1): DataFrame = {
    val comp = Dedup.connectedComponents(pairs).withColumnRenamed("id", idCol)
    val g = coalesce(col("component"), col(idCol))
    val frac = hashFrac(g.cast("string"))
    df.join(comp, Seq(idCol), "left")
      .withColumn("component", g)
      .withColumn("split",
        when(frac < trainFrac, "train")
          .when(frac < trainFrac + valFrac, "val")
          .otherwise("test"))
  }
}
