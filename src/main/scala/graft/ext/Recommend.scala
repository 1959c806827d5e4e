package graft.ext
import graft.Ckpt.CkptOps

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Item-to-item co-occurrence recommendation — the classic neighborhood
  * model (Sarwar et al., "Item-based collaborative filtering recommendation
  * algorithms", WWW'01; Linden, Smith & York, "Amazon.com recommendations",
  * IEEE Internet Computing 2003): rank, for every item, the items most
  * often sharing a basket with it, cosine-normalized so ubiquitous items
  * don't dominate every list. The reference has no recommendation surface;
  * this rides the same basket projection the graph family uses.
  */
object Recommend {

  /** Top-k co-occurrence cosine neighbors per item over (basket, item)
    * rows: sim(i,j) = n_ij / √(n_i·n_j), where n_ij counts baskets holding
    * both and n_i baskets holding i. Returns (item, rec, sim, rk) with
    * rk = 1..topK per item, ordered sim DESC then rec ASC (the unrounded
    * sim is an exact function of three integers — one multiply, one IEEE
    * sqrt, one divide — so the ordering is engine-stable; the emitted sim
    * is rounded to 6 dp).
    *
    * `maxBasket` drops WHOLE over-cap baskets before pairing — the scale
    * armor: a degenerate mega-basket (a crawler hitting every item, a
    * shared account) contributes |basket|² pair rows and zero preference
    * signal. Item frequencies n_i are counted over the SAME capped basket
    * set, so sim stays a true cosine within the analyzed universe. Default
    * uncapped — exact; at 100 TB set it to the p99.9 basket size.
    *
    * Scale: one distinct + one capped self-equi-join on the basket key
    * (fan-out bounded by `maxBasket`), partial-aggregable counts, and a
    * per-item top-k window the optimizer runs as WindowGroupLimit — no
    * all-pairs item matrix is ever materialized beyond observed
    * co-occurrences. */
  def itemCooccur(df: DataFrame, basketCol: String, itemCol: String,
                  topK: Int = 5, maxBasket: Int = Int.MaxValue): DataFrame = {
    require(topK >= 1, s"topK must be >= 1: $topK")
    require(maxBasket >= 2, s"maxBasket below 2 pairs nothing: $maxBasket")
    val bi = df.select(col(basketCol).as("b"), col(itemCol).as("i"))
      .distinct()
    val capped =
      if (maxBasket == Int.MaxValue) bi.ckpt() // 3 consumers
      else {
        val ok = bi.groupBy("b").agg(count(lit(1)).as("__n"))
          .where(col("__n") <= maxBasket).select("b")
        bi.join(ok, Seq("b"), "left_semi").ckpt()
      }
    val ni = capped.groupBy("i").agg(count(lit(1)).as("ni"))
    val pairs = capped.as("x")
      .join(capped.as("y"),
        col("x.b") === col("y.b") && col("x.i") < col("y.i"))
      .groupBy(col("x.i").as("a"), col("y.i").as("c"))
      .agg(count(lit(1)).as("nij"))
    val both = pairs.unionAll(
      pairs.select(col("c").as("a"), col("a").as("c"), col("nij")))
    val sims = both
      .join(ni.select(col("i").as("a"), col("ni").as("na")), Seq("a"))
      .join(ni.select(col("i").as("c"), col("ni").as("nc")), Seq("c"))
      .withColumn("sim", col("nij").cast("double") /
        sqrt((col("na") * col("nc")).cast("double")))
    val w = Window.partitionBy(col("a")).orderBy(col("sim").desc, col("c").asc)
    sims.withColumn("rk", row_number().over(w))
      .where(col("rk") <= topK)
      .select(col("a").as("item"), col("c").as("rec"),
        (floor(col("sim") * 1e6 + 0.5) / 1e6).as("sim"),
        col("rk").cast("long").as("rk"))
  }

  /** [[itemCooccur]] over PRE-AGGREGATED inputs — the staged-layout read
    * path (round 14): `pairCounts` is the canonical (a < b, nij) basket
    * co-occurrence count table and `itemCounts` the (i, ni) per-item
    * basket counts, both written once at ingest over the SAME basket
    * universe (the graft_kcore/coreness repeat-co-purchase staging).
    * Identical output to [[itemCooccur]] over the raw rows: the cosine,
    * the 6-dp rounding, and the (sim DESC, rec ASC) window are unchanged
    * — only the per-run distinct + basket self-join are gone. */
  def itemCooccurFromCounts(pairCounts: DataFrame, itemCounts: DataFrame,
                            topK: Int = 5): DataFrame = {
    require(topK >= 1, s"topK must be >= 1: $topK")
    val pairs = pairCounts.select(col(pairCounts.columns(0)).as("a"),
      col(pairCounts.columns(1)).as("c"),
      col(pairCounts.columns(2)).as("nij"))
    val ni = itemCounts.select(col(itemCounts.columns(0)).as("i"),
      col(itemCounts.columns(1)).as("ni"))
    val both = pairs.unionAll(
      pairs.select(col("c").as("a"), col("a").as("c"), col("nij")))
    val sims = both
      .join(ni.select(col("i").as("a"), col("ni").as("na")), Seq("a"))
      .join(ni.select(col("i").as("c"), col("ni").as("nc")), Seq("c"))
      .withColumn("sim", col("nij").cast("double") /
        sqrt((col("na") * col("nc")).cast("double")))
    val w = Window.partitionBy(col("a")).orderBy(col("sim").desc, col("c").asc)
    sims.withColumn("rk", row_number().over(w))
      .where(col("rk") <= topK)
      .select(col("a").as("item"), col("c").as("rec"),
        (floor(col("sim") * 1e6 + 0.5) / 1e6).as("sim"),
        col("rk").cast("long").as("rk"))
  }

  /** [[associationRules]] over PRE-AGGREGATED inputs (the staged-layout
    * read path, round 14): `pairCounts` (a < b, nij) UNFILTERED pair
    * counts, `itemCounts` (i, ni), `nBaskets` a 1-row (N) frame — all
    * counted over the same basket universe at ingest. Identical output
    * to [[associationRules]]: minCount filters at read, ratios and
    * rounding unchanged. */
  def associationRulesFromCounts(pairCounts: DataFrame, itemCounts: DataFrame,
                                 nBaskets: DataFrame,
                                 minCount: Long = 2): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1: $minCount")
    val pairs = pairCounts.select(col(pairCounts.columns(0)).as("a"),
      col(pairCounts.columns(1)).as("c"),
      col(pairCounts.columns(2)).as("nij"))
      .where(col("nij") >= minCount)
    val ni = itemCounts.select(col(itemCounts.columns(0)).as("i"),
      col(itemCounts.columns(1)).as("ni"))
    val n = nBaskets.select(col(nBaskets.columns(0)).as("N"))
    val directed = pairs.unionAll(
      pairs.select(col("c").as("a"), col("a").as("c"), col("nij")))
    val r6 = (c: Column) => floor(c * 1e6 + 0.5) / 1e6
    directed
      .join(ni.select(col("i").as("a"), col("ni").as("na")), Seq("a"))
      .join(ni.select(col("i").as("c"), col("ni").as("nc")), Seq("c"))
      .crossJoin(broadcast(n))
      .select(col("a").as("antecedent"), col("c").as("consequent"),
        col("nij").as("n_joint"),
        r6(col("nij").cast("double") / col("N")).as("support"),
        r6(col("nij").cast("double") / col("na")).as("confidence"),
        r6(col("N").cast("double") * col("nij") /
          (col("na") * col("nc"))).as("lift"))
  }

  /** Association rules over (basket, item) rows (Agrawal & Srikant,
    * "Fast algorithms for mining association rules", VLDB'94 — the
    * support/confidence framing; lift per Brin et al. SIGMOD'97): for every
    * DIRECTED item pair (a → c) co-occurring in ≥ `minCount` baskets,
    * support = n_ac/N, confidence = n_ac/n_a, lift = N·n_ac/(n_a·n_c).
    * Confidence is what a recommender acts on ("of baskets with a, how
    * many had c"); lift calibrates it against c's base rate. Counts are
    * exact integers; the three emitted ratios are rounded to 6 dp at one
    * site each.
    *
    * Scale: identical posture to [[itemCooccur]] — one distinct, one
    * capped self-equi-join on the basket key (`maxBasket` drops degenerate
    * mega-baskets WHOLE, and n_i/N are counted over the same capped
    * universe so every ratio stays consistent), partial-aggregable counts,
    * and a broadcast 1-row N. Rules far above single-pair support
    * (classic Apriori pruning) fall out of the `minCount` filter — no
    * candidate lattice is ever materialized beyond observed pairs. */
  def associationRules(df: DataFrame, basketCol: String, itemCol: String,
                       minCount: Long = 2,
                       maxBasket: Int = Int.MaxValue): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1: $minCount")
    require(maxBasket >= 2, s"maxBasket below 2 pairs nothing: $maxBasket")
    val bi = df.select(col(basketCol).as("b"), col(itemCol).as("i"))
      .where(col("i").isNotNull)
      .distinct()
    val capped =
      if (maxBasket == Int.MaxValue) bi.ckpt() // 4 consumers
      else {
        val ok = bi.groupBy("b").agg(count(lit(1)).as("__n"))
          .where(col("__n") <= maxBasket).select("b")
        bi.join(ok, Seq("b"), "left_semi").ckpt()
      }
    val nBaskets = capped.select(countDistinct(col("b")).as("N"))
    val ni = capped.groupBy("i").agg(count(lit(1)).as("ni"))
    val pairs = capped.as("x")
      .join(capped.as("y"),
        col("x.b") === col("y.b") && col("x.i") < col("y.i"))
      .groupBy(col("x.i").as("a"), col("y.i").as("c"))
      .agg(count(lit(1)).as("nij"))
      .where(col("nij") >= minCount)
    val directed = pairs.unionAll(
      pairs.select(col("c").as("a"), col("a").as("c"), col("nij")))
    val r6 = (c: Column) => floor(c * 1e6 + 0.5) / 1e6
    directed
      .join(ni.select(col("i").as("a"), col("ni").as("na")), Seq("a"))
      .join(ni.select(col("i").as("c"), col("ni").as("nc")), Seq("c"))
      .crossJoin(broadcast(nBaskets))
      .select(col("a").as("antecedent"), col("c").as("consequent"),
        col("nij").as("n_joint"),
        r6(col("nij").cast("double") / col("N")).as("support"),
        r6(col("nij").cast("double") / col("na")).as("confidence"),
        r6(col("N").cast("double") * col("nij") /
          (col("na") * col("nc"))).as("lift"))
  }
}
