package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ops.Clean

/** Tabular feature engineering for model training — the encode/bin step
  * between the relational layer and a trainer. The reference stops at
  * one-hot pivots (`etl_io.py`'s wide reshape); these are the two
  * standard encodings one-hot cannot express: a target statistic per
  * category and an equal-frequency discretization.
  *
  * Both are exact-arithmetic by construction (BIGINT cents, discrete
  * percentile cuts) so the per-row outputs hash-match a SQL replay — the
  * registry's determinism contract (Reg.scala) extended to feature prep,
  * where silent cross-engine drift would poison a training set instead
  * of a report.
  */
object Features {

  /** Leave-one-out target encoding: each row's category is replaced by the
    * mean of `targetCol` over the OTHER rows of the same category —
    * te(i) = (S_cat − x_i) / (n_cat − 1), NULL for singleton categories.
    * Including the row's own target is the classic target-leakage bug
    * (the encoded feature memorizes its own label, inflating validation
    * scores); the LOO form is the leakage-safe variant of mean encoding —
    * same posture as [[Sampling.splitByGroup]], which protects the split
    * the way this protects the feature.
    *
    * Exactness: targets fold to BIGINT cents, so S_cat is the same
    * integer on any executor count; the single double division + FLOOR
    * rounding ([[Timeseries.r5]]) is reproduced verbatim by the oracle.
    * Plan: one groupBy over the (small) category domain broadcast-joined
    * back — the fact table is scanned once and never shuffled. */
  def targetEncodeLoo(df: DataFrame, idCol: String, catCol: String,
                      targetCol: String): DataFrame = {
    val rows = df.select(col(idCol), col(catCol),
      floor(col(targetCol) * 100 + 0.5).cast("long").as("__c"))
    val stats = rows.groupBy(col(catCol))
      .agg(sum(col("__c")).as("__s"), count(lit(1)).as("__n"))
    rows.join(broadcast(stats), Seq(catCol))
      .select(col(idCol), col(catCol),
        Timeseries.r5(when(col("__n") > 1,
          (col("__s") - col("__c")).cast("double") / 100.0
            / (col("__n") - 1).cast("double"))).as("te_loo"))
  }

  /** K-fold (cross-fit) target encoding — the OTHER leakage-safe mean
    * encoder: rows are assigned a deterministic fold by content hash of
    * their id (engine-neutral [[TextOps.md5Hash60]] mod `folds`, so the
    * assignment survives any repartitioning, rerun, or engine), and each
    * row's encoding is the target mean over the same category EXCLUDING
    * ITS OWN FOLD: te(i) = (S_cat − S_cat,fold(i)) / (n_cat − n_cat,fold(i)),
    * NULL when the category exists only in the row's fold. Compared to
    * [[targetEncodeLoo]]: LOO leaks the category's n−1 conditional
    * distribution into every row (fine for reporting, risky for
    * high-cardinality categories); the k-fold form is what sklearn/target
    * encoders do under cross-validation, and the fold is reusable as the
    * CV split itself.
    *
    * Exactness: BIGINT-cents sums per (category, fold); one double
    * division + r5 per row. Plan: ONE groupBy over (category × folds)
    * broadcast back to the fact scan — same never-shuffle-the-facts
    * posture as LOO. */
  def targetEncodeKFold(df: DataFrame, idCol: String, catCol: String,
                        targetCol: String, folds: Int = 5): DataFrame = {
    require(folds >= 2, s"need >= 2 folds, got $folds")
    val rows = df.select(col(idCol), col(catCol),
      floor(col(targetCol) * 100 + 0.5).cast("long").as("__c"),
      pmod(TextOps.md5Hash60(col(idCol).cast("string")), lit(folds.toLong))
        .as("fold"))
    val cf = rows.groupBy(col(catCol), col("fold"))
      .agg(sum(col("__c")).as("__sf"), count(lit(1)).as("__nf"))
    val cat = cf.groupBy(col(catCol))
      .agg(sum(col("__sf")).as("__s"), sum(col("__nf")).as("__n"))
    val stats = cf.join(cat, Seq(catCol))
    rows.join(broadcast(stats), Seq(catCol, "fold"))
      .select(col(idCol), col(catCol), col("fold"),
        Timeseries.r5(when(col("__n") > col("__nf"),
          (col("__s") - col("__sf")).cast("double") / 100.0
            / (col("__n") - col("__nf")).cast("double"))).as("te_kfold"))
  }

  /** Weight-of-evidence encoding (the credit-scoring categorical encoder;
    * Siddiqi, "Credit Risk Scorecards", 2006): per category i of
    * `catCol`, WOE_i = ln( ((pos_i+s)/POS) / ((neg_i+s)/NEG) ) against a
    * boolean `labelCol`, with additive smoothing `s` so single-class
    * categories stay finite. Also emits the category's information-value
    * contribution iv_i = ((pos_i+s)/POS − (neg_i+s)/NEG) · WOE_i — summed
    * over categories it is the feature's IV, the standard screening
    * statistic. Counts are exact integers; WOE is ONE factored ln of
    * integer-built doubles and iv one product, each rounded at one site.
    *
    * Plan: one partial-aggregable conditional-count aggregation, totals
    * reduced from it (broadcast 1-row) — category-table-sized after the
    * scan, no second pass over the data. */
  def woeEncode(df: DataFrame, catCol: String, labelCol: Column,
                smooth: Double = 0.5): DataFrame =
    woeFromCells(
      df.groupBy(col(catCol))
        .agg(sum(when(labelCol, 1L).otherwise(0L)).as("n_pos"),
          sum(when(labelCol, 0L).otherwise(1L)).as("n_neg")),
      catCol, smooth)

  /** The WOE/IV projection over pre-aggregated (category, n_pos, n_neg)
    * cells — split out so the STREAMING twin (incremental conditional
    * counts, stream_woe) scores its final cell table with the exact same
    * expression tree as the batch path. */
  def woeFromCells(cells: DataFrame, catCol: String,
                   smooth: Double = 0.5): DataFrame = {
    val totals = cells.agg(sum(col("n_pos")).as("__p"),
      sum(col("n_neg")).as("__n"))
    val pr = (col("n_pos") + smooth) / col("__p")
    val nr = (col("n_neg") + smooth) / col("__n")
    cells.crossJoin(broadcast(totals))
      .select(col(catCol), col("n_pos"), col("n_neg"),
        Timeseries.r5(log(pr / nr)).as("woe"),
        Timeseries.r5((pr - nr) * log(pr / nr)).as("iv"))
  }

  /** Equal-frequency discretization: assign each row the quantile bin
    * (1..nBins) of its value WITHIN its group, cuts at p = k/nBins from
    * [[Clean.percentileCuts]] — discrete group elements, never
    * interpolated, so bin boundaries are exact on every engine and ties
    * sit in the lowest qualifying bin (x > cut strictly). Skewed or
    * low-cardinality groups may yield duplicate cuts and empty bins —
    * that is the correct discrete answer, not an error.
    *
    * Plan: the cut table is one row per group (broadcast join-back); the
    * heavy pass is percentileCuts' distinct-value histogram. The fact
    * scan itself needs no shuffle and no window. */
  def quantileBin(df: DataFrame, valueCol: String, groupCol: String,
                  idCols: Seq[String], nBins: Int): DataFrame = {
    require(nBins >= 2, s"need at least 2 bins, got $nBins")
    val ps = (1 until nBins).map(k => (s"__q$k", k.toDouble / nBins))
    val cuts = Clean.percentileCuts(df, valueCol, groupCol, ps)
    val bin = ps.map { case (n, _) =>
      when(col(valueCol) > col(n), 1L).otherwise(0L)
    }.reduce(_ + _) + 1L
    df.join(broadcast(cuts), df(groupCol) === cuts("__g"))
      .select((idCols :+ groupCol).map(col) :+ bin.as("bin"): _*)
  }

  /** Rank (quantile) normalization: each row's value replaced by its rank
    * fraction u = r/(n+1) within its group — the distribution-free
    * rescaling (uniform marginals whatever the input distribution; feed
    * u through an inverse normal CDF for the Gaussian-rank transform).
    * Ranks come from row_number over (value, id), so exact-duplicate
    * values take consecutive ranks in id order — deterministic on every
    * engine, no averaged ties, no interpolation. u is one exact-integer
    * division + FLOOR rounding. One window shuffle on the group key. */
  def rankNormalize(df: DataFrame, idCol: String, groupCol: String,
                    valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(groupCol).orderBy(col(valueCol), col(idCol))
    val wn = Window.partitionBy(groupCol)
    df.select(col(idCol), col(groupCol),
        row_number().over(w).cast("long").as("__r"),
        count(lit(1)).over(wn).as("__n"))
      .select(col(idCol), col(groupCol),
        Timeseries.r5(col("__r").cast("double")
          / (col("__n") + 1L).cast("double")).as("u"))
  }

  /** Hashing-trick token features (Weinberger et al., "Feature hashing
    * for large scale multitask learning", 2009): whitespace tokens hashed
    * into `dims` buckets, one (id, bucket, n) row per non-empty bucket —
    * the fixed-dimension text featurizer that needs NO vocabulary table,
    * no fit step, and no driver state. The hash is the library's md5
    * 52-bit integer (engine-neutral — the same bucket on Spark, DuckDB,
    * or anything that can md5), not a JVM-private hash. Sparse row form
    * on purpose: a dense array column hides bucket-level pruning and
    * balloons IO at high `dims`; pivot downstream if a trainer wants
    * dense. One explode + one partial-aggregable groupBy. */
  def hashedCounts(df: DataFrame, idCol: String, textCol: String,
                   dims: Int): DataFrame = {
    require(dims >= 2, s"dims must be >= 2: $dims")
    val tok = explode(split(col(textCol), " "))
    val h = conv(substring(md5(col("__tok")), 1, 13), 16, 10).cast("long")
    df.select(col(idCol), tok.as("__tok"))
      .select(col(idCol), (h % dims).as("bucket"))
      .groupBy(col(idCol), col("bucket"))
      .agg(count(lit(1)).as("n"))
  }

  /** Per-group z-score standardization: each row's value rescaled to
    * (x − μ_g)/σ_g (population σ) — the scale-free feature form. Computed
    * integer-first: z = (n·c − S) / √(n·Σc² − S²) over cents BIGINTs with
    * DECIMAL(38,0) squares, so the radicand and numerator are exact and z
    * is one division of two deterministic doubles. Zero-variance groups
    * yield null (a constant feature has no z-score, and silently emitting
    * 0 would hide that from the trainer). Same plan shape as
    * [[targetEncodeLoo]]: one groupBy over the group domain broadcast
    * back; the fact table never shuffles. */
  def standardize(df: DataFrame, idCols: Seq[String], groupCol: String,
                  valueCol: String): DataFrame = {
    val dec = (x: Column) => x.cast("decimal(38,0)")
    val c = floor(col(valueCol) * 100 + 0.5).cast("long")
    val rows = df.select((idCols :+ groupCol).map(col) :+ c.as("__c"): _*)
    val stats = rows.groupBy(col(groupCol)).agg(
      count(lit(1)).as("__n"), sum(col("__c")).as("__s"),
      sum(dec(col("__c")) * dec(col("__c"))).as("__scc"))
    val den = (dec(col("__n")) * col("__scc") -
      dec(col("__s")) * dec(col("__s"))).cast("double")
    rows.join(broadcast(stats), Seq(groupCol))
      .select((idCols :+ groupCol).map(col) :+
        Timeseries.r5(when(den > 0.0,
          (dec(col("__n")) * dec(col("__c")) - dec(col("__s")))
            .cast("double") / sqrt(den)))
          .as("z"): _*)
  }

  /** Exponential-decay engagement score per key: Σ value·2^(−periods ago),
    * the standard recency weighting (an event `halfLifeDays` old counts
    * half of one today) — the feature a ranking/priority model wants from
    * an event log, where a plain sum would let ancient activity dominate.
    *
    * EXACT by dyadic construction — the reason this isn't exp(−λΔt):
    * float exp() sums are order-dependent and libm differs across engines.
    * Here age collapses to whole halving periods e = min(d, horizon)/halfLife
    * (integer division, d = days before the log's max date), each term is
    * the BIGINT cents·2^(H−e) with H = horizon/halfLife (a left shift —
    * exact), the per-key sum is an integer, and ONE division by 2^H at the
    * end yields the score. Identical on 1 or 1000 executors and in a SQL
    * replay; the step-function decay (floor to whole periods) is the
    * documented trade for that exactness.
    *
    * Plan: one 1-row max-date aggregate broadcast onto the log, one
    * partial-aggregable groupBy — the log is scanned once. `horizon` caps
    * the shift (events older than it all get weight 1) and must keep
    * H = horizon/halfLife ≤ 62 − log₂(max Σcents) to stay in BIGINT. */
  def decayScore(df: DataFrame, keyCol: String, tsCol: String,
                 valueCol: String, halfLifeDays: Int = 7,
                 horizonDays: Int = 84): DataFrame = {
    require(halfLifeDays >= 1, s"halfLifeDays must be >= 1: $halfLifeDays")
    require(horizonDays >= halfLifeDays && horizonDays % halfLifeDays == 0,
      s"horizonDays must be a positive multiple of halfLifeDays: " +
        s"$horizonDays / $halfLifeDays")
    val h = horizonDays / halfLifeDays
    require(h <= 40, s"2^$h decay weights overflow the BIGINT sum headroom")
    val maxD = df.agg(max(to_date(col(tsCol))).as("__maxd"))
    val d = datediff(col("__maxd"), to_date(col(tsCol)))
    val e = least(greatest(d, lit(0)), lit(horizonDays)) / halfLifeDays
    df.crossJoin(broadcast(maxD)) // 1-row side
      .select(col(keyCol),
        // 2^(H−e) via pow: exact in doubles for exponents ≤ 40 (the
        // require above), then an exact long cast — a shift in effect
        (pow(lit(2.0), lit(h) - e.cast("int")).cast("long") *
          floor(col(valueCol) * 100 + 0.5).cast("long")).as("__w"))
      .groupBy(col(keyCol))
      .agg((sum(col("__w")).cast("double") /
        lit(math.pow(2.0, h) * 100.0)).as("decay_score"))
      .select(col(keyCol), Timeseries.r5(col("decay_score")).as("decay_score"))
  }
}
