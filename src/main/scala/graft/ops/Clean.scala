package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Statistical data-cleaning operators: per-group z-score outlier flagging
  * and winsorization (percentile clipping) — the numeric siblings of the
  * text-quality filters, run over telemetry/measure columns before a table
  * feeds model training or reporting (the reference's recode/filter layer,
  * etl_io.py:553-599, stops at categorical cleanup; these are the
  * continuous-column counterpart).
  *
  * Scale posture: group stats are one aggregation over the table, broadcast
  * back (a handful of rows per group key), so flagging/clipping is a
  * map-side join — the table is scanned twice, shuffled never. Winsorize's
  * exact-rank cut finding is the one per-group sort (window over the group
  * partition); at 100 TB swap the cut finder for approx_percentile bounds
  * and keep the identical clip pass.
  */
object Clean {

  /** Rows whose `valueCol` sits more than `threshold` group standard
    * deviations from the group mean. The z-score is rounded to 6 decimals
    * BEFORE the threshold compare so the flagged set is reproducible across
    * engines/accumulation orders (the same parity trick as a12_stats —
    * avg/stddev low-bit differences cannot flip membership unless a value
    * sits within 1e-6 of the boundary). Emits `keyCols`, the value, and the
    * rounded z. */
  def zscoreOutliers(df: DataFrame, valueCol: String, groupCol: String,
                     keyCols: Seq[String], threshold: Double): DataFrame = {
    val st = df.groupBy(col(groupCol).as("__g"))
      .agg(avg(valueCol).as("__mu"), stddev_samp(col(valueCol)).as("__sd"))
    df.join(broadcast(st), col(groupCol) === col("__g"))
      // nullif guard: a constant-valued group has sd = 0, and ANSI mode
      // (Spark 4 default) turns the division into a job-killing
      // DIVIDE_BY_ZERO; null z rows fail the threshold filter instead
      // (a constant group has no outliers by definition)
      .withColumn("z", round(
        (col(valueCol) - col("__mu")) / nullif(col("__sd"), lit(0.0)), 6))
      .where(abs(col("z")) > threshold)
      .select(keyCols.map(col) :+ col(valueCol) :+ col("z"): _*)
  }

  /** Per-group winsorization summary: clip `valueCol` to the [pLo, pHi]
    * DISCRETE percentile bounds (the actual group element at rank
    * ceil(p·n) — never an interpolated value, so both engines pick the
    * identical bound and the clip comparisons are exact, no float-boundary
    * flakes). Returns one row per group: exact integer-cents sum of the
    * clipped values, clip counts both sides, and the bounds.
    *
    * The cut finder works on the per-group VALUE HISTOGRAM, not the rows:
    * the rank-k element equals min{x : cumulative count(≤x) ≥ k}, so the
    * heavy pass is a fully-parallel groupBy(group, value) count and the
    * per-group sort touches only distinct values (corpus-size-independent
    * for fixed-precision measures — a row-level row_number window would
    * serialize each group through one task, measured 9.5× sf0.1→sf1 on a
    * 3-group column before this rewrite). */
  def winsorize(df: DataFrame, valueCol: String, groupCol: String,
                pLo: Double = 0.05, pHi: Double = 0.95): DataFrame = {
    require(pLo >= 0 && pHi <= 1 && pLo < pHi, s"bad percentiles [$pLo,$pHi]")
    val cuts = percentileCuts(df, valueCol, groupCol,
      Seq("lo" -> pLo, "hi" -> pHi))
    df.join(broadcast(cuts), col(groupCol) === col("__g"))
      .groupBy(groupCol)
      .agg(
        graft.ops.Relational.dsum(
          least(greatest(col(valueCol), col("lo")), col("hi"))).as("wsum"),
        sum(when(col(valueCol) < col("lo"), 1L).otherwise(0L)).as("n_lo"),
        sum(when(col(valueCol) > col("hi"), 1L).otherwise(0L)).as("n_hi"),
        count(lit(1)).as("n"),
        first(col("lo")).as("lo"), first(col("hi")).as("hi"))
  }

  /** Rows whose `valueCol` sits more than `threshold` robust z-scores from
    * the group median, where robust z = 0.6745·(x − median)/MAD (Iglewicz &
    * Hoaglin's modified z-score; 0.6745 rescales MAD to σ under normality,
    * 3.5 is their recommended cut). The mean/stddev flagging of
    * [[zscoreOutliers]] breaks down exactly when outliers are present —
    * the outliers inflate the stddev that is supposed to expose them; the
    * median/MAD pair has a 50% breakdown point, so this is the flagging a
    * cleaning pipeline trusts on heavy-tailed telemetry.
    *
    * Both the median and the MAD are DISCRETE rank-⌈n/2⌉ elements from
    * [[percentileCuts]]' value histogram — never interpolated — so both
    * engines pick identical cut values; the robust z is rounded to 6
    * decimals BEFORE the threshold compare (registry parity rule: low-bit
    * float differences cannot flip set membership). A constant-majority
    * group has MAD = 0 → null robust z → excluded (same nullif posture as
    * [[zscoreOutliers]]'s sd = 0 guard).
    *
    * Plan: two histogram aggregations (values, then absolute deviations)
    * each broadcast back as one row per group — the table is scanned
    * three times but shuffled never, and no row-level window appears
    * anywhere, so the shape is corpus-size-independent for
    * fixed-precision measures. */
  def madOutliers(df: DataFrame, valueCol: String, groupCol: String,
                  keyCols: Seq[String], threshold: Double = 3.5): DataFrame = {
    val med = percentileCuts(df, valueCol, groupCol, Seq("med" -> 0.5))
    val withMed = df.join(broadcast(med), col(groupCol) === col("__g"))
      .drop("__g")
      .withColumn("__dev", abs(col(valueCol) - col("med")))
    val mad = percentileCuts(withMed, "__dev", groupCol, Seq("mad" -> 0.5))
    withMed.join(broadcast(mad), col(groupCol) === col("__g"))
      .withColumn("rz", round(lit(0.6745) * (col(valueCol) - col("med")) /
        nullif(col("mad"), lit(0.0)), 6))
      .where(abs(col("rz")) > threshold)
      .select(keyCols.map(col) :+ col(valueCol) :+ col("med") :+
        col("mad") :+ col("rz"): _*)
  }

  /** Discrete per-group percentile cuts from the VALUE HISTOGRAM — the one
    * shared cut finder behind [[winsorize]] and
    * [[graft.ops.Profile.quantileHistogram]]. For each (name, p) the cut
    * is the actual group element at rank max(1, ⌈p·n⌉) — equivalently
    * min{x : cumulative count(≤x) ≥ k} — never an interpolated value, so
    * any engine picks the identical bound and comparisons against it are
    * exact. The heavy pass is a fully parallel groupBy(group, value)
    * count; the per-group cumulative window touches DISTINCT values only
    * (corpus-size-independent for fixed-precision measures; a row-level
    * row_number formulation serialized each group through one task —
    * measured 9.5× sf0.1→sf1 on a 3-group column). Returns one row per
    * group: `__g` plus one column per requested cut. */
  def percentileCuts(df: DataFrame, valueCol: String, groupCol: String,
                     ps: Seq[(String, Double)]): DataFrame = {
    require(ps.nonEmpty && ps.forall { case (_, p) => p >= 0 && p <= 1 },
      s"percentiles must be in [0, 1]: $ps")
    val cum = df.groupBy(col(groupCol), col(valueCol).as("__x"))
      .agg(count(lit(1)).as("__c"))
      .withColumn("__cum", sum("__c").over(Window.partitionBy(groupCol)
        .orderBy("__x")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__n", sum("__c").over(Window.partitionBy(groupCol)))
    val cutCols = ps.map { case (name, p) =>
      min(when(col("__cum") >= greatest(lit(1L),
        ceil(lit(p) * col("__n")).cast("long")), col("__x"))).as(name)
    }
    cum.groupBy(col(groupCol).as("__g"))
      .agg(cutCols.head, cutCols.tail: _*)
  }

  /** Weighted per-group quantiles: the cut for (name, p) is
    * min{x : Σ weight(rows with value ≤ x) ≥ ⌈p·W⌉} where W is the group's
    * total weight — the weighted generalization of [[percentileCuts]]
    * (weight ≡ 1 reduces to it exactly). Same histogram shape: the heavy
    * pass is a parallel groupBy(group, value) weight-sum, the cumulative
    * window walks DISTINCT values only, and every comparison is on exact
    * BIGINT weight totals (weights are rounded to integers — pre-scale
    * fractional weights before calling), so any engine picks the identical
    * cut. Returns one row per group: `__g` plus one column per cut. */
  def weightedQuantiles(df: DataFrame, valueCol: String, weightCol: String,
                        groupCol: String, ps: Seq[(String, Double)]): DataFrame = {
    require(ps.nonEmpty && ps.forall { case (_, p) => p >= 0 && p <= 1 },
      s"percentiles must be in [0, 1]: $ps")
    val cum = df.groupBy(col(groupCol), col(valueCol).as("__x"))
      .agg(sum(floor(col(weightCol) + 0.5).cast("long")).as("__w"))
      .withColumn("__cum", sum("__w").over(Window.partitionBy(groupCol)
        .orderBy("__x")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__n", sum("__w").over(Window.partitionBy(groupCol)))
    val cutCols = ps.map { case (name, p) =>
      min(when(col("__cum") >= greatest(lit(1L),
        ceil(lit(p) * col("__n")).cast("long")), col("__x"))).as(name)
    }
    cum.groupBy(col(groupCol).as("__g"))
      .agg(cutCols.head, cutCols.tail: _*)
  }
}
