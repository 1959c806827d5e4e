package graft.ext
import graft.Ckpt.CkptOps

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Recursive per-key time-series features — the forms whose value at row i
  * depends on EVERY prior row of the key, which no SQL window FRAME can
  * express (a frame aggregates a set; recursion threads state). The
  * reference's pandas users reach for `Series.ewm(...)`; here the recursion
  * is an `aggregate` higher-order fold over the key's ordered values, so it
  * stays inside whole-stage codegen — no UDF, no driver loop.
  *
  * Scale posture: ONE shuffle (the groupBy on the key); per-key state is the
  * key's own event array, the same bounded-group assumption every
  * sessionization op in this library makes (a key's history fits one task).
  * For unbounded keys at 100 TB, bound the history first (sessionize, or a
  * time-window filter) — documented in SCALE.md; the fold itself is O(n)
  * per key, not O(n²) as a per-row prefix replay would be.
  */
object Timeseries {

  /** Deterministic 5-decimal rounding: floor(x·10⁵ + 0.5)/10⁵. Unlike
    * `round(x, 5)` (HALF_UP on the exact binary value) this is three IEEE
    * ops any engine reproduces bit-for-bit — DuckDB twin:
    * `CAST(FLOOR(x * 100000 + 0.5) AS BIGINT) / 100000.0`. Half-cases round
    * toward +∞ for negatives; that convention is part of the contract. */
  private[graft] def r5(c: Column): Column =
    floor(c * 100000.0 + 0.5).cast("long") / 100000.0

  private[graft] def r6(c: Column): Column =
    floor(c * 1000000.0 + 0.5).cast("long") / 1000000.0

  /** Exponentially-weighted moving average per key, seeded with the key's
    * first value: y₁ = x₁, yᵢ = α·xᵢ + (1−α)·yᵢ₋₁ over events ordered by
    * `orderCols` (which must form a total order within a key — pass a
    * unique id as the last column). Returns one row per key:
    * (key, n_events, ewma) with the EWMA rounded to 5 decimals — the fold
    * order is deterministic, so any two runs (1 or 1000 executors) agree
    * bit-for-bit before rounding. Prefer a dyadic `alpha` (0.5, 0.25) when
    * a cross-engine replay must match: both α and 1−α are then exact
    * doubles. */
  def ewma(df: DataFrame, keyCol: String, orderCols: Seq[String],
           valueCol: String, alpha: Double): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0, 1]: $alpha")
    require(orderCols.nonEmpty, "ewma needs at least one ordering column")
    val decay = 1 - alpha
    val ordered = sort_array(collect_list(struct(
      orderCols.map(col) :+ col(valueCol).cast("double").as("__v"): _*)))
    df.groupBy(col(keyCol))
      .agg(ordered.as("__s"), count(lit(1)).cast("long").as("n_events"))
      .select(col(keyCol), col("n_events"),
        r5(aggregate(
          // fold rows 2..n onto the first value — the classic EWM seed
          slice(transform(col("__s"), s => s.getField("__v")),
            lit(2), size(col("__s")) - 1),
          element_at(col("__s"), 1).getField("__v"),
          (acc: Column, x: Column) => acc * lit(decay) + x * lit(alpha)))
          .as("ewma"))
  }

  /** Per-ROW exponential smoothing: every input row back, tagged with its
    * EWMA-to-date (same recursion and seed as [[ewma]] — the last row's
    * `ewma` equals [[ewma]]'s summary value). The fold builds the key's
    * smoothed prefix array, then `zip_with`+`explode` restores one row per
    * event. The array-append fold copies the accumulator per step — O(n²)
    * bytes per key — so this is strictly for bounded key histories (the
    * same contract as [[ewma]], enforced by the caller); the summary form
    * is the one to reach for when only the final state matters. */
  def ewmaSeries(df: DataFrame, keyCol: String, orderCols: Seq[String],
                 valueCol: String, alpha: Double): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0, 1]: $alpha")
    require(orderCols.nonEmpty, "ewmaSeries needs at least one ordering column")
    val decay = 1 - alpha
    val ordered = sort_array(collect_list(struct(
      orderCols.map(col) :+ col(valueCol).cast("double").as("__v"): _*)))
    val ys = aggregate(
      slice(transform(col("__s"), s => s.getField("__v")),
        lit(2), size(col("__s")) - 1),
      array(element_at(col("__s"), 1).getField("__v")),
      (acc: Column, x: Column) =>
        concat(acc, array(element_at(acc, -1) * lit(decay) + x * lit(alpha))))
    val zipped = zip_with(col("__s"), ys, (s, y) => struct(
      orderCols.map(n => s.getField(n).as(n)) :+
        s.getField("__v").as("__v") :+ r5(y).as("__e"): _*))
    df.groupBy(col(keyCol)).agg(ordered.as("__s"))
      .select(col(keyCol), explode(zipped).as("__r"))
      .select(col(keyCol) +: orderCols.map(n => col(s"__r.$n").as(n)) :+
        col("__r.__v").as(valueCol) :+ col("__r.__e").as("ewma"): _*)
  }

  /** Holt double-exponential smoothing per key: level + linear trend, the
    * first forecasting upgrade pandas users make from `ewm`. Seeded
    * l₁ = x₁, b₁ = 0; then lᵢ = α·xᵢ + (1−α)(lᵢ₋₁+bᵢ₋₁),
    * bᵢ = β(lᵢ−lᵢ₋₁) + (1−β)bᵢ₋₁ (Holt 1957). One row per key:
    * (key, n_events, level, trend, forecast = level + trend), each rounded
    * to 5 decimals. Dyadic α/β keep the pre-rounding doubles bit-identical
    * across engines. Same one-shuffle bounded-history contract as
    * [[ewma]]. */
  def holt(df: DataFrame, keyCol: String, orderCols: Seq[String],
           valueCol: String, alpha: Double, beta: Double): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0, 1]: $alpha")
    require(beta > 0 && beta <= 1, s"beta must be in (0, 1]: $beta")
    require(orderCols.nonEmpty, "holt needs at least one ordering column")
    val (da, db) = (1 - alpha, 1 - beta)
    val ordered = sort_array(collect_list(struct(
      orderCols.map(col) :+ col(valueCol).cast("double").as("__v"): _*)))
    def step(acc: Column, x: Column): Column = {
      val nl = x * lit(alpha) + (acc.getField("l") + acc.getField("b")) * lit(da)
      struct(nl.as("l"),
        ((nl - acc.getField("l")) * lit(beta) + acc.getField("b") * lit(db))
          .as("b"))
    }
    df.groupBy(col(keyCol))
      .agg(ordered.as("__s"), count(lit(1)).cast("long").as("n_events"))
      .withColumn("__st", aggregate(
        slice(transform(col("__s"), s => s.getField("__v")),
          lit(2), size(col("__s")) - 1),
        struct(element_at(col("__s"), 1).getField("__v").as("l"),
          lit(0.0).as("b")),
        step))
      .select(col(keyCol), col("n_events"),
        r5(col("__st.l")).as("level"),
        r5(col("__st.b")).as("trend"),
        r5(col("__st.l") + col("__st.b")).as("forecast"))
  }

  /** Holt–Winters ADDITIVE triple exponential smoothing per key (Winters,
    * "Forecasting sales by exponentially weighted moving averages",
    * Management Science 1960): level + trend + a `period`-slot seasonal
    * index, the seasonal upgrade from [[holt]]. Seeded l₁ = x₁, b₁ = 0,
    * s = 0⃗ (the simple seed — a contract, documented, replayed by the
    * oracle); for i ≥ 2 with slot = (i−1) mod period:
    * l ← α(x − s[slot]) + (1−α)(l+b); b ← β(l−l_prev) + (1−β)b;
    * s[slot] ← γ(x − l) + (1−γ)s[slot]. One row per key:
    * (key, n_events, level, trend, season = next step's seasonal index,
    * forecast = level + trend + season), r5-rounded. Dyadic α/β/γ keep
    * every pre-rounding double bit-identical across engines. Same
    * one-shuffle bounded-history contract as [[ewma]]. */
  def holtWinters(df: DataFrame, keyCol: String, orderCols: Seq[String],
                  valueCol: String, alpha: Double, beta: Double,
                  gamma: Double, period: Int = 4): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0, 1]: $alpha")
    require(beta > 0 && beta <= 1, s"beta must be in (0, 1]: $beta")
    require(gamma > 0 && gamma <= 1, s"gamma must be in (0, 1]: $gamma")
    require(period >= 2, s"period must be >= 2: $period")
    require(orderCols.nonEmpty, "holtWinters needs an ordering column")
    val (da, db, dg) = (1 - alpha, 1 - beta, 1 - gamma)
    val ordered = sort_array(collect_list(struct(
      orderCols.map(col) :+ col(valueCol).cast("double").as("__v"): _*)))
    def step(acc: Column, x: Column): Column = {
      val i = acc.getField("i") + 1
      val idx0 = ((i - 1) % period).cast("int")
      val sv = element_at(acc.getField("s"), idx0 + 1)
      val nl = (x - sv) * lit(alpha) +
        (acc.getField("l") + acc.getField("b")) * lit(da)
      val nb = (nl - acc.getField("l")) * lit(beta) +
        acc.getField("b") * lit(db)
      val ns = concat(
        slice(acc.getField("s"), lit(1), idx0),
        array((x - nl) * lit(gamma) + sv * lit(dg)),
        slice(acc.getField("s"), idx0 + 2, lit(period) - idx0 - 1))
      struct(nl.as("l"), nb.as("b"), ns.as("s"), i.as("i"))
    }
    val nextSlot = ((col("n_events") % period) + 1).cast("int")
    df.groupBy(col(keyCol))
      .agg(ordered.as("__s"), count(lit(1)).cast("long").as("n_events"))
      .withColumn("__st", aggregate(
        slice(transform(col("__s"), s => s.getField("__v")),
          lit(2), size(col("__s")) - 1),
        struct(element_at(col("__s"), 1).getField("__v").as("l"),
          lit(0.0).as("b"),
          array_repeat(lit(0.0), period).as("s"),
          lit(1L).as("i")),
        step))
      .select(col(keyCol), col("n_events"),
        r5(col("__st.l")).as("level"),
        r5(col("__st.b")).as("trend"),
        r5(element_at(col("__st.s"), nextSlot)).as("season"),
        r5(col("__st.l") + col("__st.b") +
          element_at(col("__st.s"), nextSlot)).as("forecast"))
  }

  /** Two-sided CUSUM change detection per key (Page 1954): standardized
    * residuals zᵢ = (xᵢ−μ)/σ folded through S⁺ᵢ = max(0, S⁺ᵢ₋₁+zᵢ−k) and
    * S⁻ᵢ = min(0, S⁻ᵢ₋₁+zᵢ+k); a large max S⁺ / min S⁻ flags a sustained
    * upward / downward level shift. Returns one row per key:
    * (key, n_events, cusum_pos = max S⁺, cusum_neg = min S⁻), rounded to 5.
    *
    * Cross-engine determinism: μ and σ are derived from EXACT integer-cents
    * sums (Σc and Σc² as BIGINT), so the doubles that enter the fold are
    * bit-identical on any engine or executor count; a constant key (σ = 0)
    * folds z = 0 rather than dividing. One shuffle, bounded-history
    * contract as [[ewma]]; `drift` is the classic k (use a dyadic value,
    * e.g. 0.5, when a cross-engine replay must hash-match). */
  def cusum(df: DataFrame, keyCol: String, orderCols: Seq[String],
            valueCol: String, drift: Double): DataFrame = {
    require(drift >= 0, s"drift must be >= 0: $drift")
    require(orderCols.nonEmpty, "cusum needs at least one ordering column")
    val cents = floor(col(valueCol) * 100 + 0.5).cast("long")
    val ordered = sort_array(collect_list(struct(
      orderCols.map(col) :+ cents.as("__c"): _*)))
    val n = count(lit(1)).cast("long")
    val agged = df.groupBy(col(keyCol))
      .agg(ordered.as("__s"), n.as("n_events"),
        sum(cents).as("__sc"), sum(cents * cents).as("__scc"))
    val nD = col("n_events").cast("double")
    val mc = col("__sc").cast("double") / nD            // mean cents
    val varC = col("__scc").cast("double") / nD - mc * mc
    val sigma = sqrt(varC) / 100.0                      // value units
    val mu = mc / 100.0
    val k = lit(drift)
    def z(c: Column): Column =
      when(sigma === 0.0, 0.0).otherwise((c.cast("double") / 100.0 - mu) / sigma)
    // each element carries its z plus the state it would seed as row 1
    def seeded(c: Column): Column = {
      val z1 = z(c)
      val (p1, q1) = (greatest(z1 - k, lit(0.0)), least(z1 + k, lit(0.0)))
      struct(z1.as("z"), p1.as("p"), q1.as("q"), p1.as("mp"), q1.as("mq"))
    }
    def step(acc: Column, x: Column): Column = {
      val p = greatest(acc.getField("p") + x.getField("z") - k, lit(0.0))
      val q = least(acc.getField("q") + x.getField("z") + k, lit(0.0))
      struct(x.getField("z").as("z"), p.as("p"), q.as("q"),
        greatest(acc.getField("mp"), p).as("mp"),
        least(acc.getField("mq"), q).as("mq"))
    }
    agged
      .withColumn("__st", aggregate(
        slice(transform(col("__s"), s => seeded(s.getField("__c"))),
          lit(2), size(col("__s")) - 1),
        seeded(element_at(col("__s"), 1).getField("__c")),
        step))
      .select(col(keyCol), col("n_events"),
        r5(col("__st.mp")).as("cusum_pos"),
        r5(col("__st.mq")).as("cusum_neg"))
  }

  /** Per-key OLS linear trend of value over event time — the grouped
    * `scipy.stats.linregress` replacement, exact where it matters. ONE
    * aggregation pass computes the five closed-form sums; x is seconds
    * since the KEY'S FIRST event (shift-invariant slope, and the shift
    * keeps Σx² inside exact integer range), y is integer cents. Σx/Σy stay
    * BIGINT; Σx²/Σxy/Σy² are summed as DECIMAL(38,0) — all exact, so the
    * doubles entering the final ratio are bit-identical on any engine, and
    * only then does float arithmetic happen (deterministic expression
    * order). Returns (key, n_events, slope_per_day in value units,
    * intercept = fitted value at the first event, r2); slope/intercept/r2
    * null when degenerate (single point, zero x- or y-variance for r2).
    * Scale: a window min + one groupBy — no bounded-history assumption,
    * this one is safe for unbounded keys. */
  def linearTrend(df: DataFrame, keyCol: String, tsCol: String,
                  valueCol: String): DataFrame = {
    val w = Window.partitionBy(keyCol)
    val secs = graft.functions.Time.tsSeconds(col(tsCol))
    val base = df
      .withColumn("__x", secs - min(secs).over(w))
      .withColumn("__c", floor(col(valueCol) * 100 + 0.5).cast("long"))
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val agged = base.groupBy(col(keyCol)).agg(
      count(lit(1)).cast("long").as("n_events"),
      sum(col("__x")).as("__sx"), sum(col("__c")).as("__sy"),
      sum(dec(col("__x")) * dec(col("__x"))).as("__sxx"),
      sum(dec(col("__x")) * dec(col("__c"))).as("__sxy"),
      sum(dec(col("__c")) * dec(col("__c"))).as("__syy"))
    val nD = col("n_events").cast("double")
    val (sx, sy) = (col("__sx").cast("double"), col("__sy").cast("double"))
    val (sxx, sxy, syy) = (col("__sxx").cast("double"),
      col("__sxy").cast("double"), col("__syy").cast("double"))
    val den = nD * sxx - sx * sx
    val cov = nD * sxy - sx * sy
    val deny = nD * syy - sy * sy
    val slopeCps = cov / den                  // cents per second
    agged.select(col(keyCol), col("n_events"),
      r5(when(den === 0.0, null).otherwise(slopeCps * 864.0))
        .as("slope_per_day"),                 // *86400/100 → value units/day
      r5(when(den === 0.0, null)
        .otherwise((sy * sxx - sx * sxy) / den / 100.0)).as("intercept"),
      r5(when(den === 0.0 or deny === 0.0, null)
        .otherwise(cov * cov / (den * deny))).as("r2"))
  }

  /** Time-bucket OHLC resample — the pandas `resample(...).ohlc()` /
    * candlestick downsample. One row per (key, bucket): open = value at the
    * bucket's first event, close = at its last (both picked by lexicographic
    * MIN/MAX over (ts, tiebreak, value) structs — exact, no window pass),
    * high/low = max/min, n_events, and vsum as an exact integer-cents sum.
    * `bucket` is a `date_trunc` unit ("hour", "day", "week", ...). Pure
    * partial-aggregable groupBy: ONE shuffle of bucket-sized partials,
    * unbounded keys welcome — this is the op that turns a 100 TB event
    * stream into a plottable frame. */
  def ohlc(df: DataFrame, keyCol: String, tsCol: String, tiebreakCol: String,
           valueCol: String, bucket: String): DataFrame = {
    val pick = struct(col(tsCol), col(tiebreakCol),
      col(valueCol).cast("double").as("__v"))
    df.groupBy(col(keyCol),
        date_trunc(bucket, col(tsCol)).as("bucket_ts"))
      .agg(
        min(pick).getField("__v").as("open"),
        max(col(valueCol)).as("high"),
        min(col(valueCol)).as("low"),
        max(pick).getField("__v").as("close"),
        count(lit(1)).cast("long").as("n_events"),
        (sum(floor(col(valueCol) * 100 + 0.5).cast("long")).cast("double")
          / 100.0).as("vsum"))
  }

  /** Trailing TIME-range rolling features: for every event, the exact-cents
    * sum, count, and mean of the key's events in the last `windowSeconds`
    * seconds INCLUDING this one — the wall-clock sibling of the row-count
    * frame in `w4_rolling` (a RANGE frame holds "last hour", not "last 5
    * rows", under irregular event spacing). Events sharing the same whole
    * second are frame peers and get identical values on every engine —
    * that's RANGE semantics, not an implementation accident. One shuffle
    * (the window partition); the frame is streaming state inside the sorted
    * partition, never materialized. */
  def rollingTime(df: DataFrame, keyCol: String, tsCol: String,
                  idCol: String, valueCol: String,
                  windowSeconds: Long): DataFrame = {
    require(windowSeconds > 0, s"windowSeconds must be > 0: $windowSeconds")
    val secs = graft.functions.Time.tsSeconds(col(tsCol))
    val w = Window.partitionBy(keyCol).orderBy(secs)
      .rangeBetween(-windowSeconds, 0)
    val csum = sum(floor(col(valueCol) * 100 + 0.5).cast("long")).over(w)
    val n = count(lit(1)).over(w)
    df.select(col(keyCol), col(idCol),
      (csum.cast("double") / 100.0).as("roll_sum"),
      n.as("n_win"),
      (csum.cast("double") / 100.0 / n).as("roll_mean"))
  }

  /** Hour-of-day seasonal profile per key: for each (key, hour 0–23),
    * n_events and seasonal_idx = bucket mean / key mean — the
    * multiplicative seasonal index (1.0 = flat, 2.0 = that hour runs
    * double the key's average). The ratio is computed integer-first:
    * idx = (Σc_bucket · n_key) / (n_bucket · Σc_key) with cents BIGINTs,
    * so the only floats are two products and one division — identical on
    * any engine and any executor count. Keys whose cents sum to exactly 0
    * get null (a ratio of means is meaningless around a zero mean).
    *
    * Plan: one partial-aggregable groupBy(key, hour) shuffle over the
    * events; the per-key totals come from a window over the ≤24-rows-per-
    * key bucket table — O(keys·24), never the event table again.
    * Unbounded keys welcome. */
  def seasonal(df: DataFrame, keyCol: String, tsCol: String,
               valueCol: String): DataFrame = {
    val agg = df
      .groupBy(col(keyCol), hour(col(tsCol)).cast("long").as("hour"))
      .agg(sum(floor(col(valueCol) * 100 + 0.5).cast("long")).as("__s"),
        count(lit(1)).as("__n"))
    val wk = Window.partitionBy(keyCol)
    val (st, nt) = (sum(col("__s")).over(wk), sum(col("__n")).over(wk))
    agg.select(col(keyCol), col("hour"), col("__n").as("n_events"),
      r5(when(st === 0L, null).otherwise(
        (col("__s").cast("double") * nt.cast("double"))
          / (col("__n").cast("double") * st.cast("double"))))
        .as("seasonal_idx"))
  }

  /** Trailing-window anomaly detection: flag events whose value deviates
    * more than `threshold` sigma from the mean of the key's OWN last
    * `windowSeconds` seconds (self-inclusive RANGE frame — the same
    * wall-clock frame as [[rollingTime]]). Returns only the anomalous
    * rows: (key, id, n_win, z). Windows with fewer than `minN` events or
    * zero variance never flag — a 2-event window calling one of them
    * anomalous is noise, not detection.
    *
    * Exactness: z = (n·c − Σc) / √(n·Σc² − (Σc)²) — numerator and the
    * radicand are exact integers (cents BIGINT, squares DECIMAL(38,0)),
    * so z is one division of two deterministic doubles; the > threshold
    * filter compares identical bits on every engine. One shuffle (the
    * window partition); per-row state inside the sorted partition only. */
  def anomalies(df: DataFrame, keyCol: String, tsCol: String, idCol: String,
                valueCol: String, windowSeconds: Long,
                threshold: Double = 3.0, minN: Long = 5L): DataFrame = {
    require(windowSeconds > 0, s"windowSeconds must be > 0: $windowSeconds")
    require(threshold > 0, s"threshold must be > 0: $threshold")
    val secs = graft.functions.Time.tsSeconds(col(tsCol))
    val w = Window.partitionBy(keyCol).orderBy(secs)
      .rangeBetween(-windowSeconds, 0)
    val dec = (x: Column) => x.cast("decimal(38,0)")
    val c = floor(col(valueCol) * 100 + 0.5).cast("long")
    val base = df.select(col(keyCol), col(idCol), c.as("__c"),
      count(lit(1)).over(w).as("__n"),
      sum(c).over(w).as("__s"),
      sum(dec(c) * dec(c)).over(w).as("__scc"))
    val num = (col("__n") * col("__c") - col("__s")).cast("double")
    val den = (dec(col("__n")) * col("__scc") - dec(col("__s")) * dec(col("__s")))
      .cast("double")
    base
      .withColumn("__z", when(den > 0.0, num / sqrt(den)))
      .where(col("__n") >= minN && col("__z").isNotNull &&
        abs(col("__z")) > threshold)
      .select(col(keyCol), col(idCol), col("__n").as("n_win"),
        r5(col("__z")).as("z"))
  }

  /** Trailing wall-clock rolling MEDIAN per key — the robust sibling of
    * [[rollingTime]]'s mean (one outlier in the window moves the mean,
    * not the median). Exact by construction: the frame's cents collect
    * into a sorted array and the LOWER median (element ⌈n/2⌉) is picked —
    * never interpolated, so any engine picks the identical element.
    * Same-second events are frame peers (RANGE semantics, as
    * [[rollingTime]]).
    *
    * Cost contract: the frame's values materialize per row — O(window)
    * memory and O(w log w) per row, unlike the O(1)-state sum/count
    * frames. That is inherent to exact medians; size `windowSeconds` by
    * key rate, or pre-aggregate to per-second rollups for hot keys (the
    * [[anomalies]] guidance). One shuffle (the window partition). */
  def rollingMedian(df: DataFrame, keyCol: String, tsCol: String,
                    idCol: String, valueCol: String,
                    windowSeconds: Long): DataFrame = {
    require(windowSeconds > 0, s"windowSeconds must be > 0: $windowSeconds")
    val secs = graft.functions.Time.tsSeconds(col(tsCol))
    val w = Window.partitionBy(keyCol).orderBy(secs)
      .rangeBetween(-windowSeconds, 0)
    val arr = sort_array(
      collect_list(floor(col(valueCol) * 100 + 0.5).cast("long")).over(w))
    df.select(col(keyCol), col(idCol), arr.as("__a"))
      .select(col(keyCol), col(idCol),
        size(col("__a")).cast("long").as("n_win"),
        (element_at(col("__a"),
          floor((size(col("__a")) + 1) / 2.0).cast("int"))
          .cast("double") / 100.0).as("roll_median"))
  }

  /** Linear-interpolation resample per key: the series value at every
    * `stepSeconds`-aligned grid point inside the key's [first, last] span,
    * linearly interpolated between the surrounding events — the
    * irregular-to-regular resampler (the step-function sibling is
    * [[twap]]; the zero-fill count grid is `f_gapfill`). Multiple events
    * in one second collapse to the second's LAST value (max id — the
    * [[twap]] step convention); a grid point landing exactly on an event
    * second returns that value.
    *
    * Exactness: v(g) = (c_prev·(t_next−g) + c_next·(g−t_prev)) /
    * (t_next−t_prev) — integer numerator (DECIMAL(38,0)) and denominator,
    * one double division + FLOOR rounding. Plan: the grid derives from a
    * per-key span aggregate exploded through sequence() (never a driver
    * collect); neighbors come from two directional IGNORE-NULLS windows
    * over the union of events and grid rows — one Exchange on the key,
    * two sorts, no join. Grid volume is span/step rows per key; pick
    * `stepSeconds` accordingly. */
  def interpolate(df: DataFrame, keyCol: String, tsCol: String,
                  idCol: String, valueCol: String,
                  stepSeconds: Long): DataFrame = {
    require(stepSeconds > 0, s"stepSeconds must be > 0: $stepSeconds")
    val persec = df
      .select(col(keyCol),
        graft.functions.Time.tsSeconds(col(tsCol)).as("__sec"),
        struct(col(idCol),
          floor(col(valueCol) * 100 + 0.5).cast("long").as("__c")).as("__p"))
      .groupBy(col(keyCol), col("__sec"))
      .agg(max(col("__p")).getField("__c").as("__c"))
      // materialized: consumed by the span/grid derivation AND the union —
      // without it the per-second collapse scans the events twice
      .ckpt()
    val grid = persec.groupBy(col(keyCol))
      .agg(min(col("__sec")).as("__s0"), max(col("__sec")).as("__s1"))
      .select(col(keyCol),
        // div = integer division (Spark's / on longs is true division)
        expr(s"((__s0 + ${stepSeconds - 1}L) div ${stepSeconds}L)" +
          s" * ${stepSeconds}L").as("__g0"),
        expr(s"(__s1 div ${stepSeconds}L) * ${stepSeconds}L").as("__g1"))
      .where(col("__g0") <= col("__g1"))
      .select(col(keyCol),
        explode(sequence(col("__g0"), col("__g1"), lit(stepSeconds)))
          .as("__sec"))
      .select(col(keyCol), col("__sec"), lit(null).cast("long").as("__c"),
        lit(0).as("__real"))
    val all = persec.withColumn("__real", lit(1))
      .select(col(keyCol), col("__sec"), col("__c"), col("__real"))
      .unionByName(grid)
    val wPrev = Window.partitionBy(keyCol)
      .orderBy(col("__sec"), col("__real").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // "next" = last over the REVERSED running frame, not first over a
    // (currentRow, unboundedFollowing) frame: Spark evaluates
    // unbounded-FOLLOWING frames by recomputing the aggregate per row —
    // O(rows²) per key partition (measured 0.6 → 3.3 s at sf0.1 for the
    // second window alone) — while both running frames stream in O(rows).
    val wNext = Window.partitionBy(keyCol)
      .orderBy(col("__sec").desc, col("__real").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val evSec = when(col("__real") === 1, col("__sec"))
    val dec = (x: Column) => x.cast("decimal(38,0)")
    val neigh = all
      .withColumn("__cp", last(col("__c"), ignoreNulls = true).over(wPrev))
      .withColumn("__tp", last(evSec, ignoreNulls = true).over(wPrev))
      .withColumn("__cn", last(col("__c"), ignoreNulls = true).over(wNext))
      .withColumn("__tn", last(evSec, ignoreNulls = true).over(wNext))
      .where(col("__real") === 0 &&
        col("__cp").isNotNull && col("__cn").isNotNull)
    neigh.select(col(keyCol), col("__sec").as("grid_sec"),
      r5(when(col("__tn") === col("__tp"),
        col("__cp").cast("double") / 100.0)
        .otherwise(
          (dec(col("__cp")) * dec(col("__tn") - col("__sec")) +
            dec(col("__cn")) * dec(col("__sec") - col("__tp")))
            .cast("double")
            / (col("__tn") - col("__tp")).cast("double") / 100.0))
        .as("interp"))
  }

  /** Time-weighted average per key (step interpolation): each value holds
    * from its event until the key's next event; twap = Σ(durᵢ·cᵢ) / Σdurᵢ
    * over the hold intervals — the irregular-spacing-correct mean (a plain
    * AVG over-weights burst periods; TWAP weights each value by how long
    * it was current). The last event has no hold interval and contributes
    * nothing (TWAP over [first, last)); single-event keys are absent and
    * all-same-second keys null. Durations are whole seconds (exact
    * BIGINT), products DECIMAL(38,0) — one division + FLOOR rounding is
    * the only float work. One lag window + a groupBy that reuses its key
    * partitioning: one Exchange, unbounded keys welcome. */
  def twap(df: DataFrame, keyCol: String, tsCol: String, idCol: String,
           valueCol: String): DataFrame = {
    val base = df.select(col(keyCol),
      graft.functions.Time.tsSeconds(col(tsCol)).as("__sec"), col(idCol),
      floor(col(valueCol) * 100 + 0.5).cast("long").as("__c"))
    val w = Window.partitionBy(keyCol).orderBy(col("__sec"), col(idCol))
    val dec = (x: Column) => x.cast("decimal(38,0)")
    val agged = base
      .withColumn("__d", lead(col("__sec"), 1).over(w) - col("__sec"))
      .where(col("__d").isNotNull)
      .groupBy(col(keyCol))
      .agg(count(lit(1)).cast("long").as("n_holds"),
        sum(dec(col("__d")) * dec(col("__c"))).as("__sdc"),
        sum(col("__d")).as("__sd"))
    agged.select(col(keyCol), col("n_holds"),
      r5(when(col("__sd") > 0L,
        col("__sdc").cast("double") / col("__sd").cast("double") / 100.0))
        .as("twap"))
  }

  /** Cross-correlation between two event types per key: Pearson r between
    * the types' per-bucket cents sums over the key's active time buckets —
    * "do purchases move with clicks for this user?" A bucket enters the
    * pair set when the key has ANY event in it (either type's sum may then
    * be 0), so the pairing is a pure function of the key's event stream.
    * Same exact-sum determinism as [[acf1]]: all six accumulators are
    * integers (cents BIGINT, products DECIMAL(38,0)); zero variance on
    * either side → null. Two partial-aggregable groupBys, both shuffling
    * bucket-sized partials on the key — unbounded keys welcome. */
  def crossCorr(df: DataFrame, keyCol: String, tsCol: String,
                typeCol: String, valueCol: String, typeA: String,
                typeB: String, bucket: String = "hour"): DataFrame = {
    val c = floor(col(valueCol) * 100 + 0.5).cast("long")
    val base = df.groupBy(col(keyCol),
        date_trunc(bucket, col(tsCol)).as("__b"))
      .agg(sum(when(col(typeCol) === typeA, c).otherwise(0L)).as("__a"),
        sum(when(col(typeCol) === typeB, c).otherwise(0L)).as("__bv"))
    val dec = (x: Column) => x.cast("decimal(38,0)")
    val agged = base.groupBy(col(keyCol)).agg(
      count(lit(1)).cast("long").as("n_buckets"),
      sum(col("__a")).as("__sa"), sum(col("__bv")).as("__sb"),
      sum(dec(col("__a")) * dec(col("__a"))).as("__saa"),
      sum(dec(col("__bv")) * dec(col("__bv"))).as("__sbb"),
      sum(dec(col("__a")) * dec(col("__bv"))).as("__sab"))
    val nD = col("n_buckets").cast("double")
    val (sa, sb) = (col("__sa").cast("double"), col("__sb").cast("double"))
    val (saa, sbb, sab) = (col("__saa").cast("double"),
      col("__sbb").cast("double"), col("__sab").cast("double"))
    val da = nD * saa - sa * sa
    val db = nD * sbb - sb * sb
    agged.select(col(keyCol), col("n_buckets"),
      r5(when(da === 0.0 or db === 0.0, null)
        .otherwise((nD * sab - sa * sb) / sqrt(da * db))).as("xcorr"))
  }

  /** Lag-1 autocorrelation per key: Pearson r between consecutive values in
    * event order — the persistence/mean-reversion screen (near +1: trending
    * series, near 0: noise, negative: oscillation). The (xᵢ₋₁, xᵢ) pairs
    * come from ONE window lag; the six closed-form sums accumulate exactly
    * (cents as BIGINT, products as DECIMAL(38,0)), floats only in the final
    * ratio — the same determinism contract as [[linearTrend]]. Keys with a
    * single event have no pair and are absent from the result; zero
    * variance on either side yields a null acf1. One shuffle (window +
    * groupBy share the key partitioning); safe for unbounded keys. */
  def acf1(df: DataFrame, keyCol: String, tsCol: String, idCol: String,
           valueCol: String): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col(idCol))
    val c = floor(col(valueCol) * 100 + 0.5).cast("long")
    val base = df
      .select(col(keyCol), c.as("__b"), lag(c, 1).over(w).as("__a"))
      .where(col("__a").isNotNull)
    val dec = (x: Column) => x.cast("decimal(38,0)")
    val agged = base.groupBy(col(keyCol)).agg(
      count(lit(1)).cast("long").as("n_pairs"),
      sum(col("__a")).as("__sa"), sum(col("__b")).as("__sb"),
      sum(dec(col("__a")) * dec(col("__a"))).as("__saa"),
      sum(dec(col("__b")) * dec(col("__b"))).as("__sbb"),
      sum(dec(col("__a")) * dec(col("__b"))).as("__sab"))
    val nD = col("n_pairs").cast("double")
    val (sa, sb) = (col("__sa").cast("double"), col("__sb").cast("double"))
    val (saa, sbb, sab) = (col("__saa").cast("double"),
      col("__sbb").cast("double"), col("__sab").cast("double"))
    val da = nD * saa - sa * sa
    val db = nD * sbb - sb * sb
    agged.select(col(keyCol), col("n_pairs"),
      r5(when(da === 0.0 or db === 0.0, null)
        .otherwise((nD * sab - sa * sb) / sqrt(da * db))).as("acf1"))
  }

  /** Theil–Sen robust slope per key (Theil 1950 / Sen, "Estimates of the
    * regression coefficient based on Kendall's tau", JASA 1968): the
    * MEDIAN of all pairwise slopes (v_j − v_i)/(t_j − t_i) over the key's
    * points with t_i < t_j — the outlier-resistant alternative to
    * [[linreg]]'s OLS (one wild point moves OLS arbitrarily; Theil–Sen
    * tolerates ~29% contamination). Same-second pairs are excluded (Δt=0
    * has no slope). Returns (key, n_pairs, slope).
    *
    * Determinism: values enter as exact cents, times as whole epoch
    * seconds, so each pairwise slope is ONE double division of integers —
    * bit-identical on every engine; the median is a lower-median ELEMENT
    * pick ([[rollingMedian]]'s rule), never an interpolation, so no
    * rounding site is needed at all. Ties in the slope order cannot leak:
    * equal slopes are equal VALUES, so whichever tie row_number picks at
    * the median position carries the same answer.
    *
    * Scale: the pair join is inherently O(points²) PER KEY — correct and
    * cheap for per-entity series (points in the hundreds), quadratic for
    * mega-keys; cap or sample points per key upstream, or fall back to
    * [[linreg]] where p99 group size is unbounded (SCALE.md). The window
    * ranks within one key's pairs — parallel across keys. */
  def theilSen(df: DataFrame, keyCol: String, tsCol: String,
               valueCol: String): DataFrame = {
    val pts = df.select(col(keyCol).as("k"),
      graft.functions.Time.tsSeconds(col(tsCol)).as("t"),
      floor(col(valueCol) * 100 + 0.5).cast("long").as("c"))
    val pairs = pts.as("a").join(pts.as("b"),
        col("a.k") === col("b.k") && col("a.t") < col("b.t"))
      .select(col("a.k").as("k"),
        ((col("b.c") - col("a.c")).cast("double") /
          (lit(100.0) * (col("b.t") - col("a.t")))).as("slope"))
    val n = pairs.groupBy("k").agg(count(lit(1)).as("n_pairs"))
    val w = Window.partitionBy("k").orderBy("slope")
    pairs.withColumn("rn", row_number().over(w).cast("long"))
      .join(n, Seq("k"))
      .where(col("rn") === floor((col("n_pairs") + 1) / lit(2)).cast("long"))
      .select(col("k").as(keyCol), col("n_pairs"), col("slope"))
  }
}
