package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cohort-retention and rolling-active-user analytics over an event/order
  * stream — the engagement counterpart of [[Funnel]]'s ordered-step
  * analysis. Both operators reduce the raw stream to its (entity, period)
  * grain FIRST, so every later stage works on the deduplicated activity
  * matrix, never the raw event volume.
  */
object Retention {

  /** Classic cohort-retention matrix: entities grouped by the period of
    * their FIRST activity (the cohort), counted in every period they were
    * active, keyed by periods-since-cohort offset.
    *
    * Plan: one groupBy(entity) for the cohort assignment, one distinct over
    * (entity, period) for the activity matrix, an entity-keyed equi-join
    * (both sides hash-partition on the entity — a single co-partitioned
    * shuffle), then a tiny final aggregation on (cohort, offset). Nothing
    * scans raw events twice and nothing is quadratic, so the shape holds
    * when the stream is 10^12 events: the join runs on the ~#entities ×
    * #periods matrix, not the event count.
    *
    * `period` is a month here (`date_trunc("month")`); offset is exact
    * month arithmetic (years*12 + months), never day-division. */
  def cohortRetention(df: DataFrame, entityCol: String,
                      tsCol: String): DataFrame = {
    val firsts = df.groupBy(col(entityCol).as("e"))
      .agg(date_trunc("month", min(col(tsCol))).as("cm"))
    val acts = df.select(col(entityCol).as("e"),
      date_trunc("month", col(tsCol)).as("am")).distinct()
    firsts.join(acts, "e")
      .groupBy(
        date_format(col("cm"), "yyyy-MM-dd").as("cohort_month"),
        ((year(col("am")) - year(col("cm"))) * 12 +
          (month(col("am")) - month(col("cm")))).cast("long")
          .as("month_offset"))
      .agg(count(lit(1)).as("n_active"))
  }

  /** Trailing `windowDays`-day distinct active entities for every day
    * observed in the stream (the WAU/MAU daily series).
    *
    * A distinct-count over a SLIDING window is not a Spark window function
    * (count distinct isn't frame-incremental), and a day×activity range
    * join rebins the whole matrix per day. Instead each deduplicated
    * (entity, day) contributes itself to the `windowDays` days it counts
    * toward via one explode — a fixed ×windowDays expansion of the already
    * day-deduplicated matrix — followed by a single count-distinct
    * aggregation; the observed-day semi-join (broadcast — the day
    * dimension is tiny at any corpus size) drops the phantom tail past the
    * stream's end. Linear in (entities × active days), not in raw events,
    * and never quadratic in days. */
  def rollingActive(df: DataFrame, entityCol: String, tsCol: String,
                    windowDays: Int = 7): DataFrame = {
    require(windowDays >= 1, s"windowDays must be >= 1 (got $windowDays)")
    // DATE arithmetic, not `+ INTERVAL n DAY` on midnight timestamps: a
    // DayTimeInterval step is exactly 24 h, so in a DST session timezone
    // the expanded "days" drift to 01:00/23:00 after a transition and the
    // day-equality semi-join silently drops those contributions
    val ud = df.select(col(entityCol).as("e"),
      to_date(col(tsCol)).as("d")).distinct()
    val days = ud.select(col("d").as("day")).distinct()
    ud.select(col("e"), explode(sequence(col("d"),
        date_add(col("d"), windowDays - 1))).as("day"))
      .join(broadcast(days), Seq("day"), "left_semi")
      .groupBy(date_format(col("day"), "yyyy-MM-dd").as("day"))
      .agg(countDistinct(col("e")).as("n_active"))
  }

  /** Kaplan–Meier survival estimator (Kaplan & Meier, "Nonparametric
    * estimation from incomplete observations", JASA 1958) over entity
    * lifetimes: S(t) = Π_{j ≤ t} (1 − d_j/n_j), with d_j the entities
    * whose lifetime ended at day j and n_j those still at risk. An entity
    * lives from its first to its last observed day; entities whose last
    * day IS the corpus's final day are right-CENSORED (still alive —
    * they leave the risk set without counting as churn). The churn curve
    * analytics teams actually want, where [[cohortRetention]] reports raw
    * comeback rates. Returns one row per observed lifetime t:
    * (t_days, n_at_risk, n_deaths, n_censored, survival).
    *
    * Determinism: d, n are exact integers; each factor is one double
    * division and the running product folds in ascending-t order on both
    * engines (DuckDB's windowed product replays it), one r5 site.
    *
    * Scale: one (entity) aggregation for lifetimes, one day-level
    * aggregation; the running-sum/product windows touch the LIFETIME
    * table (≤ observed-day-range rows), never entities — the same
    * bucket-totals-only pattern as Packing's prefix sum. */
  def kaplanMeier(df: DataFrame, entityCol: String, tsCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val life = df.groupBy(col(entityCol))
      .agg(to_date(min(col(tsCol))).as("__f"), to_date(max(col(tsCol))).as("__l"))
    val endDay = life.agg(max(col("__l")).as("__end"))
    val lt = life.crossJoin(broadcast(endDay))
      .select(datediff(col("__l"), col("__f")).cast("long").as("t"),
        (col("__l") === col("__end")).as("__cens"))
    val agg = lt.groupBy("t").agg(
      sum(when(col("__cens"), 0L).otherwise(1L)).as("d"),
      sum(when(col("__cens"), 1L).otherwise(0L)).as("c"))
    val total = lt.agg(count(lit(1)).as("__n"))
    val wPrev = Window.orderBy("t")
      .rowsBetween(Window.unboundedPreceding, -1)
    val risk = agg.crossJoin(broadcast(total))
      .withColumn("n_at_risk",
        col("__n") - coalesce(sum(col("d") + col("c")).over(wPrev), lit(0L)))
    // running product in ascending-t order: fold over the (tiny) sorted
    // lifetime table — Spark has no product window, the fold multiplies
    // in exactly the order DuckDB's product() OVER (ORDER BY t) does
    def term(r: Column) = lit(1.0) - r.getField("d").cast("double") /
      r.getField("n_at_risk")
    def out(r: Column, s: Column) = struct(r.getField("t").as("t"),
      r.getField("d").as("d"), r.getField("c").as("c"),
      r.getField("n_at_risk").as("n"), s.as("s"))
    risk
      .agg(sort_array(collect_list(struct(col("t"), col("d"), col("c"),
        col("n_at_risk")))).as("__rows"))
      .select(explode(aggregate(
        slice(col("__rows"), lit(2), size(col("__rows")) - 1),
        array(out(element_at(col("__rows"), 1),
          term(element_at(col("__rows"), 1)))),
        (acc, r) => concat(acc,
          array(out(r, element_at(acc, -1).getField("s") * term(r))))))
        .as("__r"))
      .select(col("__r.t").as("t_days"), col("__r.n").as("n_at_risk"),
        col("__r.d").as("n_deaths"), col("__r.c").as("n_censored"),
        Timeseries.r5(col("__r.s")).as("survival"))
  }
}
