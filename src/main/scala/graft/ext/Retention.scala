package graft.ext

import org.apache.spark.sql.DataFrame
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
}
