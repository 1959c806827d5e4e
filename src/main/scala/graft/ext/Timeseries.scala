package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
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
        round(aggregate(
          // fold rows 2..n onto the first value — the classic EWM seed
          slice(transform(col("__s"), s => s.getField("__v")),
            lit(2), size(col("__s")) - 1),
          element_at(col("__s"), 1).getField("__v"),
          (acc: Column, x: Column) => acc * lit(decay) + x * lit(alpha)),
          5).as("ewma"))
  }
}
