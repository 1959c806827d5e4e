package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pareto-front (skyline) extraction — the multi-criteria selection
  * operator (Börzsönyi, Kossmann & Stocker, "The Skyline Operator", ICDE
  * 2001): the rows no other row beats on every criterion at once. The
  * training-data use is document SELECTION under competing signals — e.g.
  * maximize quality score while minimizing near-dup count: the front is
  * the set of defensible picks, everything else is dominated by a
  * strictly-better document.
  */
object Skyline {

  /** Two-criteria skyline: rows of `df` not dominated on (minimize
    * `minCol`, maximize `maxCol`). b dominates a iff b.min ≤ a.min ∧
    * b.max ≥ a.max, strictly in at least one — so exact duplicates on both
    * criteria dominate nothing and BOTH stay in the front (the SQL
    * NOT-EXISTS semantics). Pass exact-typed criteria (integers / cents):
    * every comparison here is equality-exact, so the result is a set
    * function of the data with no float tolerance anywhere.
    *
    * Scale shape — prune-then-verify, never all-pairs over the data:
    *  1. Bucket rows by fixed-width ranges of `minCol` (one 1-row min/max
    *     aggregate, broadcast). Compute each bucket's best `maxCol` and the
    *     running best over strictly-lower buckets (a ≤`buckets`-row frame).
    *     Any row whose `maxCol` falls below the best of a strictly-cheaper
    *     bucket is dominated by that bucket's witness — filtered with one
    *     broadcast join, O(n) work, no shuffle of the data.
    *  2. The survivors (the front plus boundary ties — bounded by the
    *     front size × bucket resolution on non-degenerate data) finish
    *     with the exact 2-D dominance sweep: a row is dominated iff some
    *     row at strictly smaller `minCol` reaches its `maxCol`
    *     (an unbounded-preceding RANGE max, excluding the current key), or
    *     some row at EQUAL `minCol` strictly beats it (a per-key max).
    *     Skyline rows are never pruned in step 1 (pruning only removes
    *     dominated rows), and both sweep witnesses provably survive step 1
    *     themselves, so sweeping the survivors alone is complete.
    *
    * The step-2 RANGE window is global — over the SURVIVORS only, which is
    * the point of step 1. Worst case is ANTI-correlated criteria (every
    * row on the front): the survivor set is then the data and the sweep
    * serializes — a skyline that size is no longer a selection and should
    * be re-cut with a coarser criterion; noted in SCALE.md. `minCol` must
    * be numeric (the RANGE frame requires it). */
  def front2(df: DataFrame, minCol: String, maxCol: String,
             buckets: Int = 64): DataFrame = {
    require(buckets >= 1, s"buckets must be >= 1: $buckets")
    val stats = df.agg(min(col(minCol)).as("__lo"), max(col(minCol)).as("__hi"))
    val wB = df.crossJoin(broadcast(stats)) // 1-row side
      .withColumn("__bkt",
        when(col("__hi") === col("__lo"), lit(0)).otherwise(
          least(lit(buckets - 1),
            floor((col(minCol) - col("__lo")).cast("double") /
              ((col("__hi") - col("__lo")).cast("double") / buckets))
              .cast("int"))))
    val bmax = wB.groupBy("__bkt").agg(max(col(maxCol)).as("__bm"))
    // running best over strictly-lower buckets: ≤`buckets` rows, tiny window
    val best = bmax.withColumn("__bestBelow",
      max(col("__bm")).over(Window.orderBy(col("__bkt"))
        .rowsBetween(Window.unboundedPreceding, -1)))
    val surv = wB
      .join(broadcast(best.select(col("__bkt"), col("__bestBelow"))),
        Seq("__bkt"), "left")
      .where(col("__bestBelow").isNull || col(maxCol) >= col("__bestBelow"))
      .select(df.columns.map(col): _*)
    val wLT = Window.orderBy(col(minCol))
      .rangeBetween(Window.unboundedPreceding, -1)
    val wEQ = Window.partitionBy(col(minCol))
    surv
      .withColumn("__maxLT", max(col(maxCol)).over(wLT))
      .withColumn("__maxEQ", max(col(maxCol)).over(wEQ))
      .where((col("__maxLT").isNull || col("__maxLT") < col(maxCol)) &&
        col("__maxEQ") <= col(maxCol))
      .select(df.columns.map(col): _*)
  }
}
