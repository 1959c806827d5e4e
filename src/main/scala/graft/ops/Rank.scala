package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global ranking — the primitive behind any "position in the
  * total order" operator (sorted-neighborhood dedup, surrogate-key
  * assignment, systematic sampling). The naive form is one global ORDER BY
  * window: a single-partition pass over the corpus, dead at 100 TB. This is
  * the same two-level prefix sum as [[graft.ext.Packing]], generalized to
  * an arbitrary sort key:
  *
  *   1. bucket rows by an order-preserving coarsening of the key (a key
  *      PREFIX buckets correctly for strings: every key in bucket `p` sorts
  *      before every key in any bucket `q > p`);
  *   2. per-bucket row counts → tiny frame; the single-partition running
  *      sum touches #buckets rows, not #rows;
  *   3. broadcast the offsets back; a per-bucket window adds the local
  *      rank. Buckets rank in parallel — the per-bucket window is the
  *      granularity knob (widen the prefix when a bucket outgrows an
  *      executor's sort budget).
  */
object Rank {

  /** Append 1-based `rankCol` ranking by (`key`, `tiebreak`) ascending.
    * `bucket` MUST be an order-preserving coarsening of `key` (same bucket
    * expression ⇒ contiguous rank range); (`key`, `tiebreak`) MUST be
    * unique or ranks within a tie become partition-order-dependent. */
  def globalRank(df: DataFrame, key: Column, tiebreak: Column,
                 bucket: Column, rankCol: String = "rank"): DataFrame = {
    val d = df.withColumn("__gb", bucket)
    val wB = Window.orderBy("__gb")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = d.groupBy("__gb").agg(count(lit(1)).as("__bn"))
      .withColumn("__boff", coalesce(sum("__bn").over(wB), lit(0L)))
      .select("__gb", "__boff")
    val wIn = Window.partitionBy("__gb").orderBy(key.asc, tiebreak.asc)
    d.join(broadcast(offsets), Seq("__gb"))
      .withColumn(rankCol, row_number().over(wIn).cast("long") + col("__boff"))
      .drop("__gb", "__boff")
  }

  /** Dimension-building: assign every distinct value of `keyCol` a dense,
    * deterministic surrogate id 1..N in key sort order — the "encode a
    * string dimension to integers" step warehouses run before writing fact
    * tables, and vocabulary building runs before training. Deterministic
    * across runs and partitionings (sort order is the contract), unlike
    * `monotonically_increasing_id`, whose values depend on the partition
    * layout of the moment.
    *
    * Returns (`keyCol`, `id`). `bucketLen` is the prefix granularity of
    * the two-level rank (step-2 frame is one row per distinct prefix). */
  def surrogateIds(df: DataFrame, keyCol: String,
                   bucketLen: Int = 2): DataFrame = {
    val keys = df.select(col(keyCol).cast("string").as(keyCol))
      .where(col(keyCol).isNotNull).distinct()
    globalRank(keys, col(keyCol), lit(1), substring(col(keyCol), 1, bucketLen),
      rankCol = "id")
      .select(col(keyCol), col("id"))
  }
}
