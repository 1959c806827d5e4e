package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators for scan pruning at scale.
  *
  * On a 100 TB table, the cheapest predicate is the one that never reads the
  * data: parquet keeps per-row-group min/max stats, and a reader skips any
  * row group whose stats exclude the filter. Sorting by ONE column makes
  * that work for that column only; interleaving the bits of TWO columns
  * (Z-order / Morton curve) makes row groups rectangular in BOTH dimensions,
  * so 2-D range predicates (the `a BETWEEN .. AND b BETWEEN ..` shape) skip
  * on either column. The reference has no layout control at all (pandas
  * frames are memory-resident, etl_io.py:203-219 copies tables verbatim);
  * this is the Spark-native answer to the same "materialize for later
  * reads" intent.
  */
object Layout {

  /** Morton/Z-value of two non-negative integer columns: the low `bits`
    * bits of `a` and `b` interleaved (a -> even positions, b -> odd).
    * Pure bit arithmetic on longs — codegen-friendly, no UDF. 2×`bits`
    * output bits must fit a long, so `bits` <= 31. */
  def zorder2(a: Column, b: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"zorder2 bits must be in [1,31], got $bits")
    val (al, bl) = (a.cast("long"), b.cast("long"))
    (0 until bits).map { i =>
      val abit = shiftleft(shiftrightunsigned(al, i).bitwiseAND(lit(1L)), 2 * i)
      val bbit = shiftleft(shiftrightunsigned(bl, i).bitwiseAND(lit(1L)), 2 * i + 1)
      abit.bitwiseOR(bbit)
    }.reduce(_ bitwiseOR _)
  }

  /** Write `df` parquet clustered on the Z-value of (`colA`, `colB`):
    * range-partition by z (each output file owns a compact z-interval, i.e.
    * a small rectangle in (a,b) space), sort within partitions so row
    * groups inside a file are compact too. `numFiles` sizes the layout —
    * at corpus scale a handful, at 100 TB thousands (one per ~1 GB). */
  def writeZOrdered(df: DataFrame, path: String, colA: String, colB: String,
                    numFiles: Int = 4, bits: Int = 16): Unit =
    df.withColumn("__z", zorder2(col(colA), col(colB), bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
}
