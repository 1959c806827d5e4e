package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality expectations — the contract checks an ETL pipeline runs
  * before publishing a load (the reference trusts its sources implicitly;
  * any production deployment of it would need exactly this gate before the
  * full-DB copy at etl_io.py:203-219).
  *
  * Design for scale: every predicate expectation against one table compiles
  * into ONE aggregation pass (conditional sums side by side — a per-check
  * loop would scan the table N times), and the wide single-row result is
  * unpivoted to the uniform (check, n_rows, n_bad, pass) report shape.
  * Referential checks are anti-join counts; uniqueness is count-vs-distinct
  * in the same single pass. Nothing here collects data rows to the driver —
  * the report is O(#checks) however big the table.
  */
object Quality {

  /** Predicate expectations over one table: `checks` maps check name to a
    * VIOLATION predicate (true = bad row). One scan for all of them. */
  def checkPredicates(df: DataFrame, checks: Seq[(String, Column)]): DataFrame = {
    require(checks.nonEmpty, "checkPredicates needs at least one check")
    val aggs = count(lit(1)).as("__n") +:
      checks.zipWithIndex.map { case ((_, bad), i) =>
        sum(when(bad, 1L).otherwise(0L)).as(s"__b$i")
      }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stacked = checks.zipWithIndex.map { case ((name, _), i) =>
      s"'${name.replace("'", "''")}', __b$i"
    }.mkString(", ")
    wide.select(
      expr(s"stack(${checks.size}, $stacked) AS (check, n_bad)"),
      col("__n").as("n_rows"))
      .select(col("check"), col("n_rows"), col("n_bad"),
        (col("n_bad") === 0L).as("pass"))
  }

  /** Uniqueness expectation: `n_bad` = rows in excess of one per distinct
    * key tuple (0 = the columns form a key). */
  def checkUnique(df: DataFrame, name: String, cols: Seq[String]): DataFrame =
    df.agg(count(lit(1)).as("n_rows"),
        countDistinct(cols.head, cols.tail: _*).as("__d"))
      .select(lit(name).as("check"), col("n_rows"),
        (col("n_rows") - col("__d")).as("n_bad"),
        (col("n_rows") === col("__d")).as("pass"))

  /** Referential-integrity expectation: `n_bad` = child rows whose non-null
    * key has no parent (null FKs are a not-null check's business, not RI's).
    * Plans as a left-anti join — broadcast or shuffled as the parent's size
    * dictates, never a driver-side key list. */
  def checkRef(child: DataFrame, parent: DataFrame,
               childKey: String, parentKey: String, name: String): DataFrame = {
    val orphans = child.where(col(childKey).isNotNull)
      .join(parent.select(col(parentKey)), col(childKey) === col(parentKey),
        "left_anti")
    child.agg(count(lit(1)).as("n_rows"))
      .crossJoin(orphans.agg(count(lit(1)).as("n_bad")))
      .select(lit(name).as("check"), col("n_rows"), col("n_bad"),
        (col("n_bad") === 0L).as("pass"))
  }

  /** A full report is the union of per-table passes — schemas are uniform
    * by construction. */
  def report(parts: Seq[DataFrame]): DataFrame =
    parts.reduce(_ unionAll _)
}
