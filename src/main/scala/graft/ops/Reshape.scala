package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StringType}

/** Reshaping: pivot / one-hot / list-cell explode (SURVEY.md §2.6 R1–R4).
  *
  * These are the reference's signature ops: `pivot` long→wide views over the
  * O*NET tables (etl_io.py:823-825, :870-871) and the `literal_eval` explode
  * of list-valued crosswalk cells (etl_io.py:924-934).
  *
  * Scale notes: all pivots here take an EXPLICIT value list — without one,
  * Spark runs an extra distinct job over the data to discover columns, and
  * the output schema becomes data-dependent (a 100 TB anti-pattern). The
  * explode is a single generator expression, not a driver loop.
  */
object Reshape {

  /** R1: long→wide pivot with a deterministic aggregate.
    *
    * pandas `pivot` *raises* on duplicate (index, column) pairs while Spark's
    * pivot just aggregates; we default to `max` (deterministic under
    * parallelism, unlike `first`). Use [[assertNoDuplicatePairs]] for the
    * strict pandas contract. */
  def pivotWide(df: DataFrame, index: Seq[String], pivotCol: String,
                values: Seq[String], valueCol: String): DataFrame =
    df.groupBy(index.map(col): _*)
      .pivot(pivotCol, values)
      .agg(max(col(valueCol)))

  /** R1 guard for pandas-pivot parity: fails fast if any (index, pivot) pair
    * occurs more than once (SURVEY §7.4 decision 2). */
  def assertNoDuplicatePairs(df: DataFrame, index: Seq[String], pivotCol: String): Unit = {
    val dups = df.groupBy((index :+ pivotCol).map(col): _*)
      .count().where(col("count") > 1).limit(1).count()
    require(dups == 0L,
      s"duplicate (${index.mkString(",")}, $pivotCol) pairs: pandas pivot would raise")
  }

  /** Backtick-quoted reference to a generated pivot column: dots must read
    * literally (not as field paths) and embedded backticks must be doubled
    * or the attribute parser rejects the name. */
  private def pivotRef(v: String) = col(s"`${v.replace("`", "``")}`")

  /** Long→wide pivot counting occurrences per cell; absent cells are 0.
    * Generated columns are referenced with backticks so pivot values
    * containing dots (e.g. O*NET Element IDs like "1.A.1.a") are treated
    * literally, not as nested-field paths. */
  def pivotCount(df: DataFrame, index: Seq[String], pivotCol: String,
                 values: Seq[String]): DataFrame = {
    val counted = df.groupBy(index.map(col): _*)
      .pivot(pivotCol, values)
      .agg(count(lit(1)))
    values.foldLeft(counted)((d, v) =>
      d.withColumn(v, coalesce(pivotRef(v), lit(0L))))
  }

  /** R2: one-hot membership pivot — `bool=True` column, pivot, fillna(False)
    * (etl_io.py:870-871). Absent cells are false. */
  def oneHot(df: DataFrame, index: Seq[String], pivotCol: String,
             values: Seq[String]): DataFrame = {
    val counted = pivotCount(df, index, pivotCol, values)
    values.foldLeft(counted)((d, v) => d.withColumn(v, pivotRef(v) > 0))
  }

  /** R3: explode a Python-repr list cell ("['11.0101', '11.02']") into one
    * row per element (etl_io.py:924-934).
    *
    * The reference does this with a per-row `ast.literal_eval` loop on the
    * driver; here the cell is normalized to JSON (single→double quotes) and
    * parsed with `from_json` + `explode` — a codegen'd generator that runs
    * where the data lives. Elements containing quote characters are out of
    * scope (the reference's `literal_eval` call would accept them; the
    * crosswalk domain — dotted numeric codes — never produces them).
    * A NULL or unparseable cell FAILS LOUDLY (raise_error), matching the
    * reference's literal_eval exception — a plain `explode(from_json(...))`
    * would silently drop the whole row instead. */
  def explodePyList(df: DataFrame, listCol: String): DataFrame = {
    val parsed =
      from_json(regexp_replace(col(listCol), "'", "\""), ArrayType(StringType))
    df.withColumn(listCol, explode(
      when(parsed.isNull, raise_error(concat(
          lit(s"explodePyList: unparseable list cell in '$listCol': "),
          coalesce(col(listCol), lit("NULL")))))
        .otherwise(parsed)))
  }

  /** R4: long passthrough projection (etl_io.py:820-821). */
  def longView(df: DataFrame, cols: Seq[String]): DataFrame =
    df.select(cols.map(col): _*)

  /** Unpivot (wide→long), the inverse of R1 — built on Spark's native
    * `unpivot`/melt. Extension op for round-trip tests. */
  def meltView(df: DataFrame, ids: Seq[String], valueCols: Seq[String],
               varName: String, valName: String): DataFrame =
    df.unpivot(ids.map(col).toArray, valueCols.map(col).toArray, varName, valName)
}
