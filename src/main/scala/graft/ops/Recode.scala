package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalar recode / rename / normalize functions (SURVEY.md §2.7 F1–F4).
  *
  * The reference's `clean()` applies nested dict recodes with `df.replace`
  * and bulk renames (`etl_io.py:149-154`); `school_query` zero-pads CIP
  * codes with a Python format loop (`etl_io.py:374-381`). All of these are
  * pure Catalyst expressions here — codegen'd, pushdown-friendly, no UDFs.
  */
object Recode {

  /** F1: dictionary recode keeping unmapped values (pandas `replace`
    * semantics: values not in the map pass through; NaN/null is untouched).
    * Small bounded maps only — the map travels inside the plan as a literal.
    * For large code books use [[recodeJoin]]. */
  def recode(c: Column, m: Map[String, String]): Column =
    if (m.isEmpty) c else coalesce(element_at(typedlit(m), c), c)

  /** F1 at scale: recode via broadcast join against a code-book DataFrame
    * (code, label). Keeps unmapped codes (left join + coalesce). */
  def recodeJoin(df: DataFrame, dataCol: String, book: DataFrame,
                 codeCol: String, labelCol: String): DataFrame = {
    // the book must be one label per code or the left join would FAN OUT
    // data rows; dedupe deterministically (max label — the same policy
    // Catalog.nestedMap applies) rather than trust the input
    val b = broadcast(book
      .select(col(codeCol).as("__code"), col(labelCol).as("__label"))
      .groupBy("__code").agg(max("__label").as("__label")))
    df.join(b, df(dataCol) === b("__code"), "left")
      .withColumn(dataCol, coalesce(col("__label"), col(dataCol)))
      .drop("__code", "__label")
  }

  /** F1 applied per-column from a nested map {col -> {code -> label}} —
    * the `df.replace(self.metadata)` shape (etl_io.py:151). */
  def recodeAll(df: DataFrame, nested: Map[String, Map[String, String]]): DataFrame =
    nested.foldLeft(df) { case (d, (c, m)) =>
      if (d.columns.contains(c)) d.withColumn(c, recode(col(c), m)) else d
    }

  /** F2: bulk rename from a map (etl_io.py:153). Only columns present are
    * renamed; order of remaining columns is preserved. */
  def renameAll(df: DataFrame, renames: Map[String, String]): DataFrame =
    df.withColumnsRenamed(renames)

  /** F3: zero-pad the integer part of a dotted code: "1.01" -> "01.01",
    * "1" -> "01" (etl_io.py:374-381). Codes without a dot get padded whole.
    * Like Python's `'{:>02d}'.format`, fronts already >= width pass through
    * unchanged (Spark's bare `lpad` would truncate them). */
  def zeroPadCode(c: Column, width: Int = 2): Column = {
    val parts = split(c, "\\.")
    val head = element_at(parts, 1)
    val front = when(length(head) < width, lpad(head, width, "0")).otherwise(head)
    when(size(parts) > 1,
      concat_ws(".", front, array_join(slice(parts, 2, 64), ".")))
      .otherwise(front)
  }

  /** Driver-side mirror of [[zeroPadCode]] for normalizing caller-supplied
    * code lists before building IN-list predicates (the reference zero-pads
    * the caller's cipcode list too, etl_io.py:374-381). */
  def zeroPadCodeStr(s: String, width: Int = 2): String = {
    val parts = s.split("\\.", -1)
    val front =
      if (parts(0).length < width) ("0" * (width - parts(0).length)) + parts(0)
      else parts(0)
    if (parts.length > 1) (front +: parts.tail).mkString(".") else front
  }

  /** F4: "NAME, ST"-style label concat (etl_io.py:273-274). */
  def label2(a: Column, b: Column, sep: String = ", "): Column =
    concat(a, lit(sep), b)
}
