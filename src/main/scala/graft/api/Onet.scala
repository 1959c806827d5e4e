package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ops.Relational._
import graft.ops.Reshape._

/** Column roles for the O*NET-style long tables: an entity key (SOC code),
  * an attribute name (Element), a scale discriminator (IM/LV) and a value.
  * Generic over column names so a real O*NET TSV drops straight in; the
  * corpus instantiation maps events → (user_id, event_type, derived scale,
  * value) — see [[graft.SparkEntry]]. */
final case class OnetCols(soc: String, element: String, scale: String, value: String)

/** O*NET-layer composites Q6–Q7 (SURVEY.md §2.8; etl_io.py:770-875).
  *
  * `quant_view` (Q6): filter by SOC IN-list, then either (a) restrict to one
  * scale and return long/wide, or (b) combine scales per (soc, element) by
  * PRODUCT — the reference multiplies the IM and LV scale rows
  * (etl_io.py:816-818) — then long/wide.
  * `qual_view` (Q7): long projection or one-hot membership pivot
  * (etl_io.py:870-871).
  *
  * All pivots take explicit value lists (no schema-discovery job; stable
  * output schema at any scale). Aggregates are max/product — deterministic
  * under parallelism, unlike `first`.
  */
object Onet {

  /** Q6 long form: one scale's rows, normalized 4-column projection (R4). */
  def quantLong(df: DataFrame, c: OnetCols, socs: Seq[Any], scale: String): DataFrame =
    df.where(conj(Seq(
        Option(socs).filter(_.nonEmpty).map(v => inList(col(c.soc), v)),
        Some(col(c.scale) === scale)).flatten))
      .select(col(c.soc), col(c.element), col(c.scale), col(c.value))

  /** Q6 wide form: long → pivot elements to columns (R1, max-aggregated). */
  def quantWide(df: DataFrame, c: OnetCols, socs: Seq[Any], scale: String,
                elements: Seq[String]): DataFrame =
    pivotWide(quantLong(df, c, socs, scale), Seq(c.soc), c.element, elements, c.value)

  /** Q6 product-combined form (A3): multiply the scale rows per
    * (soc, element) — `groupby(...).prod()` (etl_io.py:816-818), via the
    * built-in `product` aggregate (partial-aggregation friendly).
    * `combine` maps the raw value into the multiplicand (the reference
    * multiplies raw IM×LV; callers may normalize first). Result rounded to
    * stabilize float product order-dependence across partitionings. */
  def quantProduct(df: DataFrame, c: OnetCols, socs: Seq[Any],
                   combine: Column => Column = identity, roundTo: Int = 6): DataFrame = {
    // same null/empty contract as quantLong: null or empty socs = no filter
    val base = Option(socs).filter(_.nonEmpty)
      .map(v => df.where(inList(col(c.soc), v))).getOrElse(df)
    base.groupBy(col(c.soc), col(c.element))
      .agg(round(product(combine(col(c.value))), roundTo).as("combined_value"))
  }

  /** Q7 long form. */
  def qualLong(df: DataFrame, c: OnetCols, socs: Seq[Any]): DataFrame = {
    val base = Option(socs).filter(_.nonEmpty)
      .map(v => df.where(inList(col(c.soc), v))).getOrElse(df)
    base.select(col(c.soc), col(c.element))
  }

  /** Q7 one-hot form (R2): membership matrix per soc, absent → false. */
  def qualOneHot(df: DataFrame, c: OnetCols, socs: Seq[Any],
                 elements: Seq[String]): DataFrame =
    oneHot(qualLong(df, c, socs), Seq(c.soc), c.element, elements)
}
