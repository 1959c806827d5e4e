package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.io.Tables
import graft.ops.Recode._
import graft.ops.Relational._

/** Geography predicate bundle — the analog of the reference's
  * fips / county / zip argument trio (etl_io.py:221-276): 0..3 IN-lists
  * AND-combined. Empty everything selects the world, like the reference. */
final case class GeoFilter(
    regionNames: Seq[String] = Nil,
    nationKeys: Seq[Int] = Nil,
    mktSegments: Seq[String] = Nil) {
  /** True when at least one clause restricts the unit dimension — the only
    * case where broadcasting the filtered units is size-safe at 100 TB. */
  def isRestrictive: Boolean =
    regionNames.nonEmpty || nationKeys.nonEmpty || mktSegments.nonEmpty
}

/** IPEDS-layer composites Q1–Q5 (SURVEY.md §2.8) on the star-schema corpus.
  *
  * Role mapping (FIXTURES.md): customer+nation+region ≙ the HD2019 geography
  * dimension; lineitem⋈orders ≙ the C2019_A awards fact table;
  * `c_custkey`/`o_custkey` ≙ UNITID; a constructed dotted code
  * (l_returnflag + "." + l_linenumber) ≙ CIPCODE; l_linestatus='F' ≙ the
  * MAJORNUM=1 restriction.
  *
  * Scale posture: the dimension side (customer⋈nation⋈region) is small
  * relative to facts → broadcast; fact restriction by geography is a
  * left-semi join (no collected key lists, etl_io.py:354-357 replaced);
  * measures aggregate with map-side partials; all sums are exact decimals
  * (see [[graft.ops.Relational.dsum]]).
  */
object Ipeds {

  /** F5 analog: `how` → measure-column set (etl_io.py:359-370). Each entry
    * is (output name, aggregate over the fact columns). */
  def measureSet(how: String): Seq[(String, Column)] = how match {
    case "total" => Seq("sum_qty" -> dsum(col("l_quantity")))
    case "detail" => Seq(
      "sum_qty"     -> dsum(col("l_quantity")),
      "sum_price"   -> dsum(col("l_extendedprice")),
      "sum_revenue" -> dsumProd2(col("l_extendedprice"), lit(1) - col("l_discount")))
    case other => throw new IllegalArgumentException(
      s"how must be total|detail, got '$other'")
  }

  /** Shared enriched-unit frame: customer ⋈ nation ⋈ region (dims
    * broadcast — tiny at any scale factor), source columns retained plus
    * the derived geography names. ONE implementation of the dim join so
    * [[geography]] and [[getUnitIds]] cannot drift. */
  private def unitGeo(t: Tables): DataFrame =
    t.customer
      .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t.region), col("n_regionkey") === col("r_regionkey"))
      .withColumn("region_name", col("r_name"))
      .withColumn("nation_name", col("n_name"))
      .withColumn("mktsegment", col("c_mktsegment"))
      .withColumn("nation_label", label2(col("n_name"), col("r_name")))

  /** The geography dimension: one row per unit (customer) with its nation /
    * region attributes. */
  def geography(t: Tables): DataFrame =
    unitGeo(t).select(
      col("c_custkey").as("unit_id"),
      col("c_name").as("unit_name"),
      col("mktsegment"), col("nation_name"), col("region_name"))

  /** Q1 `get_unitid` analog (etl_io.py:221-276): units matching a geography
    * filter; optionally keeps one geography column, with the county-label
    * concat quirk (F4: "COUNTYNM, STABBR" ≙ "nation, REGION"). */
  def getUnitIds(t: Tables, geo: GeoFilter, keepGeography: Option[String] = None): DataFrame = {
    val preds = Seq(
      Option(geo.regionNames).filter(_.nonEmpty).map(v => inList(col("region_name"), v)),
      Option(geo.nationKeys).filter(_.nonEmpty).map(v => inList(col("n_nationkey"), v)),
      Option(geo.mktSegments).filter(_.nonEmpty).map(v => inList(col("mktsegment"), v))
    ).flatten
    val g = unitGeo(t).where(conj(preds))
    keepGeography match {
      case Some(c) => g.select(col("c_custkey").as("unit_id"), col(c))
      case None    => g.select(col("c_custkey").as("unit_id"))
    }
  }

  /** The awards fact table: lineitem enriched with its unit (customer) key.
    * Big⋈big on the order key → sort-merge / AQE's choice; the constructed
    * `cipcode` is the CIPCODE analog, zero-pad-normalized (F3). */
  def awardFacts(t: Tables): DataFrame =
    t.lineitem
      .join(t.orders.select(col("o_orderkey"), col("o_custkey").as("unit_id")),
        col("l_orderkey") === col("o_orderkey"))
      .withColumn("cipcode",
        zeroPadCode(concat_ws(".", col("l_returnflag"), col("l_linenumber"))))

  /** Q2 `school_query` analog (etl_io.py:278-388): geography-restricted
    * fact rows with code + measure columns (+ optional geography column).
    * The reference's collected UNITID IN-list becomes a left-semi join. */
  def schoolQuery(t: Tables, geo: GeoFilter, codes: Seq[String] = Nil,
                  geographyCol: Option[String] = None,
                  failIfNoUnits: Boolean = false): DataFrame = {
    val units = getUnitIds(t, geo, geographyCol)
    // P8 empty-result guard (etl_io.py:343): the reference bails out when the
    // geography selects no units. Opt-in because it costs an eager action on
    // the (small, filtered) dimension — never on the fact table.
    if (failIfNoUnits && units.isEmpty)
      throw new IllegalArgumentException(
        s"geography filter $geo selects no units (reference: etl_io.py:343)")
    val facts = awardFacts(t).where(col("l_linestatus") === "F")
    val restricted = geographyCol match {
      case Some(c) =>
        // keep the geography attribute: J1 enrichment join. Broadcast only
        // when the filter actually restricts the dimension — an unfiltered
        // unit dimension is customer-sized and would OOM the driver at
        // scale; unhinted, AQE picks broadcast vs shuffle from real sizes.
        val dim = if (geo.isRestrictive) broadcast(units) else units
        facts.join(dim, Seq("unit_id"))
      case None =>
        semiJoin(facts, units, "unit_id")
    }
    // Normalize caller codes with the same zero-pad rule applied to the data
    // column, mirroring the reference's pad-before-isin (etl_io.py:374-381) —
    // unpadded inputs would otherwise silently select nothing.
    val normCodes = codes.map(c => zeroPadCodeStr(c))
    val coded =
      if (normCodes.nonEmpty) restricted.where(inList(col("cipcode"), normCodes))
      else restricted
    coded.select(Seq("unit_id", "cipcode", "l_quantity", "l_extendedprice", "l_discount")
      .map(col) ++ geographyCol.map(col).toSeq: _*)
  }

  /** Q3 `awards` analog (etl_io.py:390-479): Q2 → drop unit → group by code
    * (and optional geography) → exact sums → optional label recode.
    * `level` filters by code length AFTER aggregation, like the reference's
    * post-group CIPCODE length masks (P6, etl_io.py:468-476). */
  def awards(t: Tables, geo: GeoFilter, how: String = "total",
             level: Option[Int] = None, geographyCol: Option[String] = None,
             codes: Seq[String] = Nil,
             labels: Map[String, String] = Map.empty): DataFrame = {
    val base = schoolQuery(t, geo, codes, geographyCol).drop("unit_id") // P2: drop before grouping
    val keys = "cipcode" +: geographyCol.toSeq
    val measures = measureSet(how)
    val grouped = base.groupBy(keys.map(col): _*)
      .agg(measures.head._2.as(measures.head._1),
        measures.tail.map { case (n, c) => c.as(n) }: _*)
    val leveled = level match {
      case Some(len) => grouped.where(length(col("cipcode")) === len)
      case None      => grouped
    }
    // The reference ADDS a CIPNAME label column and keeps the raw CIPCODE
    // (etl_io.py:464-465) — emit `cipname` alongside, not in place.
    if (labels.nonEmpty) leveled.withColumn("cipname", recode(col("cipcode"), labels))
    else leveled
  }

  /** Q4 `programs` analog (etl_io.py:481-556): per-code row counts
    * (the reference counts UNITID rows per CIPCODE → PROG_COUNT). */
  def programs(t: Tables, geo: GeoFilter, geographyCol: Option[String] = None,
               codes: Seq[String] = Nil): DataFrame = {
    val keys = "cipcode" +: geographyCol.toSeq
    schoolQuery(t, geo, codes, geographyCol)
      .groupBy(keys.map(col): _*)
      .agg(count(col("unit_id")).as("prog_count"))
  }

  /** Q5 `schools` analog, faithful variant: counts FACT ROWS per geography,
    * reproducing the reference's quirk where `cip_level` is dead and the
    * count is over award rows, not distinct schools (etl_io.py:558-605;
    * SURVEY §7.4 decision 3). */
  def schoolsRaw(t: Tables, geo: GeoFilter, geographyCol: String): DataFrame =
    schoolQuery(t, geo, Nil, Some(geographyCol))
      .groupBy(col(geographyCol))
      .agg(count(col("unit_id")).as("school_count"))

  /** Q5 scalar variant: the reference returns a bare `int` when no
    * geography grouping is requested (etl_io.py:599) — row count over the
    * restricted facts. */
  def schoolsCount(t: Tables, geo: GeoFilter): Long =
    schoolQuery(t, geo, Nil, None).count()

  /** Q5 corrected variant: distinct units per geography. */
  def schoolsDistinct(t: Tables, geo: GeoFilter, geographyCol: String): DataFrame =
    schoolQuery(t, geo, Nil, Some(geographyCol))
      .groupBy(col(geographyCol))
      .agg(countDistinct(col("unit_id")).as("school_count"))
}
