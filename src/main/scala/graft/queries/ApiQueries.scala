package graft.queries

import org.apache.spark.sql.functions._
import graft.api.{GeoFilter, Ipeds, Onet, OnetCols, Rosetta}
import graft.io.Tables
import CoreQueries.sqlDsum

/** Registry entries for the composite canned queries Q1–Q8
  * (SURVEY.md §2.8) instantiated on the star-schema corpus per FIXTURES.md:
  * customer⋈nation⋈region ≙ geography dim, lineitem⋈orders ≙ awards facts,
  * events ≙ the O*NET long table (scale discriminator derived from
  * event_id parity), nation ≙ the rosetta crosswalk.
  */
object ApiQueries {

  /** SQL fragment: the awardFacts base (lineitem⋈orders + constructed,
    * zero-padded dotted code; see [[graft.api.Ipeds.awardFacts]]). */
  private val factsSql =
    """SELECT o_custkey AS unit_id,
      |  lpad(l_returnflag, 2, '0') || '.' || CAST(l_linenumber AS VARCHAR) AS cipcode,
      |  l_quantity, l_extendedprice, l_discount
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE l_linestatus = 'F'""".stripMargin

  private def unitsSql(where: String, extraCols: String = ""): String =
    s"""SELECT c_custkey$extraCols
       |FROM customer
       |JOIN nation ON c_nationkey = n_nationkey
       |JOIN region ON n_regionkey = r_regionkey
       |WHERE $where""".stripMargin

  /** events with the derived IM/LV scale discriminator (Q6/Q7 fixture). */
  private def onetEvents(t: Tables) =
    t.events.withColumn("scale",
      when(col("event_id") % 2 === 0, lit("IM")).otherwise(lit("LV")))

  private val onetCols = OnetCols("user_id", "event_type", "scale", "value")
  private val eventTypes = CoreQueries.eventTypes

  val all: Seq[Reg] = Seq(

    // Q1 get_unitid analog: geography-filtered units + label column.
    Reg("q1_unitids", Some(
      """SELECT c_custkey AS unit_id, n_name || ', ' || r_name AS nation_label
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name IN ('ASIA','EUROPE')""".stripMargin))(
      (s, dir) => Ipeds.getUnitIds(Tables(s, dir),
        GeoFilter(regionNames = Seq("ASIA", "EUROPE")),
        keepGeography = Some("nation_label"))),

    // Q2 school_query analog: geography semi-join + UNPADDED caller codes
    // (normalization to '0A.1'/'0R.2' must happen inside the query).
    Reg("q2_schoolquery", Some(
      s"""SELECT unit_id, cipcode, l_quantity, l_extendedprice, l_discount
         |FROM ($factsSql
         |  AND o_custkey IN (${unitsSql("c_mktsegment IN ('BUILDING','AUTOMOBILE')")}))
         |WHERE cipcode IN ('0A.1','0R.2')""".stripMargin))(
      (s, dir) => Ipeds.schoolQuery(Tables(s, dir),
        GeoFilter(mktSegments = Seq("BUILDING", "AUTOMOBILE")),
        codes = Seq("A.1", "R.2"))),

    // Q3 awards analog, detail measures + cipname labels (kept ALONGSIDE the
    // raw code, as the reference adds CIPNAME, etl_io.py:464-465).
    Reg("q3_awards", Some(
      s"""SELECT cipcode,
         |  ${sqlDsum("l_quantity")} AS sum_qty,
         |  ${sqlDsum("l_extendedprice")} AS sum_price,
         |  CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT) *
         |           CAST(FLOOR((1 - l_discount) * 100 + 0.5) AS BIGINT))
         |       AS DOUBLE) / 10000.0 AS sum_revenue,
         |  CASE cipcode WHEN '0A.1' THEN 'Alpha One'
         |               WHEN '0N.3' THEN 'November Three'
         |               ELSE cipcode END AS cipname
         |FROM ($factsSql
         |  AND o_custkey IN (${unitsSql("r_name IN ('ASIA','EUROPE')")}))
         |GROUP BY cipcode""".stripMargin))(
      (s, dir) => Ipeds.awards(Tables(s, dir),
        GeoFilter(regionNames = Seq("ASIA", "EUROPE")), how = "detail",
        labels = Map("0A.1" -> "Alpha One", "0N.3" -> "November Three"))),

    // Q3 with a kept geography column + post-aggregation level filter
    // (the filter is on the grouping key, so Catalyst pushes it down).
    Reg("q3_awards_geo", Some(
      s"""SELECT cipcode, region_name, ${sqlDsum("l_quantity")} AS sum_qty
         |FROM (
         |  SELECT f.cipcode, u.region_name, f.l_quantity
         |  FROM ($factsSql) f
         |  JOIN (${unitsSql("r_name IN ('ASIA','EUROPE','AMERICA')", ", r_name AS region_name")}) u
         |    ON f.unit_id = u.c_custkey
         |  WHERE length(f.cipcode) = 4
         |) GROUP BY cipcode, region_name""".stripMargin))(
      (s, dir) => Ipeds.awards(Tables(s, dir),
        GeoFilter(regionNames = Seq("ASIA", "EUROPE", "AMERICA")), how = "total",
        level = Some(4), geographyCol = Some("region_name"))),

    // Q4 programs analog: per-code row counts (etl_io.py:537).
    Reg("q4_programs", Some(
      s"""SELECT cipcode, COUNT(unit_id) AS prog_count
         |FROM ($factsSql
         |  AND o_custkey IN (${unitsSql("c_mktsegment IN ('FURNITURE','BUILDING')")}))
         |GROUP BY cipcode""".stripMargin))(
      (s, dir) => Ipeds.programs(Tables(s, dir),
        GeoFilter(mktSegments = Seq("FURNITURE", "BUILDING")))),

    // Q5 faithful variant: counts FACT ROWS per geography (the reference's
    // dead cip_level quirk, etl_io.py:558-605).
    Reg("q5_schools_raw", Some(
      s"""SELECT nation_name, COUNT(*) AS school_count
         |FROM (
         |  SELECT u.nation_name
         |  FROM ($factsSql) f
         |  JOIN (${unitsSql("r_name IN ('AFRICA','AMERICA')", ", n_name AS nation_name")}) u
         |    ON f.unit_id = u.c_custkey
         |) GROUP BY nation_name""".stripMargin))(
      (s, dir) => Ipeds.schoolsRaw(Tables(s, dir),
        GeoFilter(regionNames = Seq("AFRICA", "AMERICA")), "nation_name")),

    // Q5 scalar variant: the reference returns a bare int when no geography
    // grouping is requested (etl_io.py:599) — surfaced as a 1-row frame so
    // the scalar path is oracle-checked too.
    Reg("schools_count", Some(
      s"""SELECT COUNT(*) AS n_schools
         |FROM ($factsSql
         |  AND o_custkey IN (${unitsSql("r_name IN ('ASIA','AFRICA')")}))"""
        .stripMargin))(
      (s, dir) => {
        import s.implicits._
        Seq(Ipeds.schoolsCount(Tables(s, dir),
          GeoFilter(regionNames = Seq("ASIA", "AFRICA")))).toDF("n_schools")
      }),

    // Q5 corrected variant: distinct units per geography.
    Reg("q5_schools_distinct", Some(
      s"""SELECT nation_name, COUNT(DISTINCT unit_id) AS school_count
         |FROM (
         |  SELECT f.unit_id, u.nation_name
         |  FROM ($factsSql) f
         |  JOIN (${unitsSql("r_name IN ('AFRICA','AMERICA')", ", n_name AS nation_name")}) u
         |    ON f.unit_id = u.c_custkey
         |) GROUP BY nation_name""".stripMargin))(
      (s, dir) => Ipeds.schoolsDistinct(Tables(s, dir),
        GeoFilter(regionNames = Seq("AFRICA", "AMERICA")), "nation_name")),

    // Q6 quant_view long form: one scale's normalized projection.
    Reg("q6_quant_long", Some(
      """SELECT user_id, event_type, 'IM' AS scale, value
        |FROM events WHERE event_id % 2 = 0""".stripMargin))(
      (s, dir) => Onet.quantLong(onetEvents(Tables(s, dir)), onetCols, Nil, "IM")),

    // Q6 wide form: pivot elements to columns, max-aggregated.
    Reg("q6_quant_wide", Some(
      s"""SELECT user_id,
         |${eventTypes.map(t => s"  max(CASE WHEN event_type = '$t' THEN value END) AS $t").mkString(",\n")}
         |FROM events WHERE event_id % 2 = 0 GROUP BY user_id""".stripMargin))(
      (s, dir) => Onet.quantWide(onetEvents(Tables(s, dir)), onetCols, Nil, "IM", eventTypes)),

    // Q6 product-combined form (A3 over both scales, etl_io.py:816-818).
    // Factors normalized to [1, 1.5); groups ≤24 rows → round(6) absorbs
    // float product order-dependence.
    Reg("q6_quant_product", Some(
      """SELECT user_id, event_type,
        |  ROUND(PRODUCT(1 + value / 1000), 6) AS combined_value
        |FROM events GROUP BY user_id, event_type""".stripMargin))(
      (s, dir) => Onet.quantProduct(onetEvents(Tables(s, dir)), onetCols, Nil,
        combine = v => lit(1) + v / 1000, roundTo = 6)),

    // Q7 qual_view one-hot form through the O*NET API.
    Reg("q7_qual_onehot", Some(
      s"""SELECT user_id,
         |${eventTypes.map(t => s"  count(CASE WHEN event_type = '$t' THEN 1 END) > 0 AS $t").mkString(",\n")}
         |FROM events GROUP BY user_id""".stripMargin))(
      (s, dir) => Onet.qualOneHot(onetEvents(Tables(s, dir)), onetCols, Nil, eventTypes)),

    // Q8 translate: crosswalk join + bridge join (etl_io.py:898-941);
    // nation plays the crosswalk (nationkey ↔ regionkey).
    Reg("q8_translate", Some(
      """SELECT c_custkey, n_regionkey, r_name
        |FROM customer
        |JOIN (SELECT DISTINCT n_nationkey, n_regionkey FROM nation) n
        |  ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey""".stripMargin))(
      (s, dir) => {
        val t = Tables(s, dir)
        Rosetta.translate(
          data = t.customer.withColumnRenamed("c_nationkey", "n_nationkey"),
          stone = t.nation,
          left = "n_nationkey", right = "n_regionkey",
          data2 = Some(t.region.withColumnRenamed("r_regionkey", "n_regionkey")))
          .select("c_custkey", "n_regionkey", "r_name")
      }),

    // Q8 parameterized join type (J2's caller-chosen `how`, etl_io.py:898):
    // left join through a PARTIAL crosswalk — unmapped rows survive with a
    // NULL code, which the reference's how='left' path also produces.
    Reg("q8_translate_left", Some(
      """SELECT c_custkey, n_regionkey
        |FROM customer LEFT JOIN (
        |  SELECT DISTINCT n_nationkey, n_regionkey FROM nation
        |  WHERE n_regionkey <> 0) n
        |ON c_nationkey = n_nationkey""".stripMargin))(
      (s, dir) => {
        val t = Tables(s, dir)
        Rosetta.translate(
          data = t.customer.withColumnRenamed("c_nationkey", "n_nationkey")
            .select("c_custkey", "n_nationkey"),
          stone = t.nation.where(col("n_regionkey") =!= 0),
          left = "n_nationkey", right = "n_regionkey", how = "left")
          .select("c_custkey", "n_regionkey")
      }),

    // Q8 with a list-valued crosswalk side: the python-repr cell is exploded
    // distributedly (R3); the oracle replays the expansion as UNION ALL.
    Reg("q8_translate_explode", Some(
      """SELECT c_custkey, r_name AS tags
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |UNION ALL
        |SELECT c_custkey, 'ALL' AS tags FROM customer""".stripMargin))(
      (s, dir) => {
        val t = Tables(s, dir)
        val stone = t.nation
          .join(broadcast(t.region), col("n_regionkey") === col("r_regionkey"))
          .select(col("n_nationkey"),
            concat(lit("['"), col("r_name"), lit("', 'ALL']")).as("tags"))
        Rosetta.translate(
          data = t.customer.withColumnRenamed("c_nationkey", "n_nationkey"),
          stone = stone,
          left = "n_nationkey", right = "tags",
          listCols = Set("tags"))
          .select("c_custkey", "tags")
      })
  )
}
