package graft.api

import graft.SparkSpec
import graft.io.Tables

/** End-to-end composite checks against the sf0.001 fixture corpus. */
class IpedsSpec extends SparkSpec {

  private lazy val t = Tables(spark, "/root/testdata/sf0.001")

  test("P8 guard: empty geography fails fast when requested (etl_io.py:343)") {
    intercept[IllegalArgumentException] {
      Ipeds.schoolQuery(t, GeoFilter(regionNames = Seq("NOT A REGION")),
        failIfNoUnits = true)
    }
  }

  test("unpadded caller codes are normalized before the IN-list (etl_io.py:374-381)") {
    val padded = Ipeds.schoolQuery(t, GeoFilter(), codes = Seq("0A.1")).count()
    val unpadded = Ipeds.schoolQuery(t, GeoFilter(), codes = Seq("A.1")).count()
    assert(padded > 0 && padded == unpadded)
  }

  test("awards emits cipname ALONGSIDE the raw cipcode (etl_io.py:464-465)") {
    val out = Ipeds.awards(t, GeoFilter(), labels = Map("0A.1" -> "Alpha One"))
    assert(out.columns.contains("cipcode") && out.columns.contains("cipname"))
    val labeled = out.where(out("cipcode") === "0A.1").select("cipname").collect()
    assert(labeled.head.getString(0) == "Alpha One")
    val unmapped = out.where(out("cipcode") === "0R.1").select("cipname").collect()
    assert(unmapped.head.getString(0) == "0R.1") // passthrough
  }

  test("schools faithful vs corrected variants differ as documented (SURVEY §7.4)") {
    val raw = Ipeds.schoolsRaw(t, GeoFilter(), "nation_name")
    val dist = Ipeds.schoolsDistinct(t, GeoFilter(), "nation_name")
    val rawTotal = raw.agg(org.apache.spark.sql.functions.sum("school_count"))
      .head.getLong(0)
    val distTotal = dist.agg(org.apache.spark.sql.functions.sum("school_count"))
      .head.getLong(0)
    assert(rawTotal > distTotal) // row counts exceed distinct unit counts
  }

  test("schoolsCount returns the bare scalar (reference's ungrouped int, etl_io.py:599)") {
    val n = Ipeds.schoolsCount(t, GeoFilter(regionNames = Seq("ASIA")))
    assert(n > 0)
    assert(n == Ipeds.schoolQuery(t, GeoFilter(regionNames = Seq("ASIA"))).count())
  }

  test("measureSet rejects unknown how") {
    intercept[IllegalArgumentException] { Ipeds.measureSet("race_sex_detail") }
  }
}
