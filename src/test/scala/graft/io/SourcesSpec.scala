package graft.io

import java.nio.file.Files
import graft.SparkSpec

class SourcesSpec extends SparkSpec {

  test("tsv scan reads tab-separated files with header + schema inference (S4)") {
    val f = Files.createTempDirectory("src").resolve("onet.tsv")
    Files.writeString(f,
      "O*NET-SOC Code\tElement Name\tData Value\n11-1011.00\tLeadership\t4.25\n")
    val df = Sources.tsv(spark, f.toString)
    assert(df.columns.toSeq == Seq("O*NET-SOC Code", "Element Name", "Data Value"))
    val r = df.collect().head
    assert(r.getString(0) == "11-1011.00" && r.getDouble(2) == 4.25)
  }

  test("csv scan reads comma-separated files (S5)") {
    val f = Files.createTempDirectory("src").resolve("stone.csv")
    Files.writeString(f, "soc,cip_2020\n11-1011,\"['11.0101', '11.02']\"\n")
    val df = Sources.csv(spark, f.toString)
    assert(df.count() == 1)
    assert(df.collect().head.getString(1) == "['11.0101', '11.02']")
  }

  test("JDBC sink + scan round-trip via embedded Derby (S1/S8)") {
    val db = Files.createTempDirectory("derby").resolve("testdb")
    val url = s"jdbc:derby:$db;create=true"
    import spark.implicits._
    val df = Seq((1L, "a", 1.5), (2L, "b", 2.5)).toDF("id", "k", "v")
    Sinks.jdbc(df, url, "t1", numPartitions = 1)
    // Spark's JDBC writer quotes column identifiers (case-sensitive
    // lowercase in Derby) — the read query must quote them too
    val back = Sources.jdbc(spark, url, "SELECT \"id\", \"k\", \"v\" FROM t1")
    assert(back.orderBy("id").collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      .toSeq == Seq((1L, "a", 1.5), (2L, "b", 2.5)))
  }

  test("registerViews memoizes per dir and re-registers on dir switch (S2)") {
    val a = Sources.registerViews(spark, "/root/testdata/sf0.001")
    val small = spark.table("lineitem").count()
    assert(Sources.registerViews(spark, "/root/testdata/sf0.001") == a) // cached
    Sources.registerViews(spark, "/root/testdata/sf0.01")
    val big = spark.table("lineitem").count()
    assert(big > small, s"dir switch did not re-point the views ($small vs $big)")
    Sources.registerViews(spark, "/root/testdata/sf0.001") // restore for peers
  }

  test("xlsx reader handles pretty-printed XML, sparse cells and short rows") {
    import org.apache.spark.sql.types._
    // a workbook graft did NOT write: indented (whitespace text nodes
    // between cells), row 2 omits column B entirely (sparse — position
    // comes from the r attribute), row 3 is short (trailing cells absent)
    val sheet =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
        |  <sheetData>
        |    <row r="1">
        |      <c r="A1" t="inlineStr"><is><t>id</t></is></c>
        |      <c r="B1" t="inlineStr"><is><t>label</t></is></c>
        |      <c r="C1" t="inlineStr"><is><t>score</t></is></c>
        |    </row>
        |    <row r="2">
        |      <c r="A2" t="n"><v>1</v></c>
        |      <c r="B2" t="inlineStr"><is><t>alpha</t></is></c>
        |      <c r="C2" t="n"><v>1.5</v></c>
        |    </row>
        |    <row r="3">
        |      <c r="A3" t="n"><v>2</v></c>
        |      <c r="C3" t="n"><v>2.5</v></c>
        |    </row>
        |    <row r="4">
        |      <c r="A4" t="n"><v>3</v></c>
        |    </row>
        |  </sheetData>
        |</worksheet>
        |""".stripMargin
    val path = Files.createTempDirectory("xlsx_read").resolve("ext.xlsx")
    val out = new java.util.zip.ZipOutputStream(Files.newOutputStream(path))
    out.putNextEntry(new java.util.zip.ZipEntry("xl/worksheets/sheet1.xml"))
    out.write(sheet.getBytes("UTF-8")); out.closeEntry(); out.close()
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("label", StringType), StructField("score", DoubleType)))
    val got = Sources.xlsx(spark, path.toString, schema)
      .orderBy("id").collect()
      .map(r => (r.get(0), r.get(1), r.get(2))).toSeq
    assert(got == Seq((1L, "alpha", 1.5), (2L, null, 2.5), (3L, null, null)),
      s"got $got")
  }

  test("Catalog.flatMap builds a code->label driver map (A5/varnames analog)") {
    import spark.implicits._
    val df = Seq(("c1", "Label One"), ("c2", "Label Two"), (null, "skip"))
      .toDF("code", "label")
    assert(Catalog.flatMap(df, "code", "label") ==
      Map("c1" -> "Label One", "c2" -> "Label Two"))
  }

  test("Catalog.listTables probes via Hadoop FS (S3)") {
    val found = Catalog.listTables(spark, "/root/testdata/sf0.001")
    assert(found.contains("lineitem") && found.contains("documents"))
  }

  test("ts normalization: nanos-long, NTZ-micros and TIMESTAMP encodings all read identically") {
    import org.apache.spark.sql.functions.{col, date_trunc}
    import org.apache.spark.sql.types.TimestampType
    import graft.functions.Time.{tsMicros, tsSeconds}
    // the corpus regenerated mid-round-6 from TIMESTAMP(NANOS) to
    // TIMESTAMP_NTZ(micros) and silently broke every hardcoded assumption;
    // this pins that all three encodings of the same instants produce the
    // same canonical TIMESTAMP and the same micros/seconds arithmetic
    val micros = Seq(1704067200000000L, 1704067201500000L, 1706745599999999L)
    val base = Files.createTempDirectory("tsenc")
    import spark.implicits._

    // (a) legacy nanos: parquet TIMESTAMP(NANOS) reads as LongType under
    // nanosAsLong — writing a raw long column named ts reproduces exactly
    // what the reader hands normalizeTs in that branch
    val nanosDir = base.resolve("nanos")
    micros.map(m => (m * 1000L, "x")).toDF("ts", "k")
      .write.parquet(s"$nanosDir/events.parquet")
    // (b) NTZ micros: what the regenerated corpus ships
    val ntzDir = base.resolve("ntz")
    micros.map(m => (m, "x")).toDF("us", "k")
      .select(org.apache.spark.sql.functions.timestamp_micros(col("us"))
        .cast("timestamp_ntz").as("ts"), col("k"))
      .write.parquet(s"$ntzDir/events.parquet")
    // (c) plain TIMESTAMP (instant-typed)
    val tzDir = base.resolve("tz")
    micros.map(m => (m, "x")).toDF("us", "k")
      .select(org.apache.spark.sql.functions.timestamp_micros(col("us"))
        .as("ts"), col("k"))
      .write.parquet(s"$tzDir/events.parquet")

    val frames = Seq(nanosDir, ntzDir, tzDir)
      .map(d => Sources.table(spark, d.toString, "events"))
    frames.foreach { df =>
      assert(df.schema("ts").dataType == TimestampType)
      val got = df.select(tsMicros(col("ts")).as("us"),
          tsSeconds(col("ts")).as("s"),
          date_trunc("day", col("ts")).cast("string").as("day"))
        .orderBy("us").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
      assert(got == micros.map(m =>
        (m, m / 1000000L,
          java.time.Instant.ofEpochSecond(m / 1000000L / 86400 * 86400)
            .toString.replace("T", " ").replace("Z", ""))))
    }
    // tsMicros/tsSeconds must also accept a RAW NTZ column (a frame that
    // bypassed the source layer) — this is what errored 5 queries in r06
    val rawNtz = spark.read.parquet(s"$ntzDir/events.parquet")
    assert(rawNtz.schema("ts").dataType.typeName == "timestamp_ntz")
    assert(rawNtz.select(tsMicros(col("ts"))).orderBy(col("ts"))
      .collect().map(_.getLong(0)).toSeq == micros)
  }
}
