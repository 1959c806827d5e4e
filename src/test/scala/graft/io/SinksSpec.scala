package graft.io

import graft.SparkSpec

class SinksSpec extends SparkSpec {
  import spark.implicits._

  test("parquet sink round-trips data exactly") {
    val df = Seq((1L, "a", 1.5), (2L, "b", 2.5)).toDF("id", "k", "v")
    val path = java.nio.file.Files.createTempDirectory("graft_sinks")
      .resolve("t.parquet").toString
    Sinks.parquet(df, path)
    val back = spark.read.parquet(path)
    assert(back.orderBy("id").collect().sameElements(df.orderBy("id").collect()))
  }

  test("partitioned parquet sink prunes by partition column") {
    val df = Seq((1L, "x", 1.0), (2L, "y", 2.0), (3L, "x", 3.0)).toDF("id", "part", "v")
    val path = java.nio.file.Files.createTempDirectory("graft_sinks")
      .resolve("p.parquet").toString
    Sinks.parquet(df, path, partitionCols = Seq("part"))
    assert(new java.io.File(s"$path/part=x").exists())
    val pruned = spark.read.parquet(path).where($"part" === "x")
    assert(pruned.count() == 2)
  }

  test("copyAll copies every catalog table (sf0.001 → temp)") {
    val dest = java.nio.file.Files.createTempDirectory("graft_copy").toString
    val copied = Sinks.copyAll(spark, "/root/testdata/sf0.001", dest)
    assert(copied.nonEmpty)
    val back = spark.read.parquet(s"$dest/region.parquet")
    assert(back.count() == Sources.table(spark, "/root/testdata/sf0.001", "region").count())
  }

  test("compact collapses many small files into few, content-lossless") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_compact")
    val src = s"$base/src"; val dst = s"$base/dst"
    (1 to 5000).map(i => (i.toLong, s"row $i")).toDF("id", "v")
      .repartition(40).write.parquet(src)
    val (before, after) = Sinks.compact(spark, src, dst,
      targetBytes = 10L * 1024 * 1024)
    assert(before == 40 && after < before && after >= 1)
    val a = spark.read.parquet(src).orderBy("id").collect()
    val b = spark.read.parquet(dst).orderBy("id").collect()
    assert(a.sameElements(b))
  }

  test("overwritePartitions replaces only the touched partition and restores the conf") {
    import org.apache.spark.sql.functions.col
    val path = java.nio.file.Files.createTempDirectory("graft_dynpart")
      .resolve("t.parquet").toString
    val full = Seq((1L, "a", 10.0), (2L, "a", 20.0), (3L, "b", 30.0))
      .toDF("id", "k", "v")
    Sinks.parquet(full, path, partitionCols = Seq("k"))
    val key = "spark.sql.sources.partitionOverwriteMode"
    val before = spark.conf.getOption(key)
    // rewrite partition a with ONE corrected row; b must survive untouched
    Sinks.overwritePartitions(
      Seq((9L, "a", 99.0)).toDF("id", "k", "v"), path, Seq("k"))
    assert(spark.conf.getOption(key) == before, "conf must be restored")
    val back = spark.read.parquet(path)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2)))
      .toSet
    assert(back == Set((9L, 99.0, "a"), (3L, 30.0, "b")),
      s"a replaced (not appended), b untouched: $back")
    assertThrows[IllegalArgumentException](
      Sinks.overwritePartitions(full, path, Nil))
    // conf restored even when the write fails (bad path)
    intercept[Throwable](Sinks.overwritePartitions(
      full.withColumnRenamed("id", "k2"), path, Seq("nope")))
    assert(spark.conf.getOption(key) == before)
  }

  test("xlsx sink writes a valid single-sheet workbook that round-trips values") {
    val df = Seq(
      (1L, "plain", 1.5, true),
      (2L, "escape <&> \"quote\"", -2.0, false),
      (3L, null.asInstanceOf[String], 0.25, true)
    ).toDF("id", "label", "score", "flag")
    val path = java.nio.file.Files.createTempDirectory("graft_xlsx")
      .resolve("report.xlsx").toString
    Sinks.xlsx(df, path, sheet = "report")

    // read back with nothing but the JDK: unzip + DOM-parse the sheet
    val zf = new java.util.zip.ZipFile(path)
    val names = {
      val e = zf.entries(); val b = Seq.newBuilder[String]
      while (e.hasMoreElements) b += e.nextElement().getName
      b.result().toSet
    }
    assert(names == Set("[Content_Types].xml", "_rels/.rels",
      "xl/workbook.xml", "xl/_rels/workbook.xml.rels",
      "xl/worksheets/sheet1.xml"))
    val doc = javax.xml.parsers.DocumentBuilderFactory.newInstance()
      .newDocumentBuilder()
      .parse(zf.getInputStream(zf.getEntry("xl/worksheets/sheet1.xml")))
    zf.close()
    val rows = doc.getElementsByTagName("row")
    assert(rows.getLength == 4) // header + 3 data rows
    def cells(r: Int): Seq[org.w3c.dom.Element] = {
      val cs = rows.item(r).getChildNodes
      (0 until cs.getLength).map(cs.item(_).asInstanceOf[org.w3c.dom.Element])
    }
    assert(cells(0).map(_.getTextContent) ==
      Seq("id", "label", "score", "flag"))
    // typed cells: numbers native, booleans 1/0, strings inline (escaped
    // in the XML, exact after parse), null as an empty cell
    val r1 = cells(1)
    assert(r1(0).getAttribute("t") == "n" && r1(0).getTextContent == "1")
    assert(r1(1).getAttribute("t") == "inlineStr" &&
      r1(1).getTextContent == "plain")
    assert(r1(2).getTextContent == "1.5")
    assert(r1(3).getAttribute("t") == "b" && r1(3).getTextContent == "1")
    assert(cells(2)(1).getTextContent == "escape <&> \"quote\"")
    assert(cells(2)(3).getTextContent == "0")
    assert(!cells(3)(1).hasChildNodes) // null -> <c/>
  }
}
