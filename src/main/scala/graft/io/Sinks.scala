package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Sink layer (SURVEY.md §2.1 S8/S9).
  *
  * The reference's `to_db` loops every catalog table into SQLite via
  * `DataFrame.to_sql` (etl_io.py:203-219). Spark-first that's a partitioned
  * `df.write` per table: parquet for the corpus path, JDBC for the
  * database-copy path. Writers are driver-thin — all data movement happens
  * on executors; at 100 TB the partitionBy/bucketing choice below is what
  * keeps downstream reads pruned.
  */
object Sinks {

  /** Write one table as parquet. `partitionCols` become directory partitions
    * (partition pruning for downstream readers); default unpartitioned for
    * small dims. */
  def parquet(df: DataFrame, path: String, partitionCols: Seq[String] = Nil,
              mode: SaveMode = SaveMode.Overwrite): Unit = {
    val w = df.write.mode(mode)
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .parquet(path)
  }

  /** Dynamic partition overwrite — the incremental daily-load sink:
    * replace ONLY the partitions present in `df`, leaving every sibling
    * partition untouched. Spark's default (`static`) overwrite mode drops
    * the WHOLE table root first, so an incremental job carrying one day
    * would silently erase the history — the classic production incident
    * this mode exists to prevent. The conf is set for this write and the
    * session's previous mode restored after (never leaked into other
    * queries sharing the session).
    *
    * At 100 TB this is THE append-corrections pattern: the reload job
    * computes the changed partitions only, and the write's cost is
    * proportional to the changed data, not the table. */
  def overwritePartitions(df: DataFrame, path: String,
                          partitionCols: Seq[String]): Unit = {
    require(partitionCols.nonEmpty,
      "overwritePartitions without partition columns would replace the table")
    val spark = df.sparkSession
    val key = "spark.sql.sources.partitionOverwriteMode"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "dynamic")
    try df.write.mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*).parquet(path)
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  /** S8 analog: copy every catalog table under `srcDir` to `destDir` —
    * the reference's full-DB copy loop (etl_io.py:203-219), one distributed
    * write per table instead of a driver-side row pump.
    *
    * The copy reads through [[Sources.table]], so it NORMALIZES schemas the
    * same way every read path does — in particular a TIMESTAMP(NANOS)
    * `ts` lands in the destination as timestamp(micros) (the engine's
    * canonical type; DuckDB applies the same ns→µs truncation). The copy
    * is canonical-form, not byte-identical — by design. */
  def copyAll(spark: SparkSession, srcDir: String, destDir: String,
              partitionColsFor: String => Seq[String] = _ => Nil): Seq[String] = {
    val tables = Catalog.listTables(spark, srcDir)
    tables.foreach { t =>
      parquet(Sources.table(spark, srcDir, t), s"$destDir/$t.parquet",
        partitionColsFor(t))
    }
    tables
  }

  /** Bucketed table write: pre-shuffles data into `numBuckets` by
    * `bucketCol` at write time so later equi-joins/aggregations on that
    * column run WITHOUT a shuffle (co-located, Exchange-free sort-merge
    * join between tables bucketed the same way). The 100 TB lever for
    * repeatedly-joined fact tables; requires a session catalog
    * (saveAsTable), works with the in-memory catalog + warehouse dir. */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    numBuckets: Int, sortCol: Option[String] = None,
                    path: Option[String] = None): Unit = {
    // an explicit path makes the table EXTERNAL — callers that outlive the
    // in-memory catalog (fresh JVM, same warehouse dir) must use it: a
    // managed location surviving a forgotten catalog entry is unwritable
    // (LOCATION_ALREADY_EXISTS)
    val w0 = df.write.mode(SaveMode.Overwrite).format("parquet")
      .bucketBy(numBuckets, bucketCol)
    val w = path.fold(w0)(p => w0.option("path", p))
    sortCol.fold(w)(c => w.sortBy(c)).saveAsTable(table)
  }

  /** Re-register an EXISTING bucketed layout (files written earlier by
    * [[writeBucketed]] with an explicit path — possibly by another JVM)
    * in this session's catalog WITHOUT rewriting data: `CREATE TABLE …
    * CLUSTERED BY … LOCATION`. This is the metastore-mount step a
    * production cluster gets for free from its persistent catalog;
    * local[*] holds bucket metadata in the in-memory catalog only, and
    * re-WRITING an E-sized edge table once per JVM just to restore that
    * metadata was the dominant first-query cost of the staged graph
    * layouts (measured ~25–40 s inside the first consumer's window at
    * sf10). The DDL must repeat the exact schema and bucket spec the
    * writer used — Spark keys bucketed scans on the files' bucket-id
    * naming plus this metadata. */
  def mountBucketed(spark: org.apache.spark.sql.SparkSession, table: String,
                    schema: org.apache.spark.sql.types.StructType,
                    bucketCol: String, numBuckets: Int,
                    sortCol: Option[String], path: String): Unit = {
    val cols = schema.fields
      .map(f => s"`${f.name}` ${f.dataType.sql}").mkString(", ")
    val sorted = sortCol.fold("")(c => s"SORTED BY (`$c`) ")
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    spark.sql(
      s"""CREATE TABLE `$table` ($cols) USING parquet
         |CLUSTERED BY (`$bucketCol`) ${sorted}INTO $numBuckets BUCKETS
         |LOCATION '$path'""".stripMargin)
    ()
  }

  /** Range-partitioned SORTED parquet write: rows globally ordered on
    * `sortCols` across files (repartitionByRange) and within files
    * (sortWithinPartitions), so every parquet row group carries tight
    * min/max stats on the sort key — downstream range predicates skip
    * whole row groups and whole FILES at the footer level. The layout
    * lever for time-keyed fact tables (Z-order's 1-D special case); costs
    * one range-exchange (sampled bounds) at write time. */
  def parquetSorted(df: DataFrame, path: String, sortCols: Seq[String],
                    mode: SaveMode = SaveMode.Overwrite): Unit = {
    require(sortCols.nonEmpty, "parquetSorted needs at least one sort column")
    val cols = sortCols.map(df.col)
    df.repartitionByRange(cols: _*)
      .sortWithinPartitions(cols: _*)
      .write.mode(mode).parquet(path)
  }

  /** CSV sink — the symmetric twin of [[Sources.csv]] (reads existed since
    * round 1; this closes the write side). Header on by default so the
    * files are self-describing for spreadsheet/pandas consumers; numeric
    * round trips are exact because Spark formats doubles as the shortest
    * decimal that parses back to the same value. Like [[jsonl]], an
    * interchange sink, not a storage one — no column stats, no pruning. */
  def csv(df: DataFrame, path: String, sep: String = ",",
          header: Boolean = true, mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).option("sep", sep).option("header", header.toString)
      .csv(path)

  /** TSV sink — [[csv]] with a tab separator, the format the reference's
    * O*NET corpus ships in (etl_io.py:738-768); symmetric with
    * [[Sources.tsv]]. */
  def tsv(df: DataFrame, path: String, header: Boolean = true,
          mode: SaveMode = SaveMode.Overwrite): Unit =
    csv(df, path, sep = "\t", header = header, mode = mode)

  /** JSON-lines sink — one shard per partition, the hand-off format for
    * downstream tooling that doesn't speak parquet. Text + per-row field
    * names ≈ 3–5× parquet bytes: an interchange sink, not a storage one. */
  def jsonl(df: DataFrame, path: String,
            mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).json(path)

  /** ORC sink — columnar alternative to [[parquet]] for ORC-native
    * consumers (Hive/Trino installs); same partitionBy semantics. */
  def orc(df: DataFrame, path: String, partitionCols: Seq[String] = Nil,
          mode: SaveMode = SaveMode.Overwrite): Unit = {
    val w = df.write.mode(mode)
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .orc(path)
  }

  /** S9: `to_excel` sink — the reference left it a TODO (etl_io.py:947);
    * here it is a real single-sheet .xlsx writer with no dependency beyond
    * the JDK: xlsx is a zip of five XML parts, written through
    * `java.util.zip.ZipOutputStream`.
    *
    * Scale contract: xlsx is a REPORT format — the file format itself caps
    * a sheet at 1,048,576 rows, so this sink is for aggregated outputs
    * (the only thing a spreadsheet consumer can open anyway), never the
    * corpus. Rows STREAM through `toLocalIterator` (one partition
    * materialized on the driver at a time, never the whole frame), the
    * sheet XML streams straight into the zip entry, and the hard cap
    * throws — loudly, not truncating — if the frame exceeds it.
    *
    * Cell mapping: numeric and boolean columns write as native xlsx types;
    * everything else (strings, dates, timestamps) writes as an inline
    * string of Spark's canonical string form — exact, self-describing,
    * and free of the shared-strings table a minimal writer doesn't need.
    * Header row = column names. */
  def xlsx(df: DataFrame, path: String, sheet: String = "Sheet1"): Unit = {
    val maxRows = 1048575 // xlsx row limit minus the header row
    def esc(s: String): String = s.flatMap {
      case '&' => "&amp;"
      case '<' => "&lt;"
      case '>' => "&gt;"
      case '"' => "&quot;"
      case c if c < ' ' && c != '\t' && c != '\n' && c != '\r' => ""
      case c => c.toString
    }
    val schema = df.schema
    val numeric = schema.fields.map(_.dataType match {
      case _: org.apache.spark.sql.types.NumericType => 1
      case org.apache.spark.sql.types.BooleanType => 2
      case _ => 0
    })
    val out = new java.util.zip.ZipOutputStream(
      new java.io.BufferedOutputStream(
        java.nio.file.Files.newOutputStream(java.nio.file.Paths.get(path))))
    def entry(name: String, body: String): Unit = {
      out.putNextEntry(new java.util.zip.ZipEntry(name))
      out.write(body.getBytes("UTF-8"))
      out.closeEntry()
    }
    try {
      entry("[Content_Types].xml",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
          |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
          |<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
          |<Default Extension="xml" ContentType="application/xml"/>
          |<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
          |<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
          |</Types>""".stripMargin)
      entry("_rels/.rels",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
          |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
          |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
          |</Relationships>""".stripMargin)
      entry("xl/workbook.xml",
        s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
           |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
           |<sheets><sheet name="${esc(sheet)}" sheetId="1" r:id="rId1"/></sheets>
           |</workbook>""".stripMargin)
      entry("xl/_rels/workbook.xml.rels",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
          |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
          |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
          |</Relationships>""".stripMargin)
      out.putNextEntry(new java.util.zip.ZipEntry("xl/worksheets/sheet1.xml"))
      def write(s: String): Unit = out.write(s.getBytes("UTF-8"))
      write("<?xml version=\"1.0\" encoding=\"UTF-8\" standalone=\"yes\"?>\n" +
        "<worksheet xmlns=\"http://schemas.openxmlformats.org/spreadsheetml/2006/main\"><sheetData>")
      def inlineStr(v: String): String =
        s"<c t=\"inlineStr\"><is><t xml:space=\"preserve\">${esc(v)}</t></is></c>"
      write("<row>" +
        schema.fieldNames.map(inlineStr).mkString + "</row>")
      var n = 0
      val it = df.toLocalIterator()
      while (it.hasNext) {
        val row = it.next()
        n += 1
        if (n > maxRows)
          throw new IllegalArgumentException(
            s"xlsx sheet cap is $maxRows data rows — aggregate before " +
              "exporting a report, or use a scalable sink (parquet/csv)")
        val cells = new StringBuilder("<row>")
        var i = 0
        while (i < numeric.length) {
          if (row.isNullAt(i)) cells.append("<c/>")
          else numeric(i) match {
            case 1 => cells.append(s"<c t=\"n\"><v>${row.get(i)}</v></c>")
            case 2 => cells.append(
              s"<c t=\"b\"><v>${if (row.getBoolean(i)) 1 else 0}</v></c>")
            case _ => cells.append(inlineStr(String.valueOf(row.get(i))))
          }
          i += 1
        }
        cells.append("</row>")
        write(cells.result())
      }
      write("</sheetData></worksheet>")
      out.closeEntry()
    } finally out.close()
  }

  /** JDBC sink (SQLite/Postgres/...): the direct `to_sql` analog. The
    * `numPartitions` cap bounds concurrent connections against the target —
    * via `repartition`, NOT `coalesce`: coalesce fuses into the upstream
    * stage and would throttle the whole computation of `df` to
    * `numPartitions` tasks; repartition pays one small shuffle of the final
    * output and leaves upstream parallelism intact. */
  def jdbc(df: DataFrame, url: String, table: String,
           mode: SaveMode = SaveMode.Overwrite, numPartitions: Int = 8): Unit =
    df.repartition(numPartitions).write.mode(mode)
      .format("jdbc").option("url", url).option("dbtable", table)
      .save()

  /** Small-files compaction — the table-maintenance pass every long-lived
    * parquet table needs (streaming sinks and fine-grained partitioned
    * writes accrete kilobyte files; at 100 TB the scan's task-per-file
    * scheduling and the namenode/listing cost dominate before a byte is
    * read). Rewrites `srcDir` into `destDir` with ceil(totalBytes /
    * targetBytes) output files via a round-robin repartition (no shuffle
    * key — pure size rebalancing; rows within a file stay arbitrary, which
    * is the contract of an unsorted table; compose with
    * [[graft.ops.Layout.zorderWrite]] when downstream wants clustering).
    * Returns (filesBefore, filesAfter). */
  def compact(spark: SparkSession, srcDir: String, destDir: String,
              targetBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    require(targetBytes > 0, "targetBytes must be positive")
    def parquetFiles(dir: java.io.File): Seq[java.io.File] = {
      val kids = Option(dir.listFiles).map(_.toSeq).getOrElse(Nil)
      kids.filter(_.isFile).filter(_.getName.endsWith(".parquet")) ++
        kids.filter(_.isDirectory).flatMap(parquetFiles)
    }
    val before = parquetFiles(new java.io.File(srcDir))
    val total = before.map(_.length).sum
    val n = math.max(1, math.ceil(total.toDouble / targetBytes).toInt)
    spark.read.parquet(srcDir).repartition(n)
      .write.mode(SaveMode.Overwrite).parquet(destDir)
    (before.size, parquetFiles(new java.io.File(destDir)).size)
  }

}
