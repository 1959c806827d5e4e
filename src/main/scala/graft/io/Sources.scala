package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Source layer (SURVEY.md §2.1, S1–S7).
  *
  * The reference federates reads over ODBC/Access, SQLite, TSV, CSV and
  * HTTP+zip (`etl_io.py:114-138`, `:738-768`, `:880-896`, `:679-708`).
  * Spark-first, all of those collapse into `spark.read.<format>` with
  * source-level predicate/projection pushdown handled by Catalyst, so this
  * layer is thin: it names the corpus tables once, and provides the
  * delimited-text readers (S4/S5) and a JDBC passthrough (S1).
  *
  * Scale posture: readers return lazy DataFrames; no driver materialization.
  * At 100 TB the parquet paths become object-store prefixes and nothing here
  * changes — partition discovery, column pruning and filter pushdown are
  * scan-node concerns.
  */
object Sources {

  /** All corpus tables (TESTDATA.md). One parquet file/dir each. */
  val tableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** S1-analog: parquet scan of a named corpus table, with the event-time
    * column canonicalized via [[normalizeTs]] (the corpus has shipped two
    * `ts` encodings across regenerations; see that method).
    *
    * The footer schema is memoized per (path, mtime+size): `spark.read
    * .parquet` re-infers the schema on EVERY call (a driver-side listing +
    * footer read, measured ~90 ms at sf0.1), which a registry that builds
    * each table reference fresh per query would pay per table per query.
    * Declaring the schema is also the production posture — at 100 TB the
    * schema comes from a catalog, never re-derived per read. The signature
    * check keeps regeneration safety: a rewritten file re-infers (same
    * mtime+size discipline as the streaming stage cache). */
  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val path = s"$dir/$name.parquet"
    val sch = tableSchema(spark, path)
    normalizeTs(spark.read.schema(sch).parquet(path))
  }

  private val schemaCache = new java.util.concurrent.ConcurrentHashMap[
    String, (String, org.apache.spark.sql.types.StructType)]()

  /** Memoized parquet footer schema (public for other read paths — e.g.
    * the streaming source — that would otherwise re-infer per call). */
  def parquetSchema(spark: SparkSession,
                    path: String): org.apache.spark.sql.types.StructType =
    tableSchema(spark, path)

  private def tableSchema(spark: SparkSession,
                          path: String): org.apache.spark.sql.types.StructType = {
    val sig =
      try {
        val p = java.nio.file.Paths.get(path)
        s"${java.nio.file.Files.getLastModifiedTime(p)}:${java.nio.file.Files.size(p)}"
      } catch { case _: Exception => "?" } // non-local FS: fall through, still cached per path
    schemaCache.compute(path, { (_, prev) =>
      if (prev != null && prev._1 == sig) prev
      else (sig, spark.read.parquet(path).schema)
    })._2
  }

  /** Canonicalize a `ts` column to session-zone TIMESTAMP, whatever the
    * file encoded. Two encodings have occurred in the corpus's lifetime:
    *
    *  - parquet TIMESTAMP(NANOS): Spark's reader rejects it
    *    ([PARQUET_TYPE_ILLEGAL]) unless read as a raw long
    *    (`spark.sql.legacy.parquet.nanosAsLong`, set in [[table]]); the
    *    LongType branch rebuilds a µs timestamp with INTEGER division —
    *    the same ns→µs truncation DuckDB applies natively, and exact where
    *    a double-valued division would lose precision on 1e18-ns values.
    *  - parquet TIMESTAMP(MICROS, isAdjustedToUTC=false): Spark reads it
    *    as TIMESTAMP_NTZ, which `unix_micros`/long-casts reject. The cast
    *    to TIMESTAMP interprets the wall-clock in the session zone — all
    *    graft sessions pin UTC, so it is exact and matches the DuckDB
    *    oracle's `CAST(ts AS TIMESTAMP)`.
    *
    * Plain TIMESTAMP passes through untouched. Applies to any `ts` column,
    * batch or streaming frame (resolution is lazy; no data read here). */
  def normalizeTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    df.schema.fields.find(_.name == "ts").map(_.dataType match {
      case LongType =>
        df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType =>
        df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }).getOrElse(df)
  }

  /** S4: TSV scan (reference: `pd.read_csv(sep='\t')`, etl_io.py:763).
    * Pass an explicit `schema` for deterministic types (inference costs an
    * extra pass over the files AND can drift across data samples — at
    * 100 TB both matter). */
  def tsv(spark: SparkSession, path: String, inferSchema: Boolean = true,
          schema: Option[org.apache.spark.sql.types.StructType] = None): DataFrame =
    delimited(spark, path, "\t", inferSchema, schema)

  /** S5: CSV scan (reference: etl_io.py:894). */
  def csv(spark: SparkSession, path: String, inferSchema: Boolean = true,
          schema: Option[org.apache.spark.sql.types.StructType] = None): DataFrame =
    delimited(spark, path, ",", inferSchema, schema)

  private def delimited(spark: SparkSession, path: String, sep: String,
                        inferSchema: Boolean,
                        schema: Option[org.apache.spark.sql.types.StructType]): DataFrame = {
    val r = spark.read.option("sep", sep).option("header", "true")
    schema.fold(r.option("inferSchema", inferSchema.toString))(r.schema).csv(path)
  }

  /** JSON-lines scan — the interchange format web-scraped corpora arrive
    * in. The schema is REQUIRED: inference costs a full extra pass over the
    * text and cannot tell int from long or recover timestamps reliably;
    * at 100 TB of .jsonl.gz shards either failure mode is expensive. */
  def jsonl(spark: SparkSession, path: String,
            schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** ORC scan — the other columnar interchange; schema travels with the
    * files, so unlike text formats no caller-side schema is needed. */
  def orc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** S9 read side: scan a single-sheet .xlsx written by
    * [[graft.io.Sinks.xlsx]] (or any workbook whose first sheet is at the
    * standard part path with inline-string/numeric cells — sparse rows,
    * pretty-printed XML, and short rows all land correctly via each
    * cell's A1-style `r` attribute; shared-string (t="s") cells are NOT
    * resolved, the one workbook shape this reader rejects reading
    * faithfully). DELIBERATELY driver-side:
    * xlsx caps a sheet at ~1M rows, so this is report-reingestion, not a
    * corpus scan — the file parses once on the driver (JDK zip + DOM, no
    * dependency) and lands as a normal DataFrame. `schema` gives the
    * column types; empty cells are NULL. */
  def xlsx(spark: SparkSession, path: String,
           schema: org.apache.spark.sql.types.StructType): DataFrame = {
    import org.apache.spark.sql.types._
    val zf = new java.util.zip.ZipFile(path)
    val rowsOut = try {
      val doc = javax.xml.parsers.DocumentBuilderFactory.newInstance()
        .newDocumentBuilder()
        .parse(zf.getInputStream(zf.getEntry("xl/worksheets/sheet1.xml")))
      val rows = doc.getElementsByTagName("row")
      // "BC2" -> column index 54: the A1-style `r` attribute is the cell's
      // authoritative position — xlsx writers legally OMIT empty cells
      // (sparse rows), so positional child indexing misassigns columns
      def colIdx(ref: String): Int =
        ref.takeWhile(_.isLetter).foldLeft(0)((a, ch) =>
          a * 26 + (ch.toUpper - 'A' + 1)) - 1
      (1 until rows.getLength).map { r => // row 0 is the header
        // getElementsByTagName("c"), never raw child nodes: a pretty-
        // printed workbook interleaves whitespace TEXT nodes between
        // cells, and a row with fewer cells than the schema must pad
        // with nulls, not NPE
        val cs = rows.item(r).asInstanceOf[org.w3c.dom.Element]
          .getElementsByTagName("c")
        val vals = new Array[Any](schema.fields.length)
        var j = 0
        while (j < cs.getLength) {
          val c = cs.item(j).asInstanceOf[org.w3c.dom.Element]
          val ref = c.getAttribute("r")
          val i = if (ref != null && ref.nonEmpty) colIdx(ref) else j
          if (i >= 0 && i < vals.length) {
            // value lives in <is><t> (inline string) or <v> (number/
            // bool); getTextContent on the cell itself would fold in
            // pretty-printing whitespace
            val ts = c.getElementsByTagName("t")
            val vn = c.getElementsByTagName("v")
            val v = if (ts.getLength > 0) ts.item(0).getTextContent
                    else if (vn.getLength > 0) vn.item(0).getTextContent
                    else null
            if (v != null) vals(i) = schema.fields(i).dataType match {
              case LongType => v.trim.toLong
              case IntegerType => v.trim.toInt
              case DoubleType => v.trim.toDouble
              case BooleanType => v.trim == "1" || v.trim == "true"
              case _ => v
            }
          }
          j += 1
        }
        org.apache.spark.sql.Row.fromSeq(vals.toSeq)
      }
    } finally zf.close()
    spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](
        scala.jdk.CollectionConverters.SeqHasAsJava(rowsOut).asJava),
      schema)
  }

  /** S1: JDBC scan with full query pushdown (reference pushes templated SQL
    * over ODBC, etl_io.py:185-198; Spark pushes the query to the source). */
  def jdbc(spark: SparkSession, url: String, query: String): DataFrame =
    spark.read.format("jdbc").option("url", url).option("query", query).load()

  /** S2: register every corpus table as a temp view so callers can run raw
    * SQL (the reference's custom-SQL escape hatch, etl_io.py:156-201 —
    * `spark.sql` replaces string templating; pushdown stays automatic).
    *
    * Memoized per (session, dir): registration costs one FS probe + parquet
    * footer read per table, which a repeatedly-called SQL entry point should
    * pay once, not per query. Switching dirs re-registers (the views are
    * names shared across dirs); sessions are weakly held. */
  def registerViews(spark: SparkSession, dir: String): Seq[String] =
    viewState.synchronized {
      val st = viewState.get(spark)
      // cache hit must still be VALID: dropped views are caught by
      // tableExists (a catalog map probe), and a dir that gained or lost
      // tables is caught by re-listing it (one FS listing — cheap next to
      // the parquet footer reads registration costs). NOT detectable: a
      // createOrReplaceTempView that SHADOWS a cached name with different
      // data — the catalog can't distinguish it; callers owning colliding
      // names must re-register via a fresh dir or drop the view first.
      if (st != null && st.dir == dir &&
          st.tables.forall(spark.catalog.tableExists) &&
          Catalog.listTables(spark, dir) == st.tables) st.tables
      else {
        val present = Catalog.listTables(spark, dir)
        present.foreach(n => table(spark, dir, n).createOrReplaceTempView(n))
        viewState.put(spark, ViewState(dir, present))
        present
      }
    }

  private final case class ViewState(dir: String, tables: Seq[String])
  private val viewState = new java.util.WeakHashMap[SparkSession, ViewState]()
}

/** Typed handles on the test corpus: one lazy DataFrame per table.
  * Centralizing reads here means caching/bucketing decisions are made once.
  */
final case class Tables(spark: SparkSession, dir: String) {
  def t(name: String): DataFrame = Sources.table(spark, dir, name)
  def region: DataFrame     = t("region")
  def nation: DataFrame     = t("nation")
  def customer: DataFrame   = t("customer")
  def supplier: DataFrame   = t("supplier")
  def part: DataFrame       = t("part")
  def orders: DataFrame     = t("orders")
  def lineitem: DataFrame   = t("lineitem")
  def events: DataFrame     = t("events")
  def documents: DataFrame  = t("documents")
  def embeddings: DataFrame = t("embeddings")
}
