package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Catalog introspection (SURVEY.md §2.1 S3; §2.4 A5/A6).
  *
  * The reference eagerly loads three metadata tables at connect time and
  * materializes them into nested driver dicts used for recoding and renaming
  * (`etl_io.py:36-112`, `:136-138`): `varnames[table][var] -> title` and
  * `metadata[var][code] -> label`.
  *
  * Spark-first: the metadata tables are ordinary DataFrames; the nested maps
  * are a *driver-side, bounded* materialization (they are per-variable code
  * books, not data-sized), collected once and then applied to data either as
  * map literals (small) or broadcast joins (large) — see
  * [[graft.ops.Recode]]. At 100 TB the data never flows through the driver;
  * only the code books do.
  */
object Catalog {

  /** List tables available under a corpus dir (S3 analog of `tables19`).
    * Uses the Hadoop FileSystem API so the same probe works on local dirs,
    * HDFS, and object-store prefixes (the 100 TB posture) — not just
    * driver-local paths. */
  def listTables(spark: SparkSession, dir: String): Seq[String] = {
    val conf = spark.sparkContext.hadoopConfiguration
    Sources.tableNames.filter { n =>
      val p = new org.apache.hadoop.fs.Path(s"$dir/$n.parquet")
      p.getFileSystem(conf).exists(p)
    }
  }

  /** A5/A6: build `{key -> {code -> label}}` from a long metadata table.
    * Replaces the reference's per-key `unique()` + filter + `dict(tuple(...))`
    * loop (etl_io.py:104-108) with one grouped collect — a single Spark job
    * instead of one scan per key.
    *
    * Bounded by construction (code books); safe to collect.
    */
  def nestedMap(df: DataFrame, keyCol: String, codeCol: String, labelCol: String)
      : Map[String, Map[String, String]] =
    df.na.drop("any", Seq(keyCol, codeCol, labelCol))
      // One label per (key, code): the reference's dict(tuple(...)) silently
      // last-wins on duplicate code rows (etl_io.py:104-108); max(label) is
      // the deterministic stand-in for "one wins". The nesting itself is
      // built driver-side from the (bounded) flat rows — one Spark job, no
      // second shuffle into map_from_entries just to unpack it again.
      .groupBy(keyCol, codeCol).agg(max(col(labelCol)).as(labelCol))
      .collect()
      .groupBy(_.getString(0))
      .map { case (k, rows) =>
        k -> rows.map(r => r.getString(1) -> r.getString(2)).toMap
      }

  /** Flat `{code -> label}` map from a two-column DataFrame (varnames dict
    * analog, etl_io.py:74-79). */
  def flatMap(df: DataFrame, codeCol: String, labelCol: String): Map[String, String] =
    df.na.drop("any", Seq(codeCol, labelCol))
      .select(codeCol, labelCol)
      .collect()
      .map(r => r.getString(0) -> r.getString(1))
      .toMap
}
