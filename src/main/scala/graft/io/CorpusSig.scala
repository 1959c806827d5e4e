package graft.io

import org.apache.spark.sql.SparkSession

/** Corpus signature: per-table parquet-footer schema hash + file mtime.
  *
  * Round 6 closed green against a corpus the driver regenerated hours
  * later with a different `events.ts` physical encoding — every artifact
  * (BENCH, CORRECTNESS) silently measured different bytes than the builder
  * last tested. Bench and Verify print this signature at start so any
  * environment drift is visible IN the artifact: a reader comparing two
  * rounds can see at a glance whether the corpus changed between them.
  *
  * The schema hash is over the RAW footer schema (only
  * `spark.sql.legacy.parquet.nanosAsLong` applied, as every graft read
  * does) — deliberately NOT the normalized frame, so an encoding change
  * like TIMESTAMP(NANOS)→TIMESTAMP_NTZ shows up as a different signature
  * even though [[Sources.normalizeTs]] makes query results identical.
  */
object CorpusSig {

  /** (table, mtime-iso, schemaHash8) per table present in `dir`. */
  def perTable(spark: SparkSession, dir: String): Seq[(String, String, String)] = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    Catalog.listTables(spark, dir).sorted.map { name =>
      val path = s"$dir/$name.parquet"
      val mtime =
        try java.time.Instant
          .ofEpochMilli(java.nio.file.Files.getLastModifiedTime(
            java.nio.file.Paths.get(path)).toMillis).toString
        catch { case _: Exception => "?" }
      val schemaHash =
        try java.security.MessageDigest.getInstance("MD5")
          .digest(spark.read.parquet(path).schema.json
            .getBytes("UTF-8")).map("%02x".format(_)).mkString.take(8)
        catch { case _: Exception => "ERR" }
      (name, mtime, schemaHash)
    }
  }

  /** One compact token for the artifact line: hash of all per-table
    * signatures + the latest table mtime. Changes iff any table's schema
    * or file changes. */
  def summary(spark: SparkSession, dir: String): String = {
    val rows = perTable(spark, dir)
    val combined = java.security.MessageDigest.getInstance("MD5")
      .digest(rows.map { case (n, m, h) => s"$n:$m:$h" }.mkString("|")
        .getBytes("UTF-8")).map("%02x".format(_)).mkString.take(12)
    // numeric max, not lexicographic: ISO instants with fractional seconds
    // ("…00.500Z") sort BEFORE the same second without ("…00Z") as strings,
    // which could name an older table in the @mtime suffix
    val maxM = rows.map(_._2).filter(_ != "?")
      .maxByOption(m => java.time.Instant.parse(m).toEpochMilli)
      .getOrElse("?")
    s"$combined@$maxM"
  }
}
