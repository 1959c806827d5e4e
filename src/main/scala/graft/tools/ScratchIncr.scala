package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ext.Dedup
import graft.io.Tables

/** Dev-only stage breakdown for dedup_groups_incr (deleted after use). */
object ScratchIncr {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf1")
    val mod = args.lift(1).map(_.toInt).getOrElse(10)
    val rem = mod - 1
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $name%-22s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val docs = Tables(spark, dir).documents
    val batch = docs.where(col("doc_id") % mod === rem)
    val old = docs.where(col("doc_id") % mod =!= rem)
    println(s"[scratch] corpus=$dir batch=1/$mod n_batch=${batch.count()}")
    // stage artifacts (timed separately — ingest-time cost)
    val base = "/tmp/scratch_incr"
    t("stage: index") {
      val (bands, sets) = Dedup.corpusNearDupIndex(old, "doc_id", "text")
      graft.io.Sinks.parquet(bands, s"$base/corpus_bands.parquet")
      graft.io.Sinks.parquet(sets, s"$base/corpus_shingles.parquet")
    }
    t("stage: base closure") {
      val sets = spark.read.parquet(s"$base/corpus_shingles.parquet").persist()
      graft.io.Sinks.parquet(
        Dedup.connectedComponents(Dedup.nearDupPairsFromSets(sets)),
        s"$base/base_components.parquet")
      sets.unpersist()
    }
    val cBands = spark.read.parquet(s"$base/corpus_bands.parquet")
    val cSets = spark.read.parquet(s"$base/corpus_shingles.parquet")
    val baseLab = spark.read.parquet(s"$base/base_components.parquet")
    val delta = t("delta pairs") {
      val d = Dedup.incrementalNearDupPairs(cBands, cSets, batch,
        "doc_id", "text", threshold = 0.7)
      println(s"[scratch]   n_delta = ${d.count()}")
      d
    }
    val labels = t("incremental closure") {
      val l = Dedup.incrementalComponents(baseLab, batch.select("doc_id"), delta)
      println(s"[scratch]   n_labels = ${l.count()}")
      l
    }
    t("final output join") {
      docs.select("doc_id")
        .join(labels.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("component"), col("doc_id")).as("component"))
        .write.mode("overwrite").format("noop").save()
    }
    spark.stop()
  }
}
