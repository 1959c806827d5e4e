package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ext.{Dedup, TextOps}
import graft.io.Tables

/** Plan auditor for the INTERNAL frames of checkpoint-truncated operators:
  * queries that end in (or pass through) `.ckpt()` materialize their heavy
  * stages during construction, so `Explain` on the registered frame shows
  * only `Scan ExistingRDD`. This prints the formatted plans of the
  * building blocks the optimization round makes claims about — the
  * MinHash band derivation, the SimHash signature derivation, the BPE
  * encode vocab chain — so before/after plan diffs are reviewable.
  *
  * Usage: runMain graft.tools.PlanLab <sfDir>
  */
object PlanLab {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables(spark, sfDir).documents

    println("\n========== minhash_band_table ==========")
    val sets = docs.select(col("doc_id").as("id"),
      TextOps.shingles(col("text"), 3).as("sh"))
    Dedup.minhashBandsFromSets(sets, 64, 16).explain("formatted")

    println("\n========== simhash_table ==========")
    val tok = docs.select(col("doc_id").as("id"),
      TextOps.words(col("text")).as("w"))
    Dedup.simhashesFromTokens(tok, bits = 60, hash = TextOps.md5Hash60)
      .explain("formatted")

    println("\n========== shingle_sets ==========")
    sets.explain("formatted")

    println("\n========== bpe_encode_vocab ==========")
    // a fixed 4-rule table: the plan SHAPE (per-rule folds + checkpoints
    // vs one native expression) is what the audit reviews
    val rules = Seq(("e", " "), ("t", "h"), ("th", "e"), ("a", "n"))
    graft.ext.Bpe.encode(docs, "doc_id", "text", rules)
      .explain("formatted")

    spark.stop()
  }
}
