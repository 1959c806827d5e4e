package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The ingest-a-batch composition ([[Dedup.ingestBatch]]): statuses and
  * folded labels equal the from-scratch recompute, the plan never touches
  * corpus text, the label journal applies to exactly the full
  * incrementalComponents output, and the appended index rows equal the
  * from-scratch index of the accepted docs. */
class IngestBatchSpec extends SparkSpec {
  import spark.implicits._

  // corpus: 0≈4 near-dups (base group), 2 standalone, 6 the exact-dup target
  private val corpusRows = Seq(
    (0L, "the quick brown fox jumps over the lazy dog today"),
    (2L, "completely different corpus text about other things entirely"),
    (4L, "the quick brown fox jumps over the lazy dog tonight"),
    (6L, "a standing corpus document that the batch duplicates exactly"))
  // batch: 9 exact-dup of corpus 6; 19/29 exact-dups of each other
  // (keep-first keeps 19, which is ALSO a near-dup of corpus 0 → dup_near);
  // 39 fresh; 49 near-dup of 39 (earlier exact-kept batch doc)
  private val batchRows = Seq(
    (9L, "a standing corpus document that the batch duplicates exactly"),
    (19L, "the quick brown fox jumps over the lazy dog tomorrow"),
    (29L, "the quick brown fox jumps over the lazy dog tomorrow"),
    (39L, "an entirely fresh batch document nothing else resembles"),
    (49L, "an entirely fresh batch document nothing else resembles much"))

  private def fixture(): (String, org.apache.spark.sql.DataFrame) = {
    val base = java.nio.file.Files
      .createTempDirectory("graft_ingest_spec").toString
    val corpus = corpusRows.toDF("doc_id", "text")
    corpus.write.parquet(s"$base/corpus_docs.parquet")
    val cd = spark.read.parquet(s"$base/corpus_docs.parquet")
    val (bands, sets) = Dedup.corpusNearDupIndex(cd, "doc_id", "text")
    graft.io.Sinks.parquet(bands, s"$base/corpus_bands.parquet")
    graft.io.Sinks.parquet(sets, s"$base/corpus_shingles.parquet")
    graft.io.Sinks.parquet(
      cd.select(TextOps.md5Hash60(col("text")).as("content_hash")).distinct(),
      s"$base/corpus_hashes.parquet")
    graft.io.Sinks.parquet(
      Dedup.connectedComponents(Dedup.nearDupPairsFromSets(
        spark.read.parquet(s"$base/corpus_shingles.parquet"))),
      s"$base/base_components.parquet")
    (base, batchRows.toDF("doc_id", "text"))
  }

  private def run(base: String, batch: org.apache.spark.sql.DataFrame) =
    Dedup.ingestBatch(batch,
      spark.read.parquet(s"$base/corpus_bands.parquet"),
      spark.read.parquet(s"$base/corpus_shingles.parquet"),
      spark.read.parquet(s"$base/corpus_hashes.parquet"),
      spark.read.parquet(s"$base/base_components.parquet"),
      "doc_id", "text", outDir = s"$base/out", threshold = 0.7,
      hash = TextOps.md5Hash60)

  test("statuses and folded components equal the from-scratch recompute; corpus text never scanned") {
    val (base, batch) = fixture()
    val result = run(base, batch)
    assert(!result.queryExecution.executedPlan.toString
        .contains("corpus_docs"),
      "ingestBatch re-scanned corpus text")
    val got = result.as[(Long, String, Long)].collect().sortBy(_._1).toSeq
    // from-scratch expectations: 0≈4≈19≈29 one group (min 0); 6=9 exact;
    // 39≈49 fresh group (min 39)
    assert(got == Seq(
      (9L, "dup_exact", 6L),
      (19L, "dup_near", 0L),
      (29L, "dup_exact", 0L),
      (39L, "accepted", 39L),
      (49L, "dup_near", 39L)), got.toString)
  }

  test("the label journal applies to exactly the full incrementalComponents output") {
    val (base, batch) = fixture()
    run(base, batch)
    val store = spark.read.parquet(s"$base/base_components.parquet")
    val delta = Dedup.incrementalNearDupPairs(
      spark.read.parquet(s"$base/corpus_bands.parquet"),
      spark.read.parquet(s"$base/corpus_shingles.parquet"),
      batch, "doc_id", "text", threshold = 0.7)
    val full = Dedup.incrementalComponents(
        store, batch.select("doc_id"), delta)
      .as[(Long, Long)].collect().toSet
    // journal application: re-point moved components, add inserts
    val moves = spark.read.parquet(s"$base/out/label_moves.parquet")
      .as[(Long, Long)].collect().toMap
    val inserts = spark.read.parquet(s"$base/out/label_inserts.parquet")
      .as[(Long, Long)].collect().toSet
    val applied = store.as[(Long, Long)].collect().toSeq
      .map { case (id, c) => (id, moves.getOrElse(c, c)) }.toSet ++ inserts
    assert(applied == full,
      s"journal-applied store diverged:\napplied=$applied\nfull=$full")
  }

  test("appended index rows equal the from-scratch index of the accepted docs") {
    val (base, batch) = fixture()
    val accepted = run(base, batch).where(col("status") === "accepted")
      .select("doc_id")
    val acceptedDocs = batch.join(accepted, Seq("doc_id"), "left_semi")
    val (fBands, fSets) = Dedup.corpusNearDupIndex(
      acceptedDocs, "doc_id", "text")
    val gotBands = spark.read.parquet(s"$base/out/bands_append.parquet")
      .as[(Long, Int, Long)].collect().toSet
    val gotSets = spark.read.parquet(s"$base/out/shingles_append.parquet")
      .select(col("id"), concat_ws("|", array_sort(col("sh"))))
      .as[(Long, String)].collect().toSet
    assert(gotBands == fBands.as[(Long, Int, Long)].collect().toSet)
    assert(gotSets == fSets
      .select(col("id"), concat_ws("|", array_sort(col("sh"))))
      .as[(Long, String)].collect().toSet)
    // hash append covers exactly the accepted texts
    val gotHashes = spark.read.parquet(s"$base/out/hashes_append.parquet")
      .as[Long].collect().toSet
    val expHashes = acceptedDocs
      .select(TextOps.md5Hash60(col("text"))).as[Long].collect().toSet
    assert(gotHashes == expHashes)
  }
}
