package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing: lay documents end-to-end on a global token axis and
  * cut fixed-`capacity` training chunks — the concat-and-chunk step every
  * LLM pre-training pipeline runs between "clean corpus" and "batches".
  * (Extension surface: the reference stops at relational ETL.)
  *
  * The global document order is `idCol` (deterministic across runs and
  * partitionings); each document occupies `[start, start+len)` where
  * `start` is the running sum of lengths before it, and chunk `c` covers
  * `[c*capacity, (c+1)*capacity)`. A document overlapping a chunk boundary
  * is SPLIT across chunks (exactly how GPT-style packing treats document
  * crossings) — callers that want whole-doc bins can group on the chunk of
  * `tok_start`.
  *
  * Scale: the naive formulation is one global-ORDER-BY window — a
  * single-partition scan of the corpus, dead at 100 TB. This is instead the
  * textbook two-level distributed prefix sum:
  *   1. bucket docs by `idCol / bucketWidth` (order-preserving);
  *   2. per-bucket totals → tiny frame; running sum over THAT (the
  *      single-partition window touches #buckets rows, not #docs);
  *   3. broadcast-join offsets back; per-bucket window adds local prefix.
  * Each full-corpus pass is hash/broadcast-parallel; only bucket totals
  * (|corpus|/bucketWidth rows) ever serialize through one partition.
  */
object Packing {

  /** (doc → chunk) spans: one row per (document, overlapped chunk) with the
    * document's token sub-range `[tok_start, tok_end)` inside that chunk.
    * Zero-length documents carry no tokens and are dropped. `lenCol` is any
    * per-doc token count — char length, whitespace tokens, or a BPE count.
    * `idCol` MUST be unique: it is the global order, and duplicate ids
    * would make their relative placement (hence chunk assignment)
    * partition-order-dependent.
    *
    * `bucketWidth` is in ID-VALUE units, so the "#buckets ≪ #docs" bound
    * on step 2 assumes DENSE-ish ids (doc_id, or [[Sampling.trainOrder]]'s
    * `pos` — dense 1..N by construction, the natural feed here). Sparse
    * ids (snowflake-style, 2^63-spread) put ~one doc per bucket and
    * degenerate step 2 toward the global window — scale `bucketWidth` to
    * the id spacing, or rank first via trainOrder. */
  def packChunks(docs: DataFrame, idCol: String, lenCol: Column,
                 capacity: Long, bucketWidth: Long = 65536): DataFrame = {
    require(capacity > 0, "capacity must be positive")
    starts(docs, idCol, lenCol, bucketWidth)
      .withColumn("chunk_id", explode(sequence(
        floor(col("__start") / capacity),
        floor((col("__start") + col("__len") - 1) / capacity))))
      .select(col("__id").as(idCol), col("chunk_id"),
        greatest(col("__start"), col("chunk_id") * capacity).as("tok_start"),
        least(col("__start") + col("__len"), (col("chunk_id") + 1) * capacity)
          .as("tok_end"))
  }

  /** The shared two-level prefix sum: each doc's global token start on the
    * laid-out axis, as (__id, __len, __start). */
  private def starts(docs: DataFrame, idCol: String, lenCol: Column,
                     bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val d = docs.select(col(idCol).as("__id"), lenCol.cast("long").as("__len"))
      .where(col("__len") > 0)
      .withColumn("__b", floor(col("__id") / bucketWidth))
    val wB = Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, -1)
    val offsets = d.groupBy("__b").agg(sum("__len").as("__bt"))
      .withColumn("__boff", coalesce(sum("__bt").over(wB), lit(0L)))
      .select("__b", "__boff")
    val wIn = Window.partitionBy("__b").orderBy("__id")
      .rowsBetween(Window.unboundedPreceding, -1)
    d.join(broadcast(offsets), Seq("__b"))
      .withColumn("__start",
        col("__boff") + coalesce(sum("__len").over(wIn), lit(0L)))
  }

  /** Split-free packing: each doc goes WHOLE into the chunk containing its
    * global start — next-fit bin assignment in id order, the variant for
    * objectives that cannot split a document (RAG contexts, eval shards).
    * A chunk's token load may exceed `capacity` by at most one document's
    * overhang (the reader pads or truncates — that is the documented
    * trade against [[packChunks]]'s exact fills). Returns per-doc
    * (idCol, chunk_id, n_tokens); aggregate for per-chunk loads. Same
    * prefix-sum machinery and scale posture as [[packChunks]]. */
  def packWholeDocs(docs: DataFrame, idCol: String, lenCol: Column,
                    capacity: Long, bucketWidth: Long = 65536): DataFrame = {
    require(capacity > 0, "capacity must be positive")
    starts(docs, idCol, lenCol, bucketWidth)
      .select(col("__id").as(idCol),
        floor(col("__start") / capacity).as("chunk_id"),
        col("__len").as("n_tokens"))
  }

  /** Per-chunk packing stats: docs touched, tokens filled, fill ratio.
    * Every chunk except the last is exactly full by construction — this is
    * the invariant PackingSpec pins. `fill_ratio` divides by a caller-chosen
    * power-of-two capacity exactly (no rounding needed). */
  def chunkStats(chunks: DataFrame, capacity: Long): DataFrame =
    chunks.groupBy("chunk_id").agg(
      count(lit(1)).as("n_docs"),
      sum(col("tok_end") - col("tok_start")).as("n_tokens"))
      .withColumn("fill_ratio", col("n_tokens") / lit(capacity.toDouble))
}
