package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Paragraph-level deduplication (SURVEY.md §2.11 extension) — the CCNet /
  * RefinedWeb preprocessing step the document-level dedup family
  * ([[Dedup]]) cannot express: duplicated PASSAGES (boilerplate headers,
  * license blocks, navigation chrome) repeat across documents that are not
  * themselves duplicates, and the fix is to drop the repeated paragraphs
  * while keeping the documents.
  *
  * The working shape is the exploded paragraph table `(id, para_idx, para)`
  * — the natural Spark representation (one row per paragraph, corpus-wide
  * operators are groupBys/windows over it), produced by either splitter and
  * consumed by every cleaner here. Reference anchor: the reference's
  * column-transform posture (etl_io.py's recode/filter family) lifted to
  * intra-document structure.
  *
  * Scale posture: every step is one shuffle keyed by a 60-bit content hash
  * of the paragraph (never the raw string — shuffle keys stay 8 bytes no
  * matter how long the paragraph is), and reassembly is one groupBy(id).
  * Nothing collects; nothing is quadratic: paragraph dedup is exact
  * hash-equality, so no candidate joins exist at all.
  */
object Paragraphs {

  /** Explode documents into ordered paragraphs on a separator regex
    * (default: blank line). Output: (id, para_idx, para), empty paragraphs
    * dropped (a run of separators produces no phantom rows). */
  def explodeParagraphs(df: DataFrame, idCol: String, textCol: String,
                        sepRegex: String = "\n\n+"): DataFrame =
    df.select(col(idCol).as("id"),
        posexplode(split(col(textCol), sepRegex)).as(Seq("para_idx", "para")))
      .where(length(trim(col("para"))) > 0)

  /** Fixed-token-window paragraphs for corpora WITHOUT structural
    * separators (token streams, OCR output): consecutive `tokensPerPara`
    * tokens per paragraph, order preserved. Same output contract as
    * [[explodeParagraphs]]. One explode + one groupBy(id, window) —
    * per-doc cost linear in tokens. */
  def tokenWindowParagraphs(df: DataFrame, idCol: String, textCol: String,
                            tokensPerPara: Int = 12): DataFrame =
    df.select(col(idCol).as("id"),
        posexplode(TextOps.words(col(textCol))).as(Seq("pos", "tok")))
      .groupBy(col("id"), (col("pos") / tokensPerPara).cast("long").as("para_idx"))
      .agg(concat_ws(" ",
        transform(array_sort(collect_list(struct(col("pos"), col("tok")))),
          t => t.getField("tok"))).as("para"))

  /** Global keep-first paragraph dedup (the CCNet shape): every occurrence
    * of a paragraph after its FIRST appearance in corpus order
    * (id, para_idx ascending) is dropped. Deterministic — the survivor
    * never depends on partitioning. Identity is the 60-bit
    * [[TextOps.md5Hash60]] of the paragraph (collision risk ~n²/2⁶¹ —
    * swap in a stronger hash if the corpus is large enough to care).
    *
    * Shape at scale: min-struct aggregate + semi join, NOT a row_number
    * window over the hash. Boilerplate is BY DEFINITION the skewed-key
    * case (one header in 10M docs), and a window partitioned by the hash
    * buffers that whole group in one task with no AQE remedy. Here the
    * aggregate combines map-side (hot hash → one row per task before the
    * shuffle), and the semi join's equi keys are (hash, id, para_idx) —
    * unique per row — so the hot paragraph's occurrences SCATTER across
    * partitions instead of serializing through one.
    *
    * Null `para` rows are DROPPED up front (a paragraph with no content
    * has no identity to dedup on; the splitters never emit them). Both
    * internal passes read `paras` — persist or checkpoint it first when
    * its lineage is expensive. */
  def dropRepeatedParagraphs(paras0: DataFrame): DataFrame = {
    val paras = paras0.where(col("para").isNotNull)
    val h = TextOps.md5Hash60(col("para"))
    val firsts = paras
      .groupBy(h.as("__ph"))
      .agg(min(struct(col("id"), col("para_idx"))).as("__first"))
    paras.join(firsts,
      h === col("__ph") &&
        col("id") === col("__first.id") &&
        col("para_idx") === col("__first.para_idx"),
      "left_semi")
  }

  /** Boilerplate filter: drop paragraphs whose exact content appears in
    * more than `maxDocFreq` DISTINCT documents (every occurrence goes,
    * unlike [[dropRepeatedParagraphs]] which keeps the first).
    *
    * Shape at scale: doc-frequency aggregate → ANTI join against the
    * over-frequency hash set, not a collect_set window (which buffers the
    * hottest paragraph's whole group in one task — see
    * [[dropRepeatedParagraphs]]). The distinct-doc count shuffles
    * (hash, id) pairs — unique, skew-free; the offending-hash set is tiny
    * (few DISTINCT paragraphs exceed any sane doc-frequency cap, however
    * many rows each has), so AQE turns the anti join into a broadcast.
    *
    * Null `para` rows are DROPPED up front (same contract as
    * [[dropRepeatedParagraphs]]); both passes read `paras` — persist or
    * checkpoint it first when its lineage is expensive. */
  def dropBoilerplate(paras0: DataFrame, maxDocFreq: Long = 1): DataFrame = {
    val paras = paras0.where(col("para").isNotNull)
    val heavy = paras
      .groupBy(TextOps.md5Hash60(col("para")).as("__ph"))
      .agg(countDistinct(col("id")).as("__df"))
      .where(col("__df") > maxDocFreq)
      .select("__ph")
    paras.join(heavy, TextOps.md5Hash60(col("para")) === col("__ph"),
      "left_anti")
  }

  /** Corpus boilerplate report: paragraphs appearing in ≥ `minDocs`
    * distinct documents, with doc frequency and total occurrence count —
    * the triage view a pipeline owner reads before choosing a
    * [[dropBoilerplate]] threshold. One groupBy on the paragraph hash;
    * the paragraph text rides along via `first` (identical within a
    * group by construction). */
  def boilerplateReport(paras: DataFrame, minDocs: Long = 2): DataFrame =
    paras.groupBy(TextOps.md5Hash60(col("para")).as("para_hash"))
      .agg(first(col("para")).as("para"),
        countDistinct(col("id")).as("n_docs"),
        count(lit(1)).as("n_occurrences"))
      .where(col("n_docs") >= minDocs)
      .select("para", "n_docs", "n_occurrences")

  /** Reassemble cleaned documents: surviving paragraphs concatenated in
    * original order. Documents whose every paragraph was dropped disappear
    * (a doc that is 100% boilerplate has nothing to contribute). One
    * groupBy(id); order restored via array_sort on (para_idx, para)
    * structs — no window needed. */
  def reassemble(paras: DataFrame, sep: String = " "): DataFrame =
    paras.groupBy(col("id"))
      .agg(
        concat_ws(sep,
          transform(array_sort(collect_list(struct(col("para_idx"), col("para")))),
            t => t.getField("para"))).as("text_clean"),
        count(lit(1)).as("n_paras"))
}
