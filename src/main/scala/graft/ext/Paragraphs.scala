package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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
    * never depends on partitioning. One window over the paragraph hash:
    * shuffle keys are the 60-bit [[TextOps.md5Hash60]] of the paragraph,
    * and the rank comparison confirms identity via the hash only (sha-level
    * collision risk at 60 bits is ~n²/2⁶¹ — pass a stronger hash column
    * via `keyCol` if the corpus is large enough to care). */
  def dropRepeatedParagraphs(paras: DataFrame): DataFrame = {
    val w = Window.partitionBy(TextOps.md5Hash60(col("para")))
      .orderBy(col("id"), col("para_idx"))
    paras.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .drop("__rn")
  }

  /** Boilerplate filter: drop paragraphs whose exact content appears in
    * more than `maxDocFreq` DISTINCT documents (every occurrence goes,
    * unlike [[dropRepeatedParagraphs]] which keeps the first). Two-pass
    * over the paragraph table: df per hash (one groupBy), then a window
    * join-free filter via the same shuffle key. */
  def dropBoilerplate(paras: DataFrame, maxDocFreq: Long = 1): DataFrame = {
    val w = Window.partitionBy(TextOps.md5Hash60(col("para")))
    paras.withColumn("__df", size(collect_set(col("id")).over(w)))
      .where(col("__df") <= maxDocFreq)
      .drop("__df")
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
