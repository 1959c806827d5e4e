package graft.ext
import graft.Ckpt.CkptOps

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ops.Relational.dsum

/** Text-analysis operators for the LLM-data-pipeline layer (SURVEY.md §2.11)
  * over the `documents` table: tokenization, shingling, language ID, quality
  * scoring, fingerprinting, grouped corpus stats.
  *
  * Everything here is pure Catalyst expressions (split / transform / filter /
  * aggregate higher-order functions) — codegen'd, no UDFs, no driver loops;
  * per-row cost is independent of corpus size, so the operators scale
  * linearly to 100 TB with zero shuffles except the final grouped stats.
  */
object TextOps {

  /** Whitespace tokens. Single-space split (not a regex class) so the DuckDB
    * oracle's string_split(text, ' ') sees identical tokens. */
  def words(c: Column): Column = split(c, " ")

  /** Token count as BIGINT (matches DuckDB's len()). */
  def tokenCount(c: Column): Column = size(words(c)).cast("long")

  /** Distinct word k-shingles: ["a b c", "b c d", ...]. Documents shorter
    * than k words collapse to one (short) shingle.
    *
    * Built by zipping k shifted copies of the token array (`arrays_zip`
    * evaluates each argument ONCE per row). The naive form —
    * `transform(sequence(...), i => slice(split(text), i, k))` — re-splits
    * the whole text for EVERY shingle index in the interpreted HOF path,
    * turning an O(tokens) row into O(tokens²); at corpus scale that is the
    * difference between milliseconds and minutes per partition. */
  def shingles(c: Column, k: Int = 3): Column =
    shinglesFromTokens(words(c), k)

  /** True when the session (active, else default) has the graft native
    * SQL functions — the [[charGramsOf]] dispatch for call sites without
    * a DataFrame in hand. Plan-construction-time only, never per row. */
  private[graft] def hasNativeFn(name: String): Boolean =
    org.apache.spark.sql.SparkSession.getActiveSession
      .orElse(org.apache.spark.sql.SparkSession.getDefaultSession)
      .exists(_.catalog.functionExists(name))

  /** Behavior probe of a caller-supplied hash recipe, shared by the
    * hash-parameterized kernels ([[graft.ext.Dedup.simhashesFromTokens]],
    * [[winnowFingerprints]]): evaluate it on three literal strings
    * (constant-folded local head(), no cluster work) and compare against
    * the two recipes the kernels ship. Some(false) = xxhash64 (seed 42),
    * Some(true) = [[md5Hash60]], None = anything else (callers keep
    * their pre-kernel formulation — never guess for an unknown hash). */
  private[graft] def knownHashKind(spark: org.apache.spark.sql.SparkSession,
                                   hash: Column => Column): Option[Boolean] = {
    import org.apache.spark.unsafe.types.UTF8String
    val probes = Seq("a", "xy z", "über café")
    val got =
      try {
        val row = spark.range(1)
          .select(probes.map(p => hash(lit(p)).cast("long")): _*).head()
        probes.indices.map(row.getLong)
      } catch { case _: Throwable => return None }
    val xxh = probes.map(p => org.apache.spark.sql.catalyst.expressions.XXH64
      .hashUTF8String(UTF8String.fromString(p), 42L))
    val md5 = probes.map(p =>
      graft.functions.SketchKernels.md5Hash60(UTF8String.fromString(p)))
    if (got == xxh) Some(false)
    else if (got == md5) Some(true)
    else None
  }

  /** [[shingles]] over an already-split token array (see
    * [[ngramsFromTokens]] for when that matters). Prefers the native
    * one-pass kernel (`word_shingles`, [[graft.functions.WordShingles]]):
    * the zipped-shifts HOF chain is interpreted (HOFs are
    * CodegenFallback) and allocates a struct per token window; the kernel
    * emits identical distinct shingles — including the short-doc
    * whole-join rule — in one fold (guide §1.2 step 2: per-task work).
    * The HOF form stays as the sessions-without-extensions fallback;
    * TextOpsSpec pins kernel == HOF equality. */
  def shinglesFromTokens(w: Column, k: Int = 3): Column =
    if (hasNativeFn("word_shingles")) call_function("word_shingles", w, lit(k))
    else shinglesFromTokensHof(w, k)

  /** The pre-round-14 HOF formulation — fallback and test oracle. */
  private[graft] def shinglesFromTokensHof(w: Column, k: Int = 3): Column =
    array_distinct(
      when(size(w) < k, array(array_join(w, " ")))
        .otherwise(ngramsFromTokens(w, k)))

  /** Distinct character k-grams of `text` (the n-gram-Jaccard dedup
    * family). One `substr` per start offset — each element is O(k) work,
    * NOT the nested-HOF pitfall (no inner aggregate re-evaluated per
    * element). Every gram is full length k (start offsets stop at
    * len-k+1 — no shorter suffix grams); the single exception is a text
    * shorter than k, which collapses to one whole-text gram. */
  def charGrams(c: Column, k: Int = 5): Column =
    array_distinct(transform(
      sequence(lit(1), greatest(length(c) - (k - 1), lit(1))),
      i => c.substr(i, lit(k))))

  /** All char k-grams IN ORDER, preferring the native one-pass kernel
    * (`char_kgrams`, [[graft.functions.CharKGrams]]): `Column.substr(i,k)`
    * re-scans from byte 0 to find character offset i on every call, so the
    * composed form is O(len²) per document — measured as the dominant cost
    * of every character-gram operator. Identical output either way
    * (including the whole-text-gram rule for texts shorter than k). */
  private def kgramsCol(df: DataFrame, c: Column, k: Int): Column =
    if (df.sparkSession.catalog.functionExists("char_kgrams"))
      call_function("char_kgrams", c, lit(k))
    else transform(
      sequence(lit(1), greatest(length(c) - (k - 1), lit(1))),
      i => c.substr(i, lit(k)))

  /** [[charGrams]] through the native kernel when `df`'s session has it. */
  def charGramsOf(df: DataFrame)(c: Column, k: Int = 5): Column =
    array_distinct(kgramsCol(df, c, k))

  /** ALL word n-gram occurrences in order — NOT deduplicated ([[shingles]]
    * is the distinct-set variant): language-model counts need multiplicity.
    * Docs shorter than n words yield none. Same zipped-shifts shape as
    * [[shingles]] (each shift evaluated once per row; never the
    * re-split-per-index interpreted-HOF trap). */
  def ngramTokens(c: Column, n: Int): Column = ngramsFromTokens(words(c), n)

  /** [[ngramTokens]] over an ALREADY-SPLIT token array — the entry point
    * for pipelines that tokenize once and feed several downstream
    * operators (e.g. [[graft.ext.Dedup]]'s ensemble, where MinHash
    * shingles and SimHash word hashes share one persisted token frame
    * instead of each re-splitting the corpus). */
  def ngramsFromTokens(w: Column, n: Int): Column = {
    // each shift aliased to its index: arrays_zip names struct fields
    // after its input expressions, so a NAMED token column (vs the
    // anonymous split() this body historically received) would otherwise
    // surface as a field called "w" and break the positional getField
    val shifted = (0 until n).map {
      case 0 => w.as("0")
      case i => slice(w, lit(i + 1), size(w)).as(s"$i")
    }
    val zipped = arrays_zip(shifted: _*)
    transform(
      filter(zipped, t => t.getField(s"${n - 1}").isNotNull),
      t => concat_ws(" ", (0 until n).map(i => t.getField(s"$i")): _*))
  }

  /** Deterministic content-hash bucket in [0, buckets): md5 of the text,
    * top 15 hex digits (60 bits — fits a signed long exactly on both
    * engines). THE property that makes it the train/dev/test assignment of
    * choice for a corpus pipeline: stable across engines, runs, cluster
    * sizes and partitionings — a doc's split never changes when the corpus
    * around it does, and the DuckDB oracle can PROVE the engine-neutrality
    * (unlike xxhash64/rand splits, which are engine-specific). */
  def hashBucket(c: Column, buckets: Int): Column =
    md5Hash60(c) % buckets

  /** 60-bit md5-derived hash (top 15 hex digits — fits a signed long
    * exactly on both engines): the ENGINE-NEUTRAL sibling of xxhash64 for
    * every hash-valued operator that wants a DuckDB-replayable oracle
    * (`CAST('0x' || substr(md5(x),1,15) AS BIGINT)` reproduces it bit-for-
    * bit). ~2-3× the per-row cost of xxhash64, so hash-parameterized
    * operators default to xxhash64 for production and take this for
    * oracle-verified registrations. */
  def md5Hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Exact Jaccard similarity of two (already-distinct) shingle arrays.
    * Integer set sizes + one double division — bit-identical across engines. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b))
    inter.cast("double") / (size(a) + size(b) - inter)
  }

  /** BPE-ish token count: a GPT-2-style pre-tokenizer regex (contraction
    * suffixes, letter runs, digit runs, punctuation runs, whitespace) —
    * the cheap proxy for "how many BPE tokens will this cost" that
    * training-data pipelines budget with. */
  def bpeTokenCount(c: Column): Column =
    size(regexp_extract_all(c,
      lit("'(?:[sdmt]|ll|ve|re)| ?[\\p{L}]+| ?[\\p{N}]+| ?[^\\s\\p{L}\\p{N}]+"), lit(0)))
      .cast("long")

  /** The PII patterns [[redact]] and [[piiSpanCounts]] share (report and
    * scrub must agree on what counts as PII). Dialect-portable: no
    * backrefs, no lookaround. */
  private val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val longNumPattern = "[0-9]{6,}"

  /** PII-style redaction: email-shaped tokens → [EMAIL], runs of 6+ digits
    * → [NUM]. Pure codegen regexp_replace, no UDF. ONE definition — the
    * standalone query and the release pipeline both call it. */
  def redact(c: Column): Column =
    regexp_replace(
      regexp_replace(c, emailPattern, "[EMAIL]"),
      longNumPattern, "[NUM]")

  /** PII-span inventory — the REPORT side of [[redact]] (same patterns by
    * construction): per-row counts of email-shaped spans and 6+-digit
    * runs, plus a needs-redaction flag. The compliance-dashboard /
    * routing step that decides which slice of a corpus pays the redaction
    * rewrite. Pure codegen regexp counts, zero shuffles. */
  def piiSpanCounts(df: DataFrame, idCol: String,
                    textCol: String = "text"): DataFrame =
    df.select(col(idCol),
      size(regexp_extract_all(col(textCol), lit(emailPattern), lit(0)))
        .cast("long").as("n_email"),
      size(regexp_extract_all(col(textCol), lit(longNumPattern), lit(0)))
        .cast("long").as("n_longnum"))
      .withColumn("needs_redaction",
        col("n_email") > 0 || col("n_longnum") > 0)

  /** Deterministic train/dev/test label (80/10/10) from the content hash —
    * the [[hashBucket]] split every pipeline stage shares. */
  def splitLabel(c: Column): Column = {
    val b = hashBucket(c, 10)
    when(b < 8, "train").when(b === 8, "dev").otherwise("test")
  }

  /** Normalized-text fingerprint: hash over lowercased,
    * whitespace-collapsed text. Two docs differing only in case/spacing get
    * the same fingerprint. `hash` defaults to xxhash64 (fastest); pass
    * [[md5Hash60]] for an engine-neutral fingerprint a DuckDB oracle can
    * replay — the selection logic is identical either way. */
  def fingerprint(c: Column, hash: Column => Column = xxhash64(_)): Column =
    hash(regexp_replace(lower(c), "\\s+", " "))

  /** Winnowing fingerprints (MOSS-style rolling-hash selection): hash every
    * char k-gram, slide a window of `w` consecutive hashes, keep each
    * window's minimum — any substring shared between two docs of length
    * ≥ k+w-1 is GUARANTEED to contribute a shared fingerprint. Returns one
    * (id, fp) row per distinct selected hash.
    *
    * Shape: explode start offsets → per-ROW substr+xxhash64 (whole-stage
    * codegen — NOT a hash inside an interpreted `transform` lambda, which
    * costs ~3× in eval overhead) → sliding min via a window FRAME
    * (current..w-1 following) on one shuffle — no ×w row fan-out, no
    * second explode. Trailing positions (no full window) are filtered
    * AFTER the frame min so short docs keep window 0 = global min. */
  def winnowFingerprints(df: DataFrame, idCol: String, textCol: String,
                         k: Int = 5, w: Int = 4,
                         hash: Column => Column = xxhash64(_)): DataFrame = {
    // native per-row kernel (round 14, guide §2.4): the fingerprint set
    // is a pure per-document fold, so the exploded formulation paid an
    // Exchange(id) of every gram hash plus a WindowExec sliding min plus
    // a distinct — all gone; the kernel's monotonic-deque sliding min is
    // value-identical (pinned by SketchKernelSpec). Unknown hash recipes
    // keep the exploded form.
    knownHashKind(df.sparkSession, hash) match {
      case Some(md5Kind) if hasNativeFn("winnow_fps") =>
        df.select(col(idCol).as("id"),
            explode(call_function("winnow_fps", col(textCol), lit(k), lit(w),
              lit(md5Kind))).as("fp"))
      case _ =>
        import org.apache.spark.sql.expressions.Window
        val grams = df.select(col(idCol).as("id"),
            greatest(length(col(textCol)) - (k - 1), lit(1)).as("n"),
            posexplode(kgramsCol(df, col(textCol), k)).as(Seq("p0", "g")))
          .select(col("id"), col("n"), (col("p0") + 1).as("pos"),
            hash(col("g")).as("h"))
        val frame = Window.partitionBy("id").orderBy("pos")
          .rowsBetween(Window.currentRow, w - 1)
        grams.withColumn("fp", min(col("h")).over(frame))
          .where(col("pos") - 1 <= greatest(col("n") - w, lit(0)))
          .select(col("id"), col("fp")).distinct()
    }
  }

  /** Winnowing overlap candidates — the actual MOSS use case for
    * [[winnowFingerprints]]: pairs of docs sharing at least `minShared`
    * selected fingerprints, i.e. candidate plagiarism/overlap pairs. Any two
    * docs sharing a substring of length ≥ k+w-1 are GUARANTEED to appear
    * (the winnowing guarantee lifts from fingerprints to pairs: the shared
    * window's minimum is selected in both docs).
    *
    * Shape: equality self-join on fp (bucketed — never all-pairs), then one
    * groupBy counting distinct shared fps per ordered pair. `maxDf` drops
    * fingerprints appearing in more than that many docs first (boilerplate
    * grams — headers, license blocks — would otherwise create quadratic
    * buckets; MOSS does the same). The fp table is persisted across the
    * self-join sides and released once the far-smaller pair list
    * materializes. */
  def winnowOverlapPairs(df: DataFrame, idCol: String, textCol: String,
                         k: Int = 5, w: Int = 4, minShared: Long = 2,
                         maxDf: Long = 100, minOverlap: Double = 0.0,
                         hash: Column => Column = xxhash64(_)): DataFrame = {
    val fps = winnowFingerprints(df, idCol, textCol, k, w, hash)
    val rare = fps.groupBy("fp").agg(count(lit(1)).as("df"))
      .where(col("df") <= maxDf).select("fp")
    // persist the RARE fp table: read by both self-join sides AND the
    // per-doc totals; released after the far-smaller pair list materializes
    val rfps = fps.join(rare, "fp").persist()
    val sizes = rfps.groupBy(col("id")).agg(count(lit(1)).as("n_fps"))
    val x = rfps.select(col("fp"), col("id").as("a_id"))
    val y = rfps.select(col("fp"), col("id").as("b_id"))
    val pairs = x.join(y, Seq("fp"))
      .where(col("a_id") < col("b_id"))
      .groupBy("a_id", "b_id").agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= minShared)
      // containment score: shared / smaller side's rare-fp count — the
      // MOSS-style ranking; an absolute count floor alone is corpus-
      // dependent (common-vocabulary corpora share grams everywhere)
      .join(sizes.select(col("id").as("a_id"), col("n_fps").as("a_n")), "a_id")
      .join(sizes.select(col("id").as("b_id"), col("n_fps").as("b_n")), "b_id")
      .select(col("a_id"), col("b_id"), col("n_shared"),
        round(col("n_shared") / least(col("a_n"), col("b_n")), 6).as("overlap"))
      .where(col("overlap") >= minOverlap)
      .ckpt()
    rfps.unpersist()
    pairs
  }

  /** Exact duplicated-span detection across documents (the public
    * "deduplicate long repeated substrings in training data" recipe,
    * reduced to relational algebra): every length-`k` character gram is
    * emitted with its 1-based start, grams match across documents
    * (a_id < b_id), matches on the same alignment DIAGONAL
    * (b_pos − a_pos) merge into maximal runs via gaps-and-islands
    * (island = pos − row_number), and a run of r consecutive positions is
    * a shared span of r + k − 1 characters. Returns (a_id, b_id, a_start,
    * b_start, span_len) for every maximal shared span ≥ `minLen`.
    *
    * 100 TB posture: the gram match is an equality join (on the gram
    * string here so a SQL oracle replays 1:1; hash the gram first at real
    * scale); `maxDf` drops grams present in more than `maxDf` docs BEFORE
    * the join — boilerplate armor bounding fan-out at df² per rare gram,
    * as in [[winnowOverlapPairs]]; the run-merge window partitions by
    * (a_id, b_id, diag) — pair-bounded, never corpus-wide. (a_pos, diag)
    * is structurally unique per pair — one gram per position — so the
    * row_number island trick needs no dedup. */
  def duplicatedSpans(df: DataFrame, idCol: String, textCol: String,
                      k: Int = 30, minLen: Int = 40,
                      maxDf: Long = 20): DataFrame = {
    // the gram string is used ONLY as an equality key from here on —
    // hash it to 8 bytes BEFORE the shuffle (round 14, guide §2.3; the
    // "hash the gram first at real scale" note below, now done): the
    // gram table shuffles ~(len−k+1) rows per document, each previously
    // carrying a k=30-byte string. A 64-bit collision between distinct
    // grams can only add an isolated diagonal point, which the
    // span_len ≥ minLen run filter drops (a run needs ≥ minLen−k+1
    // CONSECUTIVE same-diagonal positions); output equality is verified
    // against the string-keyed oracle on every checked corpus.
    val grams = df.where(length(col(textCol)) >= k)
      .select(col(idCol).as("id"),
        posexplode(kgramsCol(df, col(textCol), k)).as(Seq("off", "gram0")))
      .select(col("id"), (col("off") + 1).as("pos"),
        xxhash64(col("gram0")).as("gram"))
    // ONE pass over the gram table: group occurrences per gram (single
    // shuffle), df-filter on distinct docs inside the same aggregate, and
    // generate cross-document position pairs by double-explode IN PLACE —
    // the self-join formulation scanned and shuffled the gram table twice
    // more (df agg + join-back) for the identical pair set. Per-gram group size is bounded by maxDf
    // docs × per-doc occurrences; under extreme single-doc gram repetition
    // (pathological boilerplate) a spill-safe self-join beats the in-row
    // array — that variant is exactly the previous formulation.
    // df-filter as a per-group array op, NOT a countDistinct alongside the
    // collect_list: mixing a distinct and a non-distinct aggregate plans an
    // Expand that doubles every input row through the shuffle (measured:
    // the pair stage halves without it)
    val m = grams
      .groupBy("gram")
      .agg(collect_list(struct(col("id"), col("pos"))).as("items"))
      .where(size(array_distinct(
        transform(col("items"), x => x.getField("id")))) <= maxDf)
      .select(explode(col("items")).as("a"), col("items"))
      .select(col("a"), explode(col("items")).as("b"))
      .where(col("a.id") < col("b.id"))
      .select(col("a.id").as("a_id"), col("b.id").as("b_id"),
        col("a.pos").as("a_pos"),
        (col("b.pos") - col("a.pos")).as("diag"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("a_id", "b_id", "diag").orderBy("a_pos")
    val spans = m.withColumn("island", col("a_pos") - row_number().over(w))
      .groupBy("a_id", "b_id", "diag", "island")
      .agg(min("a_pos").as("a_start"),
        (max("a_pos") - min("a_pos") + k).as("span_len"))
      .where(col("span_len") >= minLen)
      .select(col("a_id"), col("b_id"),
        col("a_start").cast("long").as("a_start"),
        (col("a_start") + col("diag")).cast("long").as("b_start"),
        col("span_len").cast("long").as("span_len"))
    spans
  }

  /** Exact duplicated-span REMOVAL — the action paired with
    * [[duplicatedSpans]] detection (the public "deduplicate long repeated
    * substrings, keep one occurrence" training-data recipe): every maximal
    * cross-document shared span ≥ `minLen` is cut from the HIGHER-id
    * document of each pair, so the minimum-id occurrence survives
    * corpus-wide (for a span shared by docs {1,2,3}, pairs (1,2),(1,3),
    * (2,3) remove it from 2 and 3; doc 1 keeps it). Within-document
    * repetitions are out of scope (detection pairs are cross-document).
    *
    * Shape: per-doc removal intervals are MERGED (gaps-and-islands on the
    * running max end — overlapping/adjacent spans collapse), then each
    * document's kept segments are rebuilt with one codegen `aggregate`
    * fold over its sorted interval array — per-doc bounded, no corpus-wide
    * state, no UDF. Returns (id, textCol) with untouched docs passed
    * through. 100 TB posture: interval count per doc is span-pair-bounded
    * and the only shuffles are the detection join plus one per-doc
    * groupBy. */
  def removeDuplicatedSpans(df: DataFrame, idCol: String, textCol: String,
                            k: Int = 30, minLen: Int = 40,
                            maxDf: Long = 20): DataFrame = {
    val spans = duplicatedSpans(df, idCol, textCol, k, minLen, maxDf)
    val iv = spans.select(col("b_id").as("id"),
      col("b_start").cast("int").as("s"),
      (col("b_start") + col("span_len")).cast("int").as("e"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("id").orderBy("s", "e")
    val wPrev = w.rowsBetween(org.apache.spark.sql.expressions.Window
      .unboundedPreceding, -1)
    val merged = iv
      // new island iff this interval starts past every earlier end
      .withColumn("ni", when(col("s") > coalesce(max(col("e")).over(wPrev),
        lit(-1)), 1).otherwise(0))
      .withColumn("island", sum(col("ni")).over(w))
      .groupBy("id", "island").agg(min("s").as("s"), max("e").as("e"))
    val ivs = merged.groupBy("id")
      .agg(sort_array(collect_list(struct(col("s"), col("e")))).as("ivs"))
    val text = col(textCol)
    val folded = aggregate(col("ivs"),
      struct(lit(1).as("pos"), lit("").as("txt")),
      (acc, x) => struct(
        x.getField("e").as("pos"),
        concat(acc.getField("txt"),
          text.substr(acc.getField("pos"),
            x.getField("s") - acc.getField("pos"))).as("txt")),
      acc => concat(acc.getField("txt"),
        text.substr(acc.getField("pos"),
          length(text) - acc.getField("pos") + 1)))
    df.join(ivs, df(idCol) === ivs("id"), "left")
      .select(df(idCol),
        when(col("ivs").isNull, text).otherwise(folded).as(textCol))
  }

  /** DuckDB CTE chain replaying [[removeDuplicatedSpans]] over `table` —
    * composable (no leading WITH): detection (gram table → diagonal runs),
    * b-side interval merge, ordered string_agg rebuild. The final CTE
    * `cleaned` is ($idCol, text) with untouched docs passed through.
    * MATERIALIZED where a CTE is referenced more than once. */
  def spanCleanOracleCtes(table: String, idCol: String, textCol: String,
                          k: Int, minLen: Int, maxDf: Long): String =
    s"""g AS (
       |  SELECT $idCol AS id, i AS pos, substr($textCol, i, $k) AS gram
       |  FROM $table, unnest(generate_series(1, length($textCol) - ${k - 1})) AS t(i)
       |  WHERE length($textCol) >= $k
       |), rare AS (
       |  SELECT gram FROM g GROUP BY gram HAVING COUNT(DISTINCT id) <= $maxDf
       |), r AS MATERIALIZED (SELECT g.* FROM g JOIN rare USING (gram)
       |), m AS (
       |  SELECT a.id AS a_id, b.id AS b_id, a.pos AS a_pos,
       |    b.pos - a.pos AS diag
       |  FROM r a JOIN r b ON a.gram = b.gram AND a.id < b.id
       |), isl AS (
       |  SELECT a_id, b_id, diag, a_pos,
       |    a_pos - row_number() OVER (PARTITION BY a_id, b_id, diag
       |                               ORDER BY a_pos) AS island
       |  FROM m
       |), spans AS (
       |  SELECT a_id, b_id, a_start, a_start + diag AS b_start, span_len
       |  FROM (
       |    SELECT a_id, b_id, diag, MIN(a_pos) AS a_start,
       |      MAX(a_pos) - MIN(a_pos) + $k AS span_len
       |    FROM isl GROUP BY a_id, b_id, diag, island)
       |  WHERE span_len >= $minLen
       |), iv AS (
       |  SELECT b_id AS id, b_start AS s, b_start + span_len AS e FROM spans
       |), mi AS (
       |  SELECT id, s, e, CASE WHEN s > COALESCE(
       |      MAX(e) OVER (PARTITION BY id ORDER BY s, e
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
       |    THEN 1 ELSE 0 END AS ni
       |  FROM iv
       |), isl2 AS (
       |  SELECT id, s, e,
       |    SUM(ni) OVER (PARTITION BY id ORDER BY s, e) AS island
       |  FROM mi
       |), mrg AS MATERIALIZED (
       |  SELECT id, island, MIN(s) AS s, MAX(e) AS e
       |  FROM isl2 GROUP BY id, island
       |), segs AS (
       |  SELECT id, COALESCE(LAG(e) OVER (PARTITION BY id ORDER BY s), 1)
       |    AS ks, s AS ke
       |  FROM mrg
       |  UNION ALL
       |  SELECT id, MAX(e) AS ks, NULL AS ke FROM mrg GROUP BY id
       |), cln AS (
       |  SELECT segs.id,
       |    string_agg(substr(d.$textCol, CAST(ks AS INT),
       |      CAST(COALESCE(ke, length(d.$textCol) + 1) - ks AS INT)),
       |      '' ORDER BY ks) AS text
       |  FROM $table d JOIN segs ON segs.id = d.$idCol
       |  GROUP BY segs.id
       |), cleaned AS MATERIALIZED (
       |  SELECT d.$idCol, COALESCE(c.text, d.$textCol) AS text
       |  FROM $table d LEFT JOIN cln c ON c.id = d.$idCol
       |)""".stripMargin

  /** Per-language marker stopwords for the n-gram/stopword language-ID
    * heuristic. Public knowledge (common function words). */
  val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "es" -> Seq("el", "la", "de", "y", "es"),
    "fr" -> Seq("le", "la", "de", "et", "est"),
    "zh" -> Seq("的", "是", "了"))

  /** Language-ID heuristic: count marker-word hits per language, take the
    * argmax (ties broken lexicographically-last via struct max — fully
    * deterministic), fall back to "und" when nothing matches. */
  def langId(c: Column): Column = {
    val toks = words(lower(c))
    val scored = langMarkers.toSeq.sortBy(_._1).map { case (lang, markers) =>
      struct(
        size(filter(toks, w => w.isin(markers: _*))).as("hits"),
        lit(lang).as("lang"))
    }
    val best = array_max(array(scored: _*))
    when(best.getField("hits") === 0, lit("und")).otherwise(best.getField("lang"))
  }

  /** Marker-hit ratio for the best language (diagnostic score for langId). */
  def langScore(c: Column): Column = {
    val toks = words(lower(c))
    val scored = langMarkers.toSeq.sortBy(_._1).map { case (_, markers) =>
      size(filter(toks, w => w.isin(markers: _*)))
    }
    greatest(scored: _*).cast("double") / size(toks)
  }

  private val stopwords = Seq("the", "a", "of", "and", "is")

  /** Quality-scoring columns (heuristic, oracle-replicable arithmetic):
    * token count, mean token length, stopword ratio, and a bounded linear
    * quality score. Appended to the input row. */
  def qualityColumns(df: DataFrame, textCol: String): DataFrame = {
    val c = col(textCol)
    val nTokens = tokenCount(c)
    val meanTokLen =
      length(regexp_replace(c, " ", "")).cast("double") / nTokens
    val stopRatio =
      size(filter(words(c), w => w.isin(stopwords: _*))).cast("double") / nTokens
    df.withColumn("n_tokens", nTokens)
      .withColumn("mean_tok_len", meanTokLen)
      .withColumn("stop_ratio", stopRatio)
      .withColumn("q_score",
        least(col("n_tokens") / 100.0, lit(1.0)) * 0.5 +
          (lit(1.0) - least(col("stop_ratio") * 2.0, lit(1.0))) * 0.3 +
          least(col("mean_tok_len") / 8.0, lit(1.0)) * 0.2)
  }

  /** Per-source hapax legomena profile: vocabulary size, token total, and
    * the count/share of once-occurring types — the classic lexical-richness
    * signal (a machine-generated or template-heavy source shows an
    * abnormally LOW hapax share; OCR noise shows an abnormally high one).
    * Counts exact; the ratio is one int/int double division. One token
    * explode + two partial-aggregable aggregations, vocabulary-sized
    * shuffle. */
  def hapax(docs: DataFrame, srcCol: String = "source"): DataFrame = {
    val wc = docs
      .select(col(srcCol).as("source"), explode(words(col("text"))).as("w"))
      .groupBy("source", "w").agg(count(lit(1)).as("c"))
    wc.groupBy("source").agg(
      count(lit(1)).as("n_types"),
      sum(col("c")).as("n_tokens"),
      sum(when(col("c") === 1, 1L).otherwise(0L)).as("n_hapax"))
      .withColumn("hapax_ratio",
        col("n_hapax").cast("double") / col("n_types"))
  }

  /** Per-source Gini coefficient of the token-frequency distribution —
    * the concentration gauge complementing [[hapax]]'s richness ratio: a
    * template/boilerplate-heavy source concentrates its token mass in few
    * types (Gini → 1), diverse prose spreads it (lower Gini). Computed on
    * ascending-sorted frequencies f₍₁₎ ≤ … ≤ f₍ₙ₎ as
    * G = (2·Σ i·f₍ᵢ₎ − (n+1)·Σf) / (n·Σf) — every term an EXACT integer
    * (products in 38-digit decimals so a 100 TB vocabulary cannot
    * overflow), ONE double division at the end, r6-rounded. Ties rank
    * deterministically by (freq, token); Gini is tie-order-insensitive
    * anyway (equal f values contribute the same Σ i·f over any
    * permutation of their ranks... summed across the tied block), so the
    * tiebreak is for the replay, not the value.
    *
    * Plan: token explode → (source, token) count, one per-source window
    * rank over the VOCABULARY (not the corpus — zipf keeps per-source
    * vocabularies bounded), one partial-aggregable final aggregation. */
  def tokenGini(docs: DataFrame, srcCol: String = "source"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wc = docs
      .select(col(srcCol).as("source"), explode(words(col("text"))).as("w"))
      .groupBy("source", "w").agg(count(lit(1)).as("c"))
    val dec = (x: Column) => x.cast("decimal(38,0)")
    val ranked = wc.withColumn("rk", row_number().over(
      Window.partitionBy("source").orderBy(col("c"), col("w"))))
    ranked.groupBy("source").agg(
      count(lit(1)).as("n_types"),
      sum(col("c")).as("n_tokens"),
      sum(dec(col("rk")) * dec(col("c"))).as("__srf"))
      .select(col("source"), col("n_types"), col("n_tokens"),
        Timeseries.r6(
          (lit(2) * col("__srf") - dec(col("n_types") + 1) * dec(col("n_tokens")))
            .cast("double")
            / (dec(col("n_types")) * dec(col("n_tokens"))).cast("double"))
          .as("gini"))
  }

  /** Grouped corpus statistics per (lang, source): doc count, exact char
    * and token sums. Map-side partial aggregation applies; one shuffle on
    * the two low-cardinality keys. */
  def textStats(docs: DataFrame): DataFrame =
    docs.groupBy("lang", "source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).cast("long").as("sum_chars"),
        sum(tokenCount(col("text"))).cast("long").as("sum_tokens"))

  /** Term frequencies: explode tokens → count per (lang, token). The heavy
    * hitter of text analytics; shuffles once on the grouping key. */
  def termFrequencies(docs: DataFrame, minCount: Long = 2): DataFrame =
    docs.select(col("lang"), explode(words(col("text"))).as("token"))
      .groupBy("lang", "token")
      .agg(count(lit(1)).as("tf"))
      .where(col("tf") >= minCount)

  /** TF-IDF per (doc, token): tf · ln(N/df), rounded to 6 decimals (ln is
    * IEEE-identical across engines; rounding absorbs the product ulp).
    * Two token passes (tf and df aggregations) + a shuffle join on token;
    * the corpus size joins in as a broadcast 1-row frame — no driver
    * action, the whole plan stays lazy. `minTf` bounds the output to
    * repeated terms. */
  def tfIdf(docs: DataFrame, idCol: String = "doc_id", minTf: Long = 2): DataFrame = {
    val tok = docs.select(col(idCol), explode(words(col("text"))).as("token"))
    val tf = tok.groupBy(idCol, "token").agg(count(lit(1)).as("tf"))
      .where(col("tf") >= minTf)
    val dfreq = tok.groupBy("token").agg(countDistinct(col(idCol)).as("df"))
    val n = docs.agg(count(lit(1)).cast("double").as("n_docs"))
    tf.join(dfreq, "token")
      .crossJoin(broadcast(n))
      .select(col(idCol), col("token"),
        round(col("tf") * log(col("n_docs") / col("df")), 6).as("tfidf"))
  }

  /** Inverted index: (token, doc_id, tf) postings — the search-side twin of
    * [[termFrequencies]], and the precursor every keyword-level corpus
    * operation (search, contamination lookup, boolean filtering) builds on.
    * One explode + one shuffle on (token, doc_id); at scale this is the
    * write-once artifact you persist bucketed by token so term lookups
    * become single-bucket scans. */
  def invertedIndex(docs: DataFrame, idCol: String = "doc_id"): DataFrame =
    docs.select(col(idCol).as("doc_id"), explode(words(col("text"))).as("token"))
      .groupBy("token", "doc_id")
      .agg(count(lit(1)).as("tf"))

  /** Conjunctive (AND) keyword search over an inverted index: documents
    * containing ALL of `terms`, ranked by summed term frequency (ties to
    * the smaller doc_id). The token IN-list prunes the index scan to the
    * query's postings; the group-count-equals-arity trick implements AND
    * without |terms| self-joins; top-k plans as per-partition limits +
    * merge, never a global sort. */
  def searchAnd(index: DataFrame, terms: Seq[String], k: Int = 20): DataFrame = {
    val distinctTerms = terms.distinct
    index.where(col("token").isin(distinctTerms: _*))
      .groupBy("doc_id")
      .agg(countDistinct(col("token")).as("__hits"), sum(col("tf")).as("score"))
      .where(col("__hits") === distinctTerms.size)
      .select(col("doc_id"), col("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }

  /** Reciprocal-rank fusion (Cormack, Clarke & Buettcher, "Reciprocal
    * rank fusion outperforms Condorcet and individual rank learning
    * methods", SIGIR'09): merge several top-k rankings into one list by
    * RRF(d) = Σ_lists 1/(k0 + rank_list(d)) — the standard score-free
    * fusion for hybrid search (BM25 + dense, here BM25 + boolean).
    * Each input must carry (`idCol`, `score`); ranks are derived as
    * (score desc, id asc) so ties are deterministic. Returns
    * (`idCol`, rrf, n_lists), rrf rounded at one site.
    *
    * The rank windows are global but run over ALREADY top-k-bounded
    * lists (≤ k rows each — that is what a ranking is), so the
    * single-partition sort is constant-sized at any corpus scale. */
  def rrfFuse(rankings: Seq[DataFrame], k0: Int = 60,
              idCol: String = "doc_id"): DataFrame = {
    require(rankings.nonEmpty, "need at least one ranking")
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(col("score").desc, col(idCol).asc)
    val ranked = rankings.map(
      _.withColumn("__r", row_number().over(w).cast("long"))
        .select(col(idCol), col("__r")))
    ranked.reduce(_.unionByName(_))
      .groupBy(col(idCol))
      .agg((floor(sum(lit(1.0) / (lit(k0.toDouble) + col("__r"))) * 1e6
        + 0.5) / 1e6).as("rrf"),
        count(lit(1)).as("n_lists"))
  }

  /** Sliding-window document chunking — the context-window splitter every
    * RAG / pretraining pipeline runs between cleaning and embedding:
    * each doc becomes overlapping windows of `chunkTokens` tokens whose
    * starts step by `stride` (overlap = chunkTokens − stride). Distinct
    * from [[Packing.packChunks]], which CONCATENATES docs into fixed
    * budgets; this splits WITHIN docs.
    *
    * A window whose tokens are all contained in the previous window (the
    * tail of a short doc) is dropped — every emitted chunk contributes at
    * least one new token, and a doc shorter than `chunkTokens` emits
    * exactly one chunk (start 0). Plan: tokenize once, explode the start
    * sequence, slice per row — pure map-side work, zero shuffles, so the
    * operator scales with input bytes alone. */
  def chunkDocs(docs: DataFrame, idCol: String = "doc_id",
                chunkTokens: Int = 128, stride: Int = 96): DataFrame = {
    require(stride >= 1 && stride <= chunkTokens,
      s"stride must be in [1, chunkTokens] (got $stride for $chunkTokens)")
    docs
      .select(col(idCol).as("doc_id"), words(col("text")).as("__w"),
        tokenCount(col("text")).as("__n"))
      .select(col("doc_id"), col("__w"), col("__n"),
        explode(sequence(lit(0L), col("__n") - 1, lit(stride.toLong)))
          .as("tok_start"))
      .where(col("tok_start") === 0 ||
        col("tok_start") + lit((chunkTokens - stride).toLong) < col("__n"))
      .select(col("doc_id"),
        (col("tok_start") / stride).cast("long").as("chunk_id"),
        col("tok_start"),
        size(slice(col("__w"), col("tok_start") + 1, lit(chunkTokens)))
          .cast("long").as("n_tokens"),
        array_join(slice(col("__w"), col("tok_start") + 1, lit(chunkTokens)), " ")
          .as("chunk_text"))
  }

  /** BM25-ranked disjunctive (OR) keyword search — the scoring twin of
    * [[searchAnd]] and the ranking every retrieval stack defaults to:
    * score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl)) with
    * idf(t) = ln(1 + (N−df+0.5)/(df+0.5)) (the Robertson/Sparck-Jones
    * plus-one form, always positive).
    *
    * Plan: the exploded token stream filters to the query terms BEFORE the
    * (token, doc_id) aggregation, so the only full-width shuffle carries
    * query-term postings, not the corpus. df arrives as a broadcast
    * (|terms| rows); N and avgdl as a broadcast 1-row frame; per-doc
    * length is a scan-level `size(split(...))` — no second explode.
    * avgdl is sum(long)/count (exact, associative) rather than avg(double)
    * (accumulation-order-dependent), so the score is engine-identical;
    * the final per-doc sum is rounded to 6 decimals to absorb ulp order.
    * Top-k plans as TakeOrderedAndProject (per-partition limits + merge),
    * never a global sort. */
  def searchBM25(docs: DataFrame, terms: Seq[String], idCol: String = "doc_id",
                 k: Int = 20, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val ts = terms.distinct
    val post = docs
      .select(col(idCol).as("doc_id"), explode(words(col("text"))).as("token"))
      .where(col("token").isin(ts: _*))
      .groupBy("token", "doc_id").agg(count(lit(1)).as("tf"))
    val dfreq = post.groupBy("token").agg(count(lit(1)).as("df"))
    val dl = docs.select(col(idCol).as("doc_id"), tokenCount(col("text")).as("dl"))
    val stats = docs.agg(
      count(lit(1)).cast("double").as("n_docs"),
      (sum(tokenCount(col("text"))).cast("double") /
        count(lit(1))).as("avgdl"))
    post.join(broadcast(dfreq), "token")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .groupBy("doc_id")
      .agg(round(sum(
        log(lit(1.0) + (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5)) *
          (col("tf") * (lit(k1) + 1.0)) /
          (col("tf") + lit(k1) * (lit(1.0) - b + lit(b) * col("dl") / col("avgdl")))),
        6).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }

  /** Per-document bigram cross-entropy against the corpus's own add-one-
    * smoothed bigram LM — the KenLM-style quality filter LLM pipelines run
    * (a doc whose word transitions are improbable under the corpus LM is
    * boilerplate, spam, or the wrong language). p(w2|w1) = (c(w1 w2)+1) /
    * (c(w1)+V) within each lang; the score is −avg ln p over the doc's
    * bigrams (exp of it is perplexity). Docs under 2 tokens have no
    * bigrams and drop out.
    *
    * Plan: three count aggregations over the exploded token stream
    * (bigram, unigram, vocab) joined back to the per-doc bigrams — all
    * shuffled equality joins on (lang, gram); the vocab side is one row
    * per lang (broadcast). No driver materialization, so the same plan
    * holds when the LM table has 10^9 rows. Rounded to 6 decimals: avg's
    * accumulation order and libm-vs-Math.log differ across engines in the
    * last ulp only. */
  def crossEntropyScores(docs: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val db = docs.select(col(idCol), col("lang"),
        explode(ngramTokens(col("text"), 2)).as("bigram"))
      .withColumn("w1", substring_index(col("bigram"), " ", 1))
    val uni = docs.select(col("lang"), explode(words(col("text"))).as("w1"))
      .groupBy("lang", "w1").agg(count(lit(1)).as("cu"))
    val vocab = uni.groupBy("lang").agg(count(lit(1)).as("v"))
    val bi = db.groupBy("lang", "bigram").agg(count(lit(1)).as("cb"))
    db.join(bi, Seq("lang", "bigram"))
      .join(uni, Seq("lang", "w1"))
      .join(broadcast(vocab), Seq("lang"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_bigrams"),
        round(avg(-log((col("cb") + lit(1)).cast("double") /
          (col("cu") + col("v")).cast("double"))), 6).as("cross_entropy"))
  }

  /** Pointwise mutual information of adjacent word pairs per language —
    * the collocation-mining score (Church & Hanks, "Word Association
    * Norms, Mutual Information, and Lexicography") a pipeline uses to
    * promote multi-word expressions ("new york", "machine learning") into
    * single tokenizer units. pmi = ln(p(w1 w2) / (p(w1)·p(w2))) with
    * p(w1 w2) = c(bigram)/N_bigrams and p(w) = c(w)/N_tokens, computed as
    * ln(cb·nt² / (nb·c1·c2)) so there is exactly one rounding site.
    * `minCount` drops rare bigrams whose PMI is noise (the classic
    * low-frequency PMI pathology: a pair seen once scores highest).
    *
    * Plan: two count aggregations over the exploded token stream (bigram,
    * unigram), per-lang totals reduced from those SAME count tables (one
    * row per lang — broadcast), then two equality joins back on
    * (lang, word). No driver state; the unigram join side is the
    * vocabulary, not the corpus, so the shape holds at 10^9 tokens. */
  def pmiScores(docs: DataFrame, minCount: Long = 5): DataFrame = {
    val bc = docs.select(col("lang"),
        explode(ngramTokens(col("text"), 2)).as("bigram"))
      .groupBy("lang", "bigram").agg(count(lit(1)).as("cb"))
    val uc = docs.select(col("lang"), explode(words(col("text"))).as("w"))
      .groupBy("lang", "w").agg(count(lit(1)).as("cu"))
    val nb = bc.groupBy("lang").agg(sum("cb").cast("double").as("nb"))
    val nt = uc.groupBy("lang").agg(sum("cu").cast("double").as("nt"))
    bc.where(col("cb") >= minCount)
      .withColumn("w1", substring_index(col("bigram"), " ", 1))
      .withColumn("w2", substring_index(col("bigram"), " ", -1))
      .join(uc.select(col("lang"), col("w").as("w1"), col("cu").as("c1")),
        Seq("lang", "w1"))
      .join(uc.select(col("lang"), col("w").as("w2"), col("cu").as("c2")),
        Seq("lang", "w2"))
      .join(broadcast(nb), Seq("lang"))
      .join(broadcast(nt), Seq("lang"))
      .select(col("lang"), col("bigram"), col("cb").as("n"),
        round(log(col("cb").cast("double") * col("nt") * col("nt") /
          (col("nb") * col("c1") * col("c2"))), 6).as("pmi"))
  }

  /** Per-source distribution drift: KL(P_source ‖ P_corpus) over unigram
    * distributions — the monitor a corpus-mixing pipeline runs to spot a
    * source whose content shifted (a crawl that started returning error
    * pages, a dump whose language mix moved). KL = Σ_w p_s(w)·ln(p_s(w)/
    * p_c(w)), summed over the source's words only (p_s(w) = 0 terms are 0
    * by convention; p_c(w) > 0 whenever p_s(w) > 0 since the corpus
    * contains the source). Each term is factored ln(cs·n/(ns·cw)) — one
    * expression shape both engines evaluate identically before the single
    * final rounding.
    *
    * Plan: one exploded-token scan feeding two count aggregations (per
    * (source, word), per word), per-source totals reduced from the first
    * (broadcast, one row per source) and the corpus total from the second
    * (broadcast, one row). The join back is on the VOCABULARY, not the
    * corpus, so the shape holds at 10^9 tokens. */
  def sourceDrift(docs: DataFrame, srcCol: String = "source"): DataFrame = {
    val tok = docs.select(col(srcCol).as("source"),
      explode(words(col("text"))).as("w"))
    val sc = tok.groupBy("source", "w").agg(count(lit(1)).as("cs"))
    val cw = tok.groupBy("w").agg(count(lit(1)).as("cw"))
    val ns = sc.groupBy("source").agg(sum("cs").cast("double").as("ns"))
    val n = cw.agg(sum("cw").cast("double").as("n"))
    sc.join(cw, Seq("w"))
      .join(broadcast(ns), Seq("source"))
      .crossJoin(broadcast(n))
      .groupBy("source")
      .agg(round(sum((col("cs") / col("ns")) *
        log(col("cs") * col("n") / (col("ns") * col("cw")))), 6).as("kl"))
  }

  /** Dunning G² log-likelihood keyness (Dunning, "Accurate methods for
    * the statistics of surprise and coincidence", Computational
    * Linguistics 1993): for every vocabulary term, how surprisingly often
    * it appears in the `target` subcorpus vs the rest — the corpus-
    * comparison statistic keyword/register analysis uses where PMI
    * over-rewards rare terms and raw frequency ignores base rates.
    *
    * With a = count in target, b = count elsewhere, N₁/N₂ the subcorpus
    * token totals: G² = 2·(a·ln(a·N/(N₁·(a+b))) + b·ln(b·N/(N₂·(a+b)))),
    * zero-count cells contributing 0. `direction` is +1 when the term is
    * over-represented in the target (a·N₂ ≥ b·N₁, exact integer
    * cross-multiply in 38-digit decimals), −1 otherwise. Counts are exact;
    * G² has ONE rounding site (5 dp) over the same factored expression on
    * both engines. The denominators multiply in DOUBLE (N₁·(a+b) can
    * overflow 64-bit at corpus scale; the quotient is far from the ln
    * branch cut, so the double product is safe).
    *
    * Plan: one exploded-token scan, one vocabulary aggregation (the two
    * cells come from conditional sums — no second pass), totals reduced to
    * a broadcast 1-row frame; everything after the explode joins on the
    * VOCABULARY. `minCount` bounds the output to analyzable terms. */
  def keyness(docs: DataFrame, groupCol: String, target: String,
              minCount: Long = 20, textCol: String = "text"): DataFrame = {
    val tok = docs.select((col(groupCol) === lit(target)).as("__t"),
      explode(words(col(textCol))).as("w"))
    val cells = tok.groupBy("w").agg(
      sum(when(col("__t"), 1L).otherwise(0L)).as("a"),
      sum(when(col("__t"), 0L).otherwise(1L)).as("b"))
      .where(col("a") + col("b") >= minCount)
    val totals = tok.agg(
      sum(when(col("__t"), 1L).otherwise(0L)).as("n1"),
      sum(when(col("__t"), 0L).otherwise(1L)).as("n2"))
    def cell(x: Column, nx: Column): Column =
      when(x > 0, x.cast("double") *
        log(x.cast("double") * (col("n1") + col("n2")) /
          (nx.cast("double") * (col("a") + col("b")))))
        .otherwise(lit(0.0))
    cells.crossJoin(broadcast(totals))
      .select(col("w").as("token"), col("a").as("n_target"),
        col("b").as("n_rest"),
        (floor(lit(2.0) * (cell(col("a"), col("n1")) +
          cell(col("b"), col("n2"))) * 100000 + 0.5) / 100000.0).as("g2"),
        when(col("a").cast("decimal(19,0)") * col("n2") >=
          col("b").cast("decimal(19,0)") * col("n1"), 1L)
          .otherwise(-1L).as("direction"))
  }

  /** Apply a trained linear classifier (logistic regression — the
    * fastText-style quality-classifier shape) to per-row features:
    * sigmoid(bias + Σ wᵢ·fᵢ), rounded to 6 decimals (exp differs across
    * libm implementations in the last ulp only). The weights arrive as
    * literals — model application is a pure projection, zero shuffles,
    * fully codegen'd; at 100 TB this is exactly how a quality-classifier
    * sweep should run, with the model broadcast as constants rather than
    * a per-row UDF closure. */
  def scoreLinear(features: Seq[(Column, Double)], bias: Double): Column = {
    val z = features.foldLeft(lit(bias)) { case (acc, (f, w)) =>
      acc + f * lit(w)
    }
    round(lit(1.0) / (lit(1.0) + exp(-z)), 6)
  }

  /** Aggressive text normalization — the canonical first pass of corpus
    * cleaning (lowercase, strip non-alphanumerics, collapse whitespace
    * runs, trim), the step that makes exact dedup catch case/punctuation
    * variants of one document. Pure codegen regexp work, zero shuffles;
    * the patterns stick to literal classes (`[^a-z0-9 ]`, `' +'`) that the
    * Java and RE2 regex dialects read identically, so a DuckDB oracle
    * replays the transform byte-for-byte. */
  def normalizeText(c: Column): Column =
    trim(regexp_replace(regexp_replace(lower(c), "[^a-z0-9 ]", ""), " +", " "))

  /** Homoglyph/confusable folding — the spam-evasion counter in a corpus
    * cleaning pipeline: adversarial or OCR'd text swaps Latin letters for
    * visually-identical Cyrillic/Greek/fullwidth codepoints and hides
    * zero-width characters, which defeats exact AND shingle dedup (every
    * shingle containing a swapped char misses). One codegen `translate`
    * pass: confusables map to their Latin ASCII targets, zero-width
    * characters (ZWSP/ZWNJ/ZWJ/BOM) delete (both Spark and DuckDB
    * `translate` are codepoint-based and drop source chars beyond the
    * target string — verified semantics, so an oracle replays this
    * byte-for-byte). The map covers the high-frequency lowercase
    * confusables; extend the two strings in lockstep for fuller Unicode
    * TR39 coverage. */
  val confusablesFrom: String =
    "\u0430\u0435\u0456\u043e\u0440\u0441\u0443\u0445" + // Cyrillic a e i o p c y x lookalikes
    "\u03bf\u03b1" +                             // Greek omicron, alpha
    "\uff41\uff45\uff4f" +                      // fullwidth a e o
    "\u200b\u200c\u200d\ufeff"                 // zero-width: deleted
  val confusablesTo: String = "aeiopcyx" + "oa" + "aeo"
  def foldConfusables(c: Column): Column =
    translate(c, confusablesFrom, confusablesTo)

  /** Per-occurrence positional postings (doc_id, pos, token), zero-based —
    * the positional twin of [[invertedIndex]] that phrase and proximity
    * search need. Pure explode, no shuffle; at scale this is the artifact
    * you persist bucketed by token so term lookups are single-bucket scans. */
  def positionalIndex(docs: DataFrame, idCol: String = "doc_id"): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      posexplode(words(col("text")))).toDF("doc_id", "pos", "token")

  /** Keyword-in-context (KWIC): every occurrence of `term` with its
    * ±`window`-token context — the snippet/context-extraction step after
    * search ranks documents, and the targeted-curation primitive ("give me
    * every context this token appears in") for building focused training
    * sets. Tokenize once, explode with position, slice the SAME token
    * array per hit — map-side only, zero shuffles; output size is the hit
    * count × window, not the corpus. */
  def keywordInContext(docs: DataFrame, term: String, window: Int = 3,
                       idCol: String = "doc_id"): DataFrame = {
    require(window >= 0, s"window must be >= 0 (got $window)")
    val start = greatest(col("pos") + 1 - window, lit(1))
    val end = least(col("pos") + 1 + window, size(col("__w")))
    docs.select(col(idCol).as("doc_id"), words(col("text")).as("__w"))
      .select(col("doc_id"), col("__w"),
        posexplode(col("__w")).as(Seq("pos", "token")))
      .where(col("token") === term)
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        array_join(slice(col("__w"), start, end - start + 1), " ").as("ctx"))
  }

  /** Exact consecutive-token phrase search, ranked by occurrence count
    * (ties to the smaller doc_id).
    *
    * One explode + two shuffles instead of |phrase| positional self-joins:
    * an occurrence of phrase token i at position p votes for anchor p − i,
    * and an anchor that collects ALL |phrase| distinct offsets is a phrase
    * occurrence. A phrase with repeated tokens stays correct because one
    * posting votes once per offset at which its token appears. The token
    * IN-list prunes the postings before any shuffle, so cost tracks the
    * query terms' postings, not the corpus; top-k plans as
    * TakeOrderedAndProject (per-partition limit + merge), never a global
    * sort. */
  def searchPhrase(docs: DataFrame, phrase: Seq[String], k: Int = 20,
                   idCol: String = "doc_id"): DataFrame = {
    require(phrase.nonEmpty && phrase.length <= 63,
      s"phrase must have 1..63 tokens (got ${phrase.length})")
    val offsets = phrase.zipWithIndex.groupMap(_._1)(_._2)
    val offMap = map(offsets.toSeq.flatMap { case (t, os) =>
      Seq(lit(t), array(os.map(lit(_)): _*))
    }: _*)
    // offsets-seen as a bitmask: bit_or is a plain single-pass aggregate,
    // where countDistinct(off) would plan as an Expand + two aggregate
    // levels per shuffle — same semantics (offsets are < 63), one fewer
    // aggregation pass
    val fullMask = (1L << phrase.length) - 1
    positionalIndex(docs, idCol)
      .where(col("token").isin(phrase.distinct: _*))
      .select(col("doc_id"), col("pos"),
        explode(element_at(offMap, col("token"))).as("off"))
      .where(col("pos") >= col("off"))
      .groupBy(col("doc_id"), (col("pos") - col("off")).as("anchor"))
      .agg(bit_or(expr("shiftleft(CAST(1 AS BIGINT), off)")).as("mask"))
      .where(col("mask") === fullMask)
      .groupBy("doc_id").agg(count(lit(1)).as("n_hits"))
      .orderBy(col("n_hits").desc, col("doc_id"))
      .limit(k)
  }
}
