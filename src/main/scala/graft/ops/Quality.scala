package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality expectations — the contract checks an ETL pipeline runs
  * before publishing a load (the reference trusts its sources implicitly;
  * any production deployment of it would need exactly this gate before the
  * full-DB copy at etl_io.py:203-219).
  *
  * Design for scale: ALL expectations against one table — predicate checks
  * AND uniqueness checks — compile into ONE aggregation pass (conditional
  * sums and count-distincts side by side; a per-check loop would scan the
  * table N times), and the wide single-row result is exploded to the uniform
  * (check, n_rows, n_bad, pass) report shape. Referential checks fold the
  * child row count into the same scan that finds orphans (left join against
  * de-duplicated parent keys + conditional count — not a separate anti-join
  * pass plus a second count scan). Nothing here collects data rows to the
  * driver — the report is O(#checks) however big the table.
  *
  * The report rows are built with Column APIs (struct/explode), not a
  * `stack(...)` SQL string, so check names containing quotes or backslashes
  * pass through literally instead of being re-parsed by the SQL lexer.
  */
object Quality {

  /** Expectations over one table in a single scan. `checks` maps check name
    * to a VIOLATION predicate (true = bad row); `uniques` maps check name to
    * a column tuple expected to be a key (`n_bad` = rows in excess of one
    * per distinct tuple). On an empty table every check passes with
    * n_bad = 0 (sums coalesced — SUM over zero rows is NULL in SQL). */
  /** Per-column completeness report — the first data-quality question of
    * any ingest: for each of `cols`, how many rows are NULL, how many are
    * EMPTY strings, how many are whitespace-only BLANKS (string columns;
    * non-strings report 0 for both) out of `n_rows`. One aggregation pass
    * over the table (3·|cols| partial-aggregable counters — never a pass
    * per column), unpivoted to a row per column; the rates are exact
    * int/int divisions. */
  def completeness(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "completeness needs at least one column")
    val isStr = cols.map(c =>
      df.schema(c).dataType == org.apache.spark.sql.types.StringType)
    val aggs = cols.zip(isStr).flatMap { case (c, s) =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__null_$c"),
        sum(when(if (s) col(c) === "" else lit(false), 1L).otherwise(0L))
          .as(s"__empty_$c"),
        sum(when(if (s) col(c) =!= "" && trim(col(c)) === "" else lit(false),
          1L).otherwise(0L)).as(s"__blank_$c"))
    } :+ count(lit(1)).as("__n")
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stacked = cols.map { c =>
      struct(lit(c).as("column"), col(s"__null_$c").as("n_null"),
        col(s"__empty_$c").as("n_empty"), col(s"__blank_$c").as("n_blank"))
    }
    one.select(col("__n"), explode(array(stacked: _*)).as("__s"))
      .select(col("__s.column").as("column"), col("__n").as("n_rows"),
        col("__s.n_null").as("n_null"), col("__s.n_empty").as("n_empty"),
        col("__s.n_blank").as("n_blank"),
        (lit(1.0) - (col("__s.n_null") + col("__s.n_empty")
          + col("__s.n_blank")).cast("double") / col("__n").cast("double"))
          .as("completeness"))
  }

  def checkPredicates(df: DataFrame, checks: Seq[(String, Column)],
                      uniques: Seq[(String, Seq[String])] = Nil): DataFrame = {
    require(checks.nonEmpty || uniques.nonEmpty,
      "checkPredicates needs at least one check")
    val aggs = count(lit(1)).as("__n") +: (
      checks.zipWithIndex.map { case ((_, bad), i) =>
        coalesce(sum(when(bad, 1L).otherwise(0L)), lit(0L)).as(s"__b$i")
      } ++ uniques.zipWithIndex.map { case ((_, cols), i) =>
        countDistinct(col(cols.head), cols.tail.map(col): _*).as(s"__u$i")
      })
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val entries =
      uniques.zipWithIndex.map { case ((name, _), i) =>
        struct(lit(name).as("check"),
          (col("__n") - col(s"__u$i")).as("n_bad"))
      } ++ checks.zipWithIndex.map { case ((name, _), i) =>
        struct(lit(name).as("check"), col(s"__b$i").as("n_bad"))
      }
    wide.select(col("__n").as("n_rows"), explode(array(entries: _*)).as("e"))
      .select(col("e.check").as("check"), col("n_rows"),
        col("e.n_bad").as("n_bad"), (col("e.n_bad") === 0L).as("pass"))
  }

  /** Uniqueness expectation standalone — same single-pass shape, kept as a
    * convenience; prefer folding into a table's `checkPredicates` call so
    * the table is scanned once for everything. */
  def checkUnique(df: DataFrame, name: String, cols: Seq[String]): DataFrame =
    checkPredicates(df, Nil, Seq(name -> cols))

  /** Referential-integrity expectation: `n_bad` = child rows whose non-null
    * key has no parent (null FKs are a not-null check's business, not RI's).
    * Plans as ONE scan of the child: left join against the parent's
    * de-duplicated keys (broadcast or shuffled as the parent's size
    * dictates, never a driver-side key list), then count(*) and the orphan
    * count in the same aggregation. The distinct keeps the join
    * row-preserving, so n_rows is exact even with duplicate parent keys. */
  def checkRef(child: DataFrame, parent: DataFrame,
               childKey: String, parentKey: String, name: String): DataFrame = {
    val pk = parent.select(col(parentKey).as("__pk")).distinct()
    child.join(pk, col(childKey) === col("__pk"), "left")
      .agg(count(lit(1)).as("n_rows"),
        coalesce(sum(when(col(childKey).isNotNull && col("__pk").isNull, 1L)
          .otherwise(0L)), lit(0L)).as("n_bad"))
      .select(lit(name).as("check"), col("n_rows"), col("n_bad"),
        (col("n_bad") === 0L).as("pass"))
  }

  /** A full report is the union of per-table passes — schemas are uniform
    * by construction. */
  def report(parts: Seq[DataFrame]): DataFrame =
    parts.reduce(_ unionAll _)

  /** k-anonymity audit over a quasi-identifier tuple: every combination
    * shared by FEWER than k rows, with its count — the re-identification
    * risk surface a dataset release must clear (Sweeney, "k-anonymity: a
    * model for protecting privacy", 2002). Empty result = the release
    * passes at that k. This is the AUDIT; remediation (generalize,
    * suppress, or drop the offending rows) is a policy choice the caller
    * makes with this frame. Null quasi-values group together (SQL
    * GROUP BY semantics) — a null is a value an attacker can match on.
    * One partial-aggregable groupBy; output is bounded by the violating
    * combination count, not the data. */
  def kAnonymity(df: DataFrame, quasiCols: Seq[String], k: Long): DataFrame = {
    require(quasiCols.nonEmpty, "kAnonymity needs at least one column")
    require(k >= 2, s"k must be >= 2 (k=1 is vacuous): $k")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .where(col("n") < k)
  }

  /** Daily-volume anomaly audit: flag days whose row count deviates from
    * the median by more than `k`·MAD — the robust ingest monitor (mean/σ
    * would let one outage day drag the baseline toward itself). Median and
    * MAD are lower-median ELEMENT picks over the day table, so the whole
    * audit is exact integer logic — no float anywhere, deterministic on
    * every engine. Returns every day with (n_rows, med, mad, is_anomaly).
    *
    * Plan: one day-level count aggregation; the median/MAD windows rank
    * the DAY table (≤ date-range rows — the bucket-totals-only pattern),
    * and the two 1-row scalars broadcast back. */
  def volumeAnomalies(df: DataFrame, tsCol: String, k: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val days = df.groupBy(to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("n"))
    val cnt = days.agg(count(lit(1)).as("__c"))
    def lowerMedian(d: DataFrame, v: String): DataFrame =
      d.withColumn("__rn",
          row_number().over(Window.orderBy(col(v), col("day"))).cast("long"))
        .crossJoin(broadcast(cnt))
        .where(col("__rn") === floor((col("__c") + 1) / lit(2)).cast("long"))
        .select(col(v))
    val med = lowerMedian(days, "n").select(col("n").as("med"))
    val dev = days.crossJoin(broadcast(med))
      .withColumn("dv", abs(col("n") - col("med")))
    val mad = lowerMedian(dev, "dv").select(col("dv").as("mad"))
    dev.crossJoin(broadcast(mad))
      .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("n").as("n_rows"), col("med"), col("mad"),
        (col("dv") > lit(k) * col("mad")).as("is_anomaly"))
  }

  /** Functional-dependency audit: determinant combinations where a claimed
    * FD X → Y breaks (more than one distinct Y per X tuple) — the
    * data-quality check behind "order key determines customer",
    * "zip determines state". Returns each violating X with the row count,
    * the distinct-Y count, and the min/max conflicting Y values as
    * evidence; empty = the FD holds. One partial-aggregable aggregation;
    * output bounded by violating determinants, never the table. */
  def fdViolations(df: DataFrame, determinant: Seq[String],
                   dependent: String): DataFrame = {
    require(determinant.nonEmpty, "fdViolations needs a determinant")
    df.groupBy(determinant.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col(dependent)).as("n_distinct"),
        min(col(dependent)).as("y_min"),
        max(col(dependent)).as("y_max"))
      .where(col("n_distinct") > 1)
  }

  /** l-diversity audit — [[kAnonymity]]'s attribute-disclosure companion
    * (Machanavajjhala et al., "l-diversity: privacy beyond k-anonymity",
    * 2006): quasi-identifier combinations whose SENSITIVE column carries
    * fewer than l distinct values. A group can be large enough to pass
    * k-anonymity and still leak — if all 50 rows share one diagnosis,
    * matching the quasi-tuple discloses it. Returns the violating combos
    * with row and distinct-sensitive counts; empty = pass. One
    * aggregation; output bounded by violating combos. */
  def lDiversity(df: DataFrame, quasiCols: Seq[String],
                 sensitiveCol: String, l: Long): DataFrame = {
    require(quasiCols.nonEmpty, "lDiversity needs at least one quasi column")
    require(l >= 2, s"l must be >= 2 (l=1 is vacuous): $l")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        countDistinct(col(sensitiveCol)).as("n_distinct"))
      .where(col("n_distinct") < l)
  }

  /** Benford first-digit audit — the classic fabricated-numbers screen
    * (Benford, "The law of anomalous numbers", 1938; standard forensic
    * accounting practice): naturally-grown magnitudes (payments, counts,
    * populations) put ~30.1% of first significant digits at 1, falling to
    * 4.6% at 9; invented or systematically generated figures rarely do.
    * Returns one row per digit 1–9 with the observed count, the Benford
    * expectation for the column's row count, and their ratio — per-digit
    * evidence, deliberately NOT a single χ² (summing 9 float terms would
    * reintroduce the accumulation-order hazard the per-digit form avoids).
    *
    * Determinism: the digit comes from the CENTS INTEGER's decimal string
    * (never floor(x/10^floor(log10 x)), whose float log flips digits at
    * power-of-ten boundaries); counts are exact; each expectation is one
    * int×literal multiply. The Benford constants are Scala-computed
    * doubles whose shortest-round-trip literals the generated oracle SQL
    * embeds — bit-identical on both engines. Zero/negative-cents rows are
    * excluded (no first significant digit). One aggregation pass; output
    * is 9 rows. */
  def benford(df: DataFrame, valueCol: String): DataFrame = {
    val cents = floor(col(valueCol) * 100 + 0.5).cast("long")
    val digits = df.select(cents.as("__c")).where(col("__c") > 0L)
      .select(substring(col("__c").cast("string"), 1, 1).cast("long")
        .as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n"))
    val total = digits.agg(sum(col("n")).as("__nt"))
    val p = (1 to 9).map(d => d.toLong -> math.log10(1.0 + 1.0 / d))
    val expected = p.foldLeft(lit(null).cast("double")) {
      case (acc, (d, pd)) => when(col("digit") === d, lit(pd)).otherwise(acc)
    }
    digits.crossJoin(broadcast(total)) // 1-row side
      .withColumn("__exp", col("__nt").cast("double") * expected)
      .select(col("digit"), col("n"),
        (floor(col("__exp") * 1e4 + 0.5) / 1e4).as("expected"),
        (floor(col("n").cast("double") / col("__exp") * 1e4 + 0.5) / 1e4)
          .as("ratio"))
  }

  /** The shortest-round-trip literals for log10(1+1/d) — embedded by the
    * registry's generated oracle so both engines multiply by the SAME
    * doubles. */
  def benfordLiterals: Seq[(Int, String)] =
    (1 to 9).map(d => d -> math.log10(1.0 + 1.0 / d).toString)

  /** t-closeness audit — the distribution-skew member of the privacy trio
    * (Li, Li & Venkatasubramanian, "t-closeness: privacy beyond k-anonymity
    * and l-diversity", ICDE 2007): quasi-identifier combinations whose
    * SENSITIVE-value distribution sits further than `t` (Earth Mover's
    * Distance over the ordered sensitive domain) from the whole-table
    * distribution. A group can pass l-diversity with l distinct values and
    * still leak — if 95% of its rows share one diagnosis, matching the
    * quasi-tuple discloses it probabilistically; EMD sees that, a distinct
    * count cannot. Returns the violating combos with row count and EMD;
    * empty = pass at that t.
    *
    * EMD for an ORDINAL domain of m values (ordered by the column's natural
    * sort) is (1/(m-1))·Σᵢ|cumP(i) − cumQ(i)|. Computed in exact integers:
    * each term is |cumGroup·N − cumGlobal·n_g| (BIGINT — counts times
    * counts), the terms are summed as integers, and ONE float division by
    * n_g·N·(m−1) happens at the end — so parallel vs sequential
    * accumulation cannot differ and a SQL replay hash-matches bit-for-bit.
    *
    * Scale: one groupBy over the data for per-group value counts, a
    * re-aggregation of THAT (never a second data scan) for group sizes, and
    * the m-row global distribution broadcast-cross-joined onto the groups —
    * per-group work is O(m) rows with m bounded by the sensitive domain.
    * The per-group cumulative sum partitions by the quasi tuple (millions
    * of tiny windows, never one global sort). Output is bounded by the
    * violating combos. */
  def tCloseness(df: DataFrame, quasiCols: Seq[String],
                 sensitiveCol: String, t: Double): DataFrame = {
    require(quasiCols.nonEmpty, "tCloseness needs at least one quasi column")
    require(t > 0.0 && t < 1.0, s"t must be in (0, 1): $t")
    val quasi = quasiCols.map(col)
    val base = df.select(quasi :+ col(sensitiveCol).as("__v"): _*)
    // global distribution: m rows; the window sort is over those m rows only
    val glob = base.groupBy(col("__v")).agg(count(lit(1)).as("__nv"))
    val globCum = glob.select(col("__v"),
      sum(col("__nv")).over(org.apache.spark.sql.expressions.Window
        .orderBy(col("__v"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)).as("__cumq"))
      .crossJoin(glob.agg(sum(col("__nv")).as("__nt"),
        count(lit(1)).as("__m"))) // 1-row side — broadcast
    val gv = base.groupBy(quasi :+ col("__v"): _*)
      .agg(count(lit(1)).as("__ngv"))
    val g = gv.groupBy(quasi: _*).agg(sum(col("__ngv")).as("__ng"))
    // grid = groups × ordered domain (broadcast m-row side), zero-filled
    val grid = g.crossJoin(broadcast(globCum))
      .join(gv, quasiCols :+ "__v", "left")
      .withColumn("__ngv", coalesce(col("__ngv"), lit(0L)))
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(quasi: _*).orderBy(col("__v"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val cum = grid.withColumn("__cumg", sum(col("__ngv")).over(win))
    val emd = cum.groupBy(quasi: _*)
      .agg(first(col("__ng")).as("n"), first(col("__nt")).as("__nt"),
        first(col("__m")).as("__m"),
        sum(abs(col("__cumg") * col("__nt") - col("__cumq") * col("__ng")))
          .as("__numsum"))
      .withColumn("emd", col("__numsum").cast("double") /
        (col("n") * col("__nt") * (col("__m") - 1L)).cast("double"))
    emd.where(col("emd") > t)
      .select(quasi ++ Seq(col("n"),
        (floor(col("emd") * 1e6 + 0.5) / 1e6).as("emd")): _*)
  }
}
