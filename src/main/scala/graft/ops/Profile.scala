package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Column profiling — the `describe`/data-quality pass every metadata-driven
  * ETL runs before trusting a new source (the reference eyeballs dtypes and
  * nulls ad hoc; here it is one distributed pass).
  *
  * ONE aggregation job computes every column's stats simultaneously (a
  * per-column loop would scan the table N times); the single wide row is
  * then unpivoted to one row per column with `stack`. min/max stringify so
  * the long format has one uniform schema across column types.
  */
object Profile {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame =
    profileWith(df, cols, countDistinct(_))

  /** [[profile]] with `approx_count_distinct` (HLL) in place of the exact
    * distinct counts — the 100 TB profiling path. Exact multi-column
    * distincts plan as an Expand (input × columns rows through the
    * shuffle); the sketch keeps the pass at one row per partition per
    * column. `rsd` is the HLL relative standard error (default 5%). */
  def profileApprox(df: DataFrame, cols: Seq[String],
                    rsd: Double = 0.05): DataFrame =
    profileWith(df, cols, approx_count_distinct(_, rsd))

  private def profileWith(df: DataFrame, cols: Seq[String],
                          distinctAgg: Column => Column): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    // every reference to a user-supplied name is escaped: as a SQL string
    // literal ('' doubling), inside backtick identifiers (`` doubling) —
    // including the functions.col() lookups, whose attribute parser treats
    // a lone backtick as a syntax error
    def lq(c: String) = c.replace("'", "''")
    def bq(c: String) = c.replace("`", "``")
    def ref(c: String) = col(s"`${bq(c)}`")
    val aggs = cols.flatMap(c => Seq(
      count(ref(c)).as(s"${c}__nn"),
      distinctAgg(ref(c)).as(s"${c}__nd"),
      min(ref(c)).cast("string").as(s"${c}__mn"),
      max(ref(c)).cast("string").as(s"${c}__mx")))
    val wide = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val arms = cols.map(c =>
      s"'${lq(c)}', __n, `${bq(c)}__nn`, `${bq(c)}__nd`, `${bq(c)}__mn`, `${bq(c)}__mx`")
      .mkString(", ")
    wide.select(expr(
      s"stack(${cols.size}, $arms) AS (col_name, n_rows, n_nonnull, n_distinct, min_val, max_val)"))
  }

  /** Snapshot drift report: [[profile]] two versions of a table and diff
    * the per-column statistics — the schema/content drift monitor run
    * between ingest vintages (row-count shifts, distinct-cardinality
    * jumps, range drift, a column going null-heavy). One row per column
    * with both sides' metrics plus delta columns; `range_changed` is a
    * null-safe string compare of the min/max evidence. Two single-pass
    * profile aggregations and a column-count-sized join — the frames are
    * scanned once each regardless of width. */
  def snapshotDiff(a: DataFrame, b: DataFrame, cols: Seq[String]): DataFrame = {
    def side(df: DataFrame, p: String) = profile(df, cols).select(
      col("col_name"), col("n_rows").as(s"${p}_rows"),
      col("n_nonnull").as(s"${p}_nonnull"),
      col("n_distinct").as(s"${p}_distinct"),
      col("min_val").as(s"${p}_min"), col("max_val").as(s"${p}_max"))
    side(a, "a").join(side(b, "b"), Seq("col_name"))
      .withColumn("rows_delta", col("b_rows") - col("a_rows"))
      .withColumn("distinct_delta", col("b_distinct") - col("a_distinct"))
      .withColumn("range_changed",
        !(col("a_min") <=> col("b_min")) || !(col("a_max") <=> col("b_max")))
  }

  /** Population stability index between a baseline vintage `a` and a
    * candidate vintage `b` (the model-monitoring drift gauge; rule of
    * thumb: Σpsi < 0.1 stable, > 0.25 shifted): bin BOTH vintages on the
    * BASELINE's `nBins` quantile cuts ([[graft.ops.Clean.percentileCuts]]
    * — discrete elements, engine-exact), then per bin
    * psi = (p_b − p_a)·ln(p_b/p_a) over `smooth`-smoothed proportions
    * (p = (n + s)/(N + s·bins), so empty candidate bins stay finite and
    * each side's proportions still sum to 1). Returns one row per
    * OCCUPIED bin with both counts and the psi contribution — sum for the
    * headline number.
    *
    * Plan: the cut table is one distinct-value histogram over the
    * baseline (the documented quantile machinery), broadcast to both
    * vintages; two O(bins)-group aggregations; totals ride a broadcast
    * 1-row frame. No shuffle beyond the bin counts. */
  def psi(a: DataFrame, b: DataFrame, valueCol: String, nBins: Int = 10,
          smooth: Double = 0.5): DataFrame = {
    require(nBins >= 2, s"psi needs at least 2 bins: $nBins")
    val ps = (1 until nBins).map(k => (s"c$k", k.toDouble / nBins))
    val cuts = Clean.percentileCuts(a.withColumn("__g", lit(1)),
      valueCol, "__g", ps).drop("__g")
    def binned(df: DataFrame, p: String) = {
      val bin = (1 until nBins)
        .map(k => when(col(valueCol) > col(s"c$k"), 1).otherwise(0))
        .foldLeft(lit(1): Column)(_ + _).cast("long")
      df.crossJoin(broadcast(cuts))
        .select(bin.as("bucket"))
        .groupBy("bucket").agg(count(lit(1)).as(s"n_$p"))
    }
    val totals = a.agg(count(lit(1)).as("__na"))
      .crossJoin(b.agg(count(lit(1)).as("__nb")))
    val pa = (col("n_a") + smooth) / (col("__na") + smooth * nBins)
    val pb = (col("n_b") + smooth) / (col("__nb") + smooth * nBins)
    binned(a, "a").join(binned(b, "b"), Seq("bucket"), "full_outer")
      .na.fill(0L, Seq("n_a", "n_b"))
      .crossJoin(broadcast(totals))
      .select(col("bucket"), col("n_a"), col("n_b"),
        graft.ext.Timeseries.r5((pb - pa) * log(pb / pa)).as("psi"))
  }

  /** Fixed-width histogram of `c` over [lo, hi): `bins` equal bins, the
    * top edge clamped into the last bin. One aggregation (shuffle on the
    * computed bin id, at most `bins` groups after map-side combine — the
    * reduce stage is O(bins) however large the input). Rows outside
    * [lo, hi] are excluded. Bin arithmetic is plain IEEE division/floor,
    * identical on any engine. */
  def histogram(df: DataFrame, c: Column, lo: Double, hi: Double,
                bins: Int): DataFrame = {
    require(bins > 0, "bins must be positive")
    require(hi > lo, "hi must exceed lo")
    val width = (hi - lo) / bins
    val bin = least(floor((c - lo) / width), lit(bins - 1)).cast("long")
    df.where(c >= lo && c <= hi)
      .select(bin.as("bin_id"))
      .groupBy("bin_id").agg(count(lit(1)).as("n"))
      .withColumn("bin_lo", col("bin_id") * width + lo)
      .withColumn("bin_hi", (col("bin_id") + 1) * width + lo)
  }

  /** 2-D fixed-bin histogram — the heatmap feed ([[histogram]] with a
    * second axis): rows outside either range drop, edge values clamp into
    * the last bin exactly like the 1-D form, and only NON-EMPTY cells
    * return (at 100 TB a dense binsX×binsY grid materializes client-side,
    * not here). One partial-aggregable groupBy on the two bin ids. */
  def histogram2d(df: DataFrame, x: Column, y: Column,
                  xLo: Double, xHi: Double, xBins: Int,
                  yLo: Double, yHi: Double, yBins: Int): DataFrame = {
    require(xBins > 0 && yBins > 0, "bins must be positive")
    require(xHi > xLo && yHi > yLo, "hi must exceed lo")
    val xw = (xHi - xLo) / xBins
    val yw = (yHi - yLo) / yBins
    val bx = least(floor((x - xLo) / xw), lit(xBins - 1)).cast("long")
    val by = least(floor((y - yLo) / yw), lit(yBins - 1)).cast("long")
    df.where(x >= xLo && x <= xHi && y >= yLo && y <= yHi)
      .select(bx.as("x_bin"), by.as("y_bin"))
      .groupBy("x_bin", "y_bin").agg(count(lit(1)).as("n"))
      .withColumn("x_lo", col("x_bin").cast("double") * xw + xLo)
      .withColumn("y_lo", col("y_bin").cast("double") * yw + yLo)
  }

  /** Equal-FREQUENCY histogram: per-group quantile buckets via discrete
    * percentile cuts — the 100 TB replacement for `ntile` that the
    * w5_ntile scaladoc promises. ntile needs a total order (one task owns
    * each group's full sort); here the cut for p = i/nBuckets is the
    * rank-⌈p·n⌉ element computed from the per-group VALUE HISTOGRAM
    * (min{x : cum count ≥ k} — the [[graft.ops.Clean.winsorize]] cut
    * machinery generalized to k cuts), so the heavy pass is a fully
    * parallel groupBy(group, value) and bucket assignment is a broadcast
    * join + comparisons. Ties land in ONE bucket (value-determined, unlike
    * ntile's arbitrary tie split) — that is the semantic a distributed
    * bucketing wants: reproducible under any partitioning. Returns one row
    * per (group, bucket): count + value range. */
  def quantileHistogram(df: DataFrame, valueCol: String, groupCol: String,
                        nBuckets: Int): DataFrame = {
    require(nBuckets >= 2, s"nBuckets must be >= 2 (got $nBuckets)")
    val cuts = Clean.percentileCuts(df, valueCol, groupCol,
      (1 until nBuckets).map(i => s"__cut$i" -> i.toDouble / nBuckets))
    val bucket = (1 until nBuckets).foldLeft(lit(1L)) { (acc, i) =>
      acc + when(col(valueCol) > col(s"__cut$i"), 1L).otherwise(0L)
    }
    df.join(broadcast(cuts), col(groupCol) === col("__g"))
      .groupBy(col(groupCol), bucket.as("bucket"))
      .agg(count(lit(1)).as("n"),
        min(col(valueCol)).as("lo"), max(col(valueCol)).as("hi"))
  }

  /** Join-key skew diagnostic: the `topN` heaviest values of `keyCol` with
    * their row counts and the ratio to the mean per-key count — the number
    * that tells you whether a join on this key needs salting
    * ([[graft.ops.Relational.saltedJoin]]) or AQE skew handling before it
    * ties up one reducer for hours at 100 TB.
    *
    * Shape at scale: one groupBy(key) with map-side partial counts, a
    * 1-row global stat joined back as a broadcast (never a window over the
    * whole key set, which would single-partition it), and a top-N that
    * plans as per-partition limits + merge, not a full sort. */
  def skewReport(df: DataFrame, keyCol: String, topN: Int = 10): DataFrame = {
    val counts = df.groupBy(col(keyCol).as("key_value"))
      .agg(count(lit(1)).as("cnt"))
    val stats = counts.agg(count(lit(1)).as("__nkeys"),
      sum(col("cnt")).as("__nrows"))
    counts.crossJoin(broadcast(stats))
      .select(col("key_value"), col("cnt"),
        // ratio to mean = cnt / (nrows/nkeys); multiplied form keeps the
        // float ops in an order the DuckDB oracle can reproduce exactly
        (col("cnt").cast("double") * col("__nkeys") / col("__nrows"))
          .as("skew_ratio"))
      .orderBy(col("cnt").desc, col("key_value"))
      .limit(topN)
  }

  /** Pairwise Pearson correlation over `cols` — the redundancy/leakage
    * screen a feature-selection pass runs before training (two near-
    * perfectly-correlated measures carry one signal; a feature correlated
    * with the label column is leakage). ONE aggregation computes all
    * n·(n−1)/2 coefficients simultaneously — a per-pair loop would scan
    * the table n² times — then the single wide row unpivots to one
    * (col_a, col_b, r) row per pair, the long format a report joins
    * against. Rounded to 6: corr's running-moment accumulation order
    * differs across engines in the last bits only. */
  def corrMatrix(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, s"corrMatrix needs at least 2 columns, got $cols")
    val pairs = for {
      i <- cols.indices; j <- (i + 1) until cols.size
    } yield (cols(i), cols(j))
    val aggs = pairs.map { case (a, b) =>
      round(corr(col(a), col(b)), 6).as(s"__$a:$b")
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val long = pairs.map { case (a, b) =>
      struct(lit(a).as("col_a"), lit(b).as("col_b"),
        col(s"`__$a:$b`").as("r"))
    }
    wide.select(explode(array(long: _*)).as("p")).select(col("p.*"))
  }
}
