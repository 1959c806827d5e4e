package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch (Cormode & Muthukrishnan, "An improved data stream
  * summary: the count-min sketch and its applications", J. Algorithms
  * 2005) as relational algebra: the sketch is a (depth × width) counter
  * TABLE built by one partial-aggregable groupBy, and a point estimate is
  * the MIN over depth rows of the key's bucket counters — an upper bound
  * on the true count with error ≤ 2·N/width at probability 1−(1/2)^depth.
  *
  * Why this exists next to the exact `vocab_topk` / HLL paths: at 100 TB
  * the exact per-key count table is corpus-cardinality-sized (billions of
  * rows shuffled and stored), while the CMS is depth·width counters — a
  * CONSTANT — whatever the corpus does, and it merges associatively
  * (counter-wise sum), so partial sketches combine map-side exactly like
  * any partial aggregate. The price is overcounting from collisions,
  * never undercounting.
  *
  * Unlike HLL/KLL (engine-specific sketches, rows-only checked), every
  * number here is DETERMINISTIC: rows hash through the engine-neutral
  * [[TextOps.md5Hash60]], so a DuckDB oracle replays the whole sketch —
  * build, bucket sums, and min-estimates — bit for bit. */
object CountMin {

  /** Row d's bucket for a key: md5-derived 60-bit hash of "key:d", mod
    * width. Depth-salted input string, so the d rows are independent
    * hash functions; engine-neutral (DuckDB:
    * `CAST('0x' || substr(md5(x || ':d'), 1, 15) AS BIGINT) % width`). */
  def bucket(key: Column, d: Int, width: Int): Column =
    pmod(TextOps.md5Hash60(concat(key.cast("string"), lit(s":$d"))),
      lit(width.toLong))

  /** Build the sketch table (d, bucket, n) over `keyCol`'s occurrences.
    * One explode (×depth) + one partial-aggregable groupBy; output is at
    * most depth·width rows regardless of input size. */
  def build(df: DataFrame, keyCol: String,
            width: Int = 512, depth: Int = 4): DataFrame = {
    require(width >= 2 && depth >= 1, s"bad sketch dims $width x $depth")
    df.select(posexplode(array((0 until depth).map(d =>
        bucket(col(keyCol), d, width)): _*)).as(Seq("d", "bucket")))
      .groupBy("d", "bucket").agg(count(lit(1)).as("n"))
  }

  /** Point estimates for every key in `keys` (any frame carrying
    * `keyCol`; duplicates fine — estimates are per distinct key): the
    * min over the sketch's depth rows of the key's bucket counter.
    * The sketch side is depth·width rows — broadcast, so the lookup
    * never shuffles the key frame.
    *
    * The sketch stores only NON-empty buckets (it's a groupBy output),
    * so the lookup LEFT-joins and counts an absent (d, bucket) row as
    * zero: a key hashing into any empty bucket estimates 0 (correct —
    * CMS never undercounts, and an empty bucket proves absence at that
    * depth), and a key unseen by the build still returns a row instead
    * of vanishing. An inner join here would both inflate the min (a
    * dropped zero row) and silently drop all-empty keys. */
  def estimate(sketch: DataFrame, keys: DataFrame, keyCol: String,
               width: Int, depth: Int): DataFrame = {
    val k = keys.select(col(keyCol)).distinct()
      .select(col(keyCol), posexplode(array((0 until depth).map(d =>
        bucket(col(keyCol), d, width)): _*)).as(Seq("d", "bucket")))
    k.join(broadcast(sketch), Seq("d", "bucket"), "left")
      .groupBy(keyCol).agg(min(coalesce(col("n"), lit(0L))).as("est_n"))
  }

  /** The sketch demo query: exact per-key counts joined with their CMS
    * estimates — (key, true_n, est_n, overcount). `overcount ≥ 0` for
    * every key is the sketch's defining guarantee; the driver hash proves
    * both engines build the identical sketch. */
  def estimateVsTruth(df: DataFrame, keyCol: String,
                      width: Int = 512, depth: Int = 4): DataFrame = {
    val sketch = build(df, keyCol, width, depth)
    val truth = df.groupBy(keyCol).agg(count(lit(1)).as("true_n"))
    truth.join(estimate(sketch, truth, keyCol, width, depth), Seq(keyCol))
      .select(col(keyCol), col("true_n"), col("est_n"),
        (col("est_n") - col("true_n")).as("overcount"))
  }
}
