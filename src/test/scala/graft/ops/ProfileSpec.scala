package graft.ops

import graft.SparkSpec

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  test("profile counts rows/nulls/distincts and stringified min/max per column, one pass") {
    val df = Seq((1L, Some("a")), (2L, None), (3L, Some("a"))).toDF("id", "s")
    val out = Profile.profile(df, Seq("id", "s")).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5))))
      .toMap
    assert(out("id") == ((3L, 3L, 3L, "1", "3")))
    // nulls excluded from n_nonnull, n_distinct, and min/max
    assert(out("s") == ((3L, 2L, 1L, "a", "a")))
  }

  test("profile rejects an empty column list") {
    intercept[IllegalArgumentException] {
      Profile.profile(Seq(1).toDF("x"), Seq.empty)
    }
  }

  test("profile survives hostile column names (quote / backtick)") {
    val df = Seq((1, 2)).toDF("o'clock", "we`ird")
    val out = Profile.profile(df, Seq("o'clock", "we`ird"))
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(out == Map("o'clock" -> 1L, "we`ird" -> 1L))
  }

  test("histogram bins values, clamps the top edge into the last bin, excludes out-of-range") {
    import org.apache.spark.sql.functions.col
    val df = Seq(0.0, 5.0, 9.99, 10.0, 19.0, 20.0, -1.0, 20.01).toDF("x")
    val out = Profile.histogram(df, col("x"), lo = 0.0, hi = 20.0, bins = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3))))
      .toMap
    // -1.0 and 20.01 excluded; 20.0 (== hi) clamps into bin 1
    assert(out == Map(
      0L -> ((3L, 0.0, 10.0)),   // 0.0, 5.0, 9.99
      1L -> ((3L, 10.0, 20.0)))) // 10.0, 19.0, 20.0
  }

  test("quantileHistogram: quartiles of 1..8 are 2 per bucket; ties stay in one bucket") {
    import spark.implicits._
    val df = (1 to 8).map(i => ("g", i.toDouble)).toDF("g", "v")
    val out = Profile.quantileHistogram(df, "v", "g", nBuckets = 4)
      .orderBy("bucket")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    assert(out.toSeq == Seq((1L, 2L, 1.0, 2.0), (2L, 2L, 3.0, 4.0),
      (3L, 2L, 5.0, 6.0), (4L, 2L, 7.0, 8.0)))
    // all-equal values collapse into ONE bucket (value-determined ties)
    val ties = Seq.fill(6)(("g", 5.0)).toDF("g", "v")
    val t = Profile.quantileHistogram(ties, "v", "g", nBuckets = 4).collect()
    assert(t.length == 1 && t.head.getLong(2) == 6L)
  }

  test("snapshotDiff: per-column deltas and null-safe range compare") {
    val a = Seq((1L, "x"), (2L, "y"), (3L, "y")).toDF("k", "v")
    val b = Seq((1L, "x"), (2L, "z")).toDF("k", "v")
    val got = Profile.snapshotDiff(a, b, Seq("k", "v"))
      .select("col_name", "rows_delta", "distinct_delta", "range_changed")
      .as[(String, Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got("k") == ((-1L, -1L, true)), "max k moved 3 → 2")
    assert(got("v") == ((-1L, 0L, true)), "max v moved y → z, distinct 2 → 2")
    // identical snapshots: zero deltas, no range change
    val same = Profile.snapshotDiff(a, a, Seq("k"))
      .select("rows_delta", "distinct_delta", "range_changed")
      .as[(Long, Long, Boolean)].head()
    assert(same == ((0L, 0L, false)))
  }

  test("psi: zero for identical vintages, non-negative terms, empty bins finite") {
    val a = (1 to 40).map(i => (i % 10).toDouble).toDF("v")
    val zero = Profile.psi(a, a, "v", nBins = 4)
      .as[(Long, Long, Long, Double)].collect()
    assert(zero.nonEmpty && zero.forall(r => r._2 == r._3 && r._4 == 0.0),
      s"identical vintages must score 0: ${zero.toSeq}")
    // b concentrated in the top of a's range: every term (p_b−p_a)·ln(p_b/p_a)
    // has matching signs, so psi is non-negative per bin — and a's low bins
    // are EMPTY in b yet stay finite through the smoothing
    val b = (1 to 30).map(_ => 9.0).toDF("v")
    val shifted = Profile.psi(a, b, "v", nBins = 4)
      .as[(Long, Long, Long, Double)].collect()
    assert(shifted.forall(_._4 >= 0.0), s"psi terms: ${shifted.toSeq}")
    assert(shifted.exists(r => r._3 == 0L),
      "expected an empty candidate bin in this construction")
    assert(shifted.map(_._4).sum > 0.25, "a wholesale shift must flag")
  }
}
