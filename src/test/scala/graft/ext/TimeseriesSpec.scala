package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions.col

class TimeseriesSpec extends SparkSpec {
  import spark.implicits._

  private def refEwma(vs: Seq[Double], alpha: Double): Double =
    vs.tail.foldLeft(vs.head)((acc, x) => acc * (1 - alpha) + x * alpha)

  test("ewma matches the driver-side recursive fold per key") {
    val rnd = new scala.util.Random(29)
    val rows = for (k <- 1 to 5; i <- 1 to 40)
      yield (s"u$k", i.toLong, rnd.nextDouble() * 100)
    val got = Timeseries.ewma(rows.toDF("k", "seq", "v"),
        "k", Seq("seq"), "v", alpha = 0.25)
      .collect().map(r => (r.getString(0), r.getAs[Long]("n_events"),
        r.getAs[Double]("ewma"))).toSet
    val want = rows.groupBy(_._1).map { case (k, evs) =>
      val vs = evs.sortBy(_._2).map(_._3)
      (k, vs.size.toLong,
        math.floor(refEwma(vs, 0.25) * 100000.0 + 0.5) / 100000.0)
    }.toSet
    assert(got == want)
  }

  test("ewma is insensitive to input row order (sorts by the order columns)") {
    val rows = Seq(("u", 3L, 30.0), ("u", 1L, 10.0), ("u", 2L, 20.0))
    val r = Timeseries.ewma(rows.toDF("k", "seq", "v"), "k", Seq("seq"), "v", 0.5)
      .collect().head
    // fold: 10 -> 10*.5+20*.5=15 -> 15*.5+30*.5=22.5
    assert(r.getAs[Double]("ewma") == 22.5 && r.getAs[Long]("n_events") == 3L)
  }

  test("ewmaSeries emits every row with its prefix EWMA; last row equals the ewma summary") {
    val rnd = new scala.util.Random(31)
    val rows = for (k <- 1 to 4; i <- 1 to 25)
      yield (s"u$k", i.toLong, rnd.nextDouble() * 50)
    val got = Timeseries.ewmaSeries(rows.toDF("k", "seq", "v"),
        "k", Seq("seq"), "v", alpha = 0.25)
      .collect().map(r => (r.getString(0), r.getAs[Long]("seq")) ->
        r.getAs[Double]("ewma")).toMap
    val want = rows.groupBy(_._1).flatMap { case (k, evs) =>
      val vs = evs.sortBy(_._2).map(_._3)
      vs.indices.map { i =>
        val y = vs.slice(1, i + 1).foldLeft(vs.head)((a, x) => a * 0.75 + x * 0.25)
        (k, (i + 1).toLong) ->
          math.floor(y * 100000.0 + 0.5) / 100000.0
      }
    }
    assert(got == want)
    val summary = Timeseries.ewma(rows.toDF("k", "seq", "v"),
        "k", Seq("seq"), "v", 0.25)
      .collect().map(r => r.getString(0) -> r.getAs[Double]("ewma")).toMap
    val lastPerKey = got.groupBy(_._1._1).map { case (k, m) => k -> m.maxBy(_._1._2)._2 }
    assert(lastPerKey == summary)
  }

  test("holt matches the driver-side level/trend recursion; recovers a clean linear series") {
    val rnd = new scala.util.Random(37)
    val rows = for (k <- 1 to 4; i <- 1 to 30)
      yield (s"u$k", i.toLong, rnd.nextDouble() * 40)
    val got = Timeseries.holt(rows.toDF("k", "seq", "v"),
        "k", Seq("seq"), "v", alpha = 0.25, beta = 0.5)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Double]("level"), r.getAs[Double]("trend"),
          r.getAs[Double]("forecast"))).toMap
    def r5(x: Double) = math.floor(x * 100000.0 + 0.5) / 100000.0
    val want = rows.groupBy(_._1).map { case (k, evs) =>
      val vs = evs.sortBy(_._2).map(_._3)
      val (l, b) = vs.tail.foldLeft((vs.head, 0.0)) { case ((l, b), x) =>
        val nl = x * 0.25 + (l + b) * 0.75
        (nl, (nl - l) * 0.5 + b * 0.5)
      }
      k -> (r5(l), r5(b), r5(l + b))
    }
    assert(got == want)
    // exact linear input: the fold converges toward slope 2; trend positive
    val lin = (1 to 50).map(i => ("u", i.toLong, 2.0 * i))
    val r = Timeseries.holt(lin.toDF("k", "seq", "v"), "k", Seq("seq"), "v", 0.5, 0.5)
      .collect().head
    assert(math.abs(r.getAs[Double]("trend") - 2.0) < 0.1)
  }

  test("cusum flags the planted level shift and matches the driver-side fold") {
    // u: flat 10 then jumps to 14 halfway; v: i.i.d.-ish noise, no shift
    val rnd = new scala.util.Random(41)
    val shifted = (1 to 40).map(i =>
      ("u", i.toLong, (if (i <= 20) 10.0 else 14.0) + rnd.nextInt(100) / 100.0))
    val flat = (1 to 40).map(i => ("v", i.toLong, 10.0 + rnd.nextInt(100) / 100.0))
    val df = (shifted ++ flat).toDF("k", "seq", "v")
    val got = Timeseries.cusum(df, "k", Seq("seq"), "v", drift = 0.5)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Double]("cusum_pos"), r.getAs[Double]("cusum_neg"))).toMap
    def r5(x: Double) = math.floor(x * 100000.0 + 0.5) / 100000.0
    val want = (shifted ++ flat).groupBy(_._1).map { case (k, evs) =>
      val cs = evs.sortBy(_._2).map(t => math.floor(t._3 * 100 + 0.5).toLong)
      val n = cs.size.toDouble
      val mc = cs.sum.toDouble / n
      val varC = cs.map(c => c.toDouble * c).sum / n - mc * mc
      val sigma = math.sqrt(varC) / 100.0
      val mu = mc / 100.0
      val zs = cs.map(c => if (sigma == 0) 0.0 else (c / 100.0 - mu) / sigma)
      var (p, q, mp, mq) = (0.0, 0.0, 0.0, 0.0)
      zs.foreach { z =>
        p = math.max(0, p + z - 0.5); q = math.min(0, q + z + 0.5)
        mp = math.max(mp, p); mq = math.min(mq, q)
      }
      k -> (r5(mp), r5(mq))
    }
    assert(got == want)
    assert(got("u")._1 > 5.0, "planted shift must drive S+ high")
    assert(got("v")._1 < got("u")._1 / 2, "flat key must not")
  }

  test("linearTrend recovers an exact planted line (r2 = 1) and nulls degenerate keys") {
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def at(days: Double) =
      new java.sql.Timestamp(t0.getTime + (days * 86400000L).toLong)
    // y = 3.5*d + 20 in value units per day
    val line = (0 until 10).map(d => ("a", at(d.toDouble), 20.0 + 3.5 * d))
    val single = Seq(("b", at(0), 7.0))
    val sameTs = Seq(("c", at(1), 5.0), ("c", at(1), 9.0))
    val df = (line ++ single ++ sameTs).toDF("k", "ts", "v")
    val got = Timeseries.linearTrend(df, "k", "ts", "v")
      .collect().map(r => r.getString(0) ->
        (Option(r.get(r.fieldIndex("slope_per_day"))),
          Option(r.get(r.fieldIndex("intercept"))),
          Option(r.get(r.fieldIndex("r2"))))).toMap
    assert(got("a") == (Some(3.5), Some(20.0), Some(1.0)))
    assert(got("b") == (None, None, None), "single point has no slope")
    assert(got("c") == (None, None, None), "zero x-variance has no slope")
  }

  test("linearTrend matches the driver-side closed form on random data") {
    val rnd = new scala.util.Random(43)
    val t0 = 1704067200L // 2024-01-01 UTC, seconds
    val rows = for (k <- 1 to 5; _ <- 1 to 30) yield
      (s"u$k", new java.sql.Timestamp((t0 + rnd.nextInt(2600000)) * 1000L),
        rnd.nextInt(50000) / 100.0)
    val got = Timeseries.linearTrend(rows.toDF("k", "ts", "v"), "k", "ts", "v")
      .collect().map(r => r.getString(0) ->
        (r.getAs[Double]("slope_per_day"), r.getAs[Double]("intercept"),
          r.getAs[Double]("r2"))).toMap
    def r5(x: Double) = math.floor(x * 100000.0 + 0.5) / 100000.0
    val want = rows.groupBy(_._1).map { case (k, evs) =>
      val x0 = evs.map(_._2.getTime / 1000).min
      val xs = evs.map(_._2.getTime / 1000 - x0)
      val cs = evs.map(t => math.floor(t._3 * 100 + 0.5).toLong)
      val n = xs.size.toDouble
      val (sx, sy) = (xs.sum.toDouble, cs.sum.toDouble)
      val sxx = xs.map(x => BigInt(x) * BigInt(x)).sum.toDouble
      val sxy = xs.zip(cs).map { case (x, c) => BigInt(x) * BigInt(c) }.sum.toDouble
      val syy = cs.map(c => BigInt(c) * BigInt(c)).sum.toDouble
      val den = n * sxx - sx * sx
      val cov = n * sxy - sx * sy
      k -> (r5(cov / den * 864.0), r5((sy * sxx - sx * sxy) / den / 100.0),
        r5(cov * cov / (den * (n * syy - sy * sy))))
    }
    assert(got == want)
  }

  test("ohlc picks bucket-first open, bucket-last close, exact extremes and cents sum") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val rows = Seq(
      ("u", ts("2024-01-01 09:00:00"), 1L, 10.0),
      ("u", ts("2024-01-01 15:00:00"), 2L, 30.0),
      ("u", ts("2024-01-01 23:59:59"), 3L, 20.0),
      ("u", ts("2024-01-02 01:00:00"), 4L, 5.5),
      ("v", ts("2024-01-01 12:00:00"), 5L, 7.25))
    val got = Timeseries.ohlc(rows.toDF("k", "ts", "id", "v"),
        "k", "ts", "id", "v", "day")
      .collect().map(r => (r.getString(0), r.getTimestamp(1).toString) ->
        (r.getAs[Double]("open"), r.getAs[Double]("high"),
          r.getAs[Double]("low"), r.getAs[Double]("close"),
          r.getAs[Long]("n_events"), r.getAs[Double]("vsum"))).toMap
    assert(got(("u", "2024-01-01 00:00:00.0")) == (10.0, 30.0, 10.0, 20.0, 3L, 60.0))
    assert(got(("u", "2024-01-02 00:00:00.0")) == (5.5, 5.5, 5.5, 5.5, 1L, 5.5))
    assert(got(("v", "2024-01-01 00:00:00.0")) == (7.25, 7.25, 7.25, 7.25, 1L, 7.25))
  }

  test("rollingTime: trailing 1h RANGE frame, same-second events are peers") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val rows = Seq(
      ("u", ts("2024-01-01 09:00:00"), 1L, 1.0),
      ("u", ts("2024-01-01 09:30:00"), 2L, 2.0),
      ("u", ts("2024-01-01 10:00:00"), 3L, 4.0),   // 1h back reaches 09:00
      ("u", ts("2024-01-01 11:30:00"), 4L, 8.0),
      ("u", ts("2024-01-01 11:30:00"), 5L, 16.0))  // same second: peer of id 4
    val got = Timeseries.rollingTime(rows.toDF("k", "ts", "id", "v"),
        "k", "ts", "id", "v", 3600L)
      .collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[Double]("roll_sum"), r.getAs[Long]("n_win"))).toMap
    assert(got(1L) == (1.0, 1L))
    assert(got(2L) == (3.0, 2L))
    assert(got(3L) == (7.0, 3L), "RANGE includes the event exactly 1h back")
    assert(got(4L) == (24.0, 2L), "peers share the frame")
    assert(got(5L) == (24.0, 2L))
  }

  test("acf1: planted alternating series is negative, trending positive, single-event keys absent") {
    val alt = (1 to 30).map(i => ("alt", i.toLong, if (i % 2 == 0) 10.0 else 20.0))
    val trend = (1 to 30).map(i => ("up", i.toLong, i * 1.0 + (i % 3) * 0.01))
    val lone = Seq(("lone", 1L, 5.0))
    val const = (1 to 10).map(i => ("const", i.toLong, 7.0))
    val got = Timeseries.acf1((alt ++ trend ++ lone ++ const)
        .toDF("k", "seq", "v").withColumn("id", col("seq")),
        "k", "seq", "id", "v")
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n_pairs"), Option(r.get(r.fieldIndex("acf1"))))).toMap
    assert(!got.contains("lone"), "single-event key has no pair")
    assert(got("const")._2.isEmpty, "zero variance -> null")
    assert(got("alt")._2.get.asInstanceOf[Double] < -0.9)
    assert(got("up")._2.get.asInstanceOf[Double] > 0.9)
    assert(got("alt")._1 == 29L)
  }

  test("crossCorr: planted proportional series hit +1, anti-proportional -1, one-sided null") {
    def ts(h: Long) = new java.sql.Timestamp(1704067200000L + h * 3600000L)
    val rows =
      // key "pos": purchase cents = 2x click cents per hour -> r = +1
      (1 to 6).flatMap(h => Seq(("pos", ts(h), "click", h * 10.0),
        ("pos", ts(h), "purchase", h * 20.0))) ++
      // key "neg": purchase = 100 - click -> r = -1
      (1 to 6).flatMap(h => Seq(("neg", ts(h), "click", h * 5.0),
        ("neg", ts(h), "purchase", 100.0 - h * 5.0))) ++
      // key "one": clicks only -> zero variance on purchase -> null
      (1 to 6).map(h => ("one", ts(h), "click", h * 1.0))
    val got = Timeseries.crossCorr(rows.toDF("k", "ts", "t", "v"),
        "k", "ts", "t", "v", "click", "purchase")
      .collect().map(r => r.getString(0) ->
        Option(r.get(r.fieldIndex("xcorr")))).toMap
    assert(got("pos").contains(1.0))
    assert(got("neg").contains(-1.0))
    assert(got("one").isEmpty)
  }

  test("twap weights values by hold duration; single-event keys absent, same-second keys null") {
    def ts(sec: Long) = new java.sql.Timestamp(1704067200000L + sec * 1000)
    val rows = Seq(
      // holds: 10s at 10.0, 20s at 20.0; last value (40.0) never held
      ("k", ts(0), 1L, 10.0), ("k", ts(10), 2L, 20.0), ("k", ts(30), 3L, 40.0),
      ("lone", ts(0), 4L, 99.0),
      ("burst", ts(5), 5L, 1.0), ("burst", ts(5), 6L, 2.0))
      .toDF("k", "ts", "id", "v")
    val got = Timeseries.twap(rows, "k", "ts", "id", "v")
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n_holds"), Option(r.get(r.fieldIndex("twap"))))).toMap
    // (10·10 + 20·20) / 30 = 16.666... -> r5
    assert(got("k") == ((2L, Some(16.66667))))
    assert(!got.contains("lone"), "single event has no hold interval")
    assert(got("burst") == ((1L, None)),
      "zero total duration -> null, not a blowup")
  }

  test("rollingMedian picks the exact lower median of the trailing frame") {
    def ts(sec: Long) = new java.sql.Timestamp(1704067200000L + sec * 1000)
    // frame contents at each event (1h window):
    // id1 [5] -> 5; id2 [3,5] -> 3 (lower); id3 [3,5,9] -> 5;
    // id4 falls out of range of 1-3 -> [7] -> 7
    val df = Seq(("k", ts(10), 1L, 5.0), ("k", ts(11), 2L, 3.0),
      ("k", ts(12), 3L, 9.0), ("k", ts(9000), 4L, 7.0))
      .toDF("k", "ts", "id", "v")
    val got = Timeseries.rollingMedian(df, "k", "ts", "id", "v", 3600L)
      .collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[Long]("n_win"), r.getAs[Double]("roll_median"))).toMap
    assert(got == Map(1L -> ((1L, 5.0)), 2L -> ((2L, 3.0)),
      3L -> ((3L, 5.0)), 4L -> ((1L, 7.0))))
  }

  test("interpolate: exact linear values on the grid, event-aligned points return the event") {
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000)
    // key "k": events at sec 3600 (v=10) and 10800 (v=30); grid 3600s →
    // points 3600 (on-event: 10), 7200 (midpoint: 20), 10800 (on-event: 30)
    // key "s": single event -> grid point on it returns the value
    val df = Seq(("k", ts(3600), 1L, 10.0), ("k", ts(10800), 2L, 30.0),
      ("s", ts(7200), 3L, 5.5),
      ("dup", ts(3600), 4L, 1.0), ("dup", ts(3600), 5L, 9.0))
      .toDF("k", "ts", "id", "v")
    val got = Timeseries.interpolate(df, "k", "ts", "id", "v", 3600L)
      .collect().map(r => (r.getString(0), r.getAs[Long]("grid_sec")) ->
        r.getAs[Double]("interp")).toMap
    assert(got(("k", 3600L)) == 10.0)
    assert(got(("k", 7200L)) == 20.0)
    assert(got(("k", 10800L)) == 30.0)
    assert(got(("s", 7200L)) == 5.5)
    // same-second events collapse to the max-id value (step convention)
    assert(got(("dup", 3600L)) == 9.0)
    assert(got.size == 5)
  }

  test("streaming anomalySummaries equals batch anomalies, including cross-batch-shaped state") {
    val rnd = new scala.util.Random(11)
    val base = 1704067200000L
    // irregular spacing ACROSS the 1h window boundary + planted spikes +
    // same-second peers — the cases where buffer eviction could diverge
    val rows = for (k <- 1 to 3; i <- 1 to 120) yield {
      val jitterMs = rnd.nextInt(90000)
      val v = if (i % 37 == 0) 5000.0 else 40 + rnd.nextDouble() * 20
      (k.toLong, new java.sql.Timestamp(base + i * 45000L + jitterMs),
        (k * 1000 + i).toLong, v)
    }
    val peers = Seq( // two events in the same floor-second
      (9L, new java.sql.Timestamp(base + 100), 9001L, 10.0),
      (9L, new java.sql.Timestamp(base + 900), 9002L, 10.0))
    val df = (rows ++ peers).toDF("user_id", "ts", "event_id", "value")
    val stream = Streaming.anomalySummaries(spark, df, 3600L, 3.0, 5L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getAs[Long]("n_win"), r.getAs[Double]("z"))).toMap
    val batchM = Timeseries.anomalies(df, "user_id", "ts", "event_id",
        "value", 3600L, 3.0, 5L)
      .collect().map(r => (r.getLong(0), r.getAs[Long]("event_id")) ->
        (r.getAs[Long]("n_win"), r.getAs[Double]("z"))).toMap
    assert(stream == batchM)
    assert(stream.nonEmpty, "fixture must actually flag some spikes")
  }

  test("streaming ewmaSummaries equals the batch ewma per key") {
    val rnd = new scala.util.Random(47)
    val rows = for (k <- 1 to 4; i <- 1 to 35) yield
      (k.toLong, new java.sql.Timestamp(1704067200000L + i * 60000L),
        (k * 100 + i).toLong, rnd.nextDouble() * 80)
    val df = rows.toDF("user_id", "ts", "event_id", "value")
    val stream = Streaming.ewmaSummaries(spark, df, alpha = 0.25)
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("n_events"), r.getAs[Double]("ewma"))).toMap
    val batch = Timeseries.ewma(df, "user_id", Seq("ts", "event_id"),
        "value", 0.25)
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("n_events"), r.getAs[Double]("ewma"))).toMap
    assert(stream == batch)
  }

  test("seasonal: planted two-hour profile yields 0.5/1.5 indices; zero-sum key is null") {
    val rows =
      (1 to 4).map(i => ("k", s"2024-01-0$i 06:00:00", 10.0)) ++
      (1 to 4).map(i => ("k", s"2024-01-0$i 18:00:00", 30.0)) ++
      Seq(("z", "2024-01-01 06:00:00", 5.0), ("z", "2024-01-01 18:00:00", -5.0))
    val df = rows.toDF("k", "tss", "v")
      .select(col("k"), col("tss").cast("timestamp").as("ts"), col("v"))
    val got = Timeseries.seasonal(df, "k", "ts", "v")
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getAs[Long]("n_events"),
          Option(r.get(r.fieldIndex("seasonal_idx"))))).toMap
    // key mean 20: hour 6 runs at 10 (idx 0.5), hour 18 at 30 (idx 1.5)
    assert(got(("k", 6L)) == ((4L, Some(0.5))))
    assert(got(("k", 18L)) == ((4L, Some(1.5))))
    assert(got(("z", 6L))._2.isEmpty && got(("z", 18L))._2.isEmpty,
      "zero total -> null index, not a division blowup")
  }

  test("anomalies flags only the planted spike, not sparse or calm windows") {
    val base = 1704067200000L
    // key "calm": 20 events in one hour, all value 50 except one 500 spike
    val calm = (1 to 20).map(i => ("k", base + i * 60000L, i.toLong,
      if (i == 15) 500.0 else 50.0))
    // key "sparse": 3 wild events in an hour — under minN, never flags
    val sparse = Seq(("s", base, 100L, 1.0), ("s", base + 60000L, 101L, 999.0),
      ("s", base + 120000L, 102L, 1.0))
    val df = (calm ++ sparse).map { case (k, ms, id, v) =>
      (k, new java.sql.Timestamp(ms), id, v) }
      .toDF("k", "ts", "id", "v")
    val got = Timeseries.anomalies(df, "k", "ts", "id", "v",
        windowSeconds = 3600L, threshold = 3.0, minN = 5L)
      .collect().map(r => (r.getString(0), r.getAs[Long]("id"))).toSet
    assert(got == Set(("k", 15L)),
      s"only the spike at id=15 should flag, got $got")
  }

  test("ewma edge cases: single event returns its value; alpha=1 returns the last value") {
    val one = Seq(("u", 1L, 42.125)).toDF("k", "seq", "v")
    assert(Timeseries.ewma(one, "k", Seq("seq"), "v", 0.25)
      .collect().head.getAs[Double]("ewma") == 42.125)
    val many = Seq(("u", 1L, 5.0), ("u", 2L, 7.0), ("u", 3L, 9.5))
      .toDF("k", "seq", "v")
    assert(Timeseries.ewma(many, "k", Seq("seq"), "v", 1.0)
      .collect().head.getAs[Double]("ewma") == 9.5)
  }

  test("holtWinters: hand-checked additive triple smoothing, period 2") {
    // x = [4, 6, 8], α=β=γ=0.5: i=2 slot2 → l=5 b=0.5 s=[0,0.5];
    // i=3 slot1 → l=6.75 b=1.125 s=[0.625,0.5]; next slot = 2 →
    // season 0.5, forecast 6.75+1.125+0.5 = 8.375
    val rows = Seq(("u", 1L, 4.0), ("u", 2L, 6.0), ("u", 3L, 8.0))
      .toDF("k", "seq", "v")
    val got = Timeseries.holtWinters(rows, "k", Seq("seq"), "v",
        alpha = 0.5, beta = 0.5, gamma = 0.5, period = 2)
      .as[(String, Long, Double, Double, Double, Double)].collect().head
    assert(got == (("u", 3L, 6.75, 1.125, 0.5, 8.375)), s"got $got")
    assertThrows[IllegalArgumentException](
      Timeseries.holtWinters(rows, "k", Seq("seq"), "v", 0.5, 0.5, 0.5,
        period = 1))
  }

  test("theilSen: lower-median pairwise slope, same-second pairs excluded") {
    import org.apache.spark.sql.functions.col
    // points (0s, 0.00) (1s, 1.00) (2s, 0.50): slopes 1.0, 0.25, -0.5 —
    // lower median 0.25 (OLS on the same points gives 0.25 too, but one
    // wild point would move OLS, not this)
    val pts = Seq(("u", 0L, 0.00), ("u", 1L, 1.00), ("u", 2L, 0.50))
      .toDF("k", "sec", "v")
      .select(col("k"), col("sec").cast("timestamp").as("ts"), col("v"))
    val got = Timeseries.theilSen(pts, "k", "ts", "v")
      .as[(String, Long, Double)].collect().toSeq
    assert(got == Seq(("u", 3L, 0.25)))
    // even count picks the LOWER median: 6 slopes sorted, position 3
    val pts4 = Seq(("u", 0L, 0.00), ("u", 1L, 1.00), ("u", 2L, 0.50),
      ("u", 3L, 3.50)).toDF("k", "sec", "v")
      .select(col("k"), col("sec").cast("timestamp").as("ts"), col("v"))
    assert(Timeseries.theilSen(pts4, "k", "ts", "v")
      .as[(String, Long, Double)].collect().toSeq == Seq(("u", 6L, 1.0)))
    // a key whose points share one second has no slope at all
    val flat = Seq(("w", 5L, 1.0), ("w", 5L, 9.0)).toDF("k", "sec", "v")
      .select(col("k"), col("sec").cast("timestamp").as("ts"), col("v"))
    assert(Timeseries.theilSen(flat, "k", "ts", "v").collect().isEmpty)
  }
}
