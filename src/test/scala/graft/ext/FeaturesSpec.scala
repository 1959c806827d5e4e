package graft.ext

import graft.SparkSpec

class FeaturesSpec extends SparkSpec {
  import spark.implicits._

  test("targetEncodeLoo excludes the row's own target; singleton categories are null") {
    val df = Seq(
      (1L, "a", 1.0), (2L, "a", 2.0), (3L, "a", 3.0),
      (4L, "b", 9.9))
      .toDF("id", "cat", "y")
    val got = Features.targetEncodeLoo(df, "id", "cat", "y")
      .collect()
      .map(r => r.getLong(0) -> Option(r.get(r.fieldIndex("te_loo"))))
      .toMap
    assert(got(1L).contains(2.5)) // (2+3)/2
    assert(got(2L).contains(2.0)) // (1+3)/2
    assert(got(3L).contains(1.5)) // (1+2)/2
    assert(got(4L).isEmpty, "singleton category must be null, not 0 or own mean")
  }

  test("quantileBin: quartiles of 1..8 land two per bin; ties bin downward") {
    val df = (1 to 8).map(i => (i.toLong, "g", i.toDouble))
      .toDF("id", "grp", "v")
    val got = Features.quantileBin(df, "v", "grp", Seq("id"), nBins = 4)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("bin")).toMap
    // cuts = elements at ranks 2, 4, 6 -> values 2, 4, 6; strict > means
    // the cut value itself stays in the lower bin
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 2L,
      5L -> 3L, 6L -> 3L, 7L -> 4L, 8L -> 4L))
  }

  test("quantileBin respects groups independently") {
    val df = (Seq((1L, "lo", 1.0), (2L, "lo", 2.0)) ++
      Seq((3L, "hi", 100.0), (4L, "hi", 200.0)))
      .toDF("id", "grp", "v")
    val got = Features.quantileBin(df, "v", "grp", Seq("id"), nBins = 2)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("bin")).toMap
    // per group of 2: median cut = element at rank 1; the larger value
    // exceeds it -> bin 2 in ITS group even though 2.0 << 100.0
    assert(got == Map(1L -> 1L, 2L -> 2L, 3L -> 1L, 4L -> 2L))
  }

  test("rankNormalize maps values to r/(n+1); duplicate values rank by id") {
    val df = Seq((1L, "g", 30.0), (2L, "g", 10.0), (3L, "g", 20.0),
      (4L, "g", 10.0)) // duplicate value: ids 2 then 4
      .toDF("id", "grp", "v")
    val got = Features.rankNormalize(df, "id", "grp", "v")
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("u")).toMap
    assert(got == Map(2L -> 0.2, 4L -> 0.4, 3L -> 0.6, 1L -> 0.8))
  }

  test("hashedCounts: same token same bucket, counts add, totals preserved") {
    val df = Seq((1L, "alpha beta alpha"), (2L, "beta gamma"))
      .toDF("id", "text")
    val rows = Features.hashedCounts(df, "id", "text", dims = 64)
      .collect().map(r => (r.getLong(0), r.getAs[Long]("bucket"),
        r.getAs[Long]("n")))
    assert(rows.forall { case (_, b, _) => b >= 0 && b < 64 })
    // token totals survive the hashing (3 tokens doc1, 2 tokens doc2)
    assert(rows.filter(_._1 == 1L).map(_._3).sum == 3L)
    assert(rows.filter(_._1 == 2L).map(_._3).sum == 2L)
    // 'beta' lands in the same bucket for both docs
    val beta1 = rows.filter { case (id, _, n) => id == 1L && n == 1L }.map(_._2)
    val beta2 = rows.filter(_._1 == 2L).map(_._2)
    assert(beta1.exists(beta2.contains), "shared token must share a bucket")
  }

  test("standardize: population z-scores of {1,2,3}; constant group is null") {
    val df = Seq((1L, "g", 1.0), (2L, "g", 2.0), (3L, "g", 3.0),
      (4L, "c", 7.0), (5L, "c", 7.0))
      .toDF("id", "grp", "v")
    val got = Features.standardize(df, Seq("id"), "grp", "v")
      .collect()
      .map(r => r.getLong(0) -> Option(r.get(r.fieldIndex("z")))).toMap
    // sigma_pop({1,2,3}) = sqrt(2/3); (3-2)/sigma = 1.22474 after r5
    assert(got(2L).contains(0.0))
    assert(got(1L).contains(-1.22474) && got(3L).contains(1.22474))
    assert(got(4L).isEmpty && got(5L).isEmpty,
      "zero-variance group must yield null, not 0")
  }

  test("decayScore: whole-period dyadic weights, horizon cap, hand-checked") {
    import spark.implicits._
    // halfLife 7 / horizon 84 → H=12. Events: today (w=2^12), exactly one
    // period old (2^11), ancient 100d (capped to e=12, w=1):
    // (4096 + 2048 + 1)·100c / (4096·100) = 6145/4096 = 1.500244…
    val rows = Seq(
      ("u", "2024-06-30 12:00:00", 1.0),
      ("u", "2024-06-23 01:00:00", 1.0),
      ("u", "2024-03-22 09:00:00", 1.0),
      ("v", "2024-06-25 00:00:00", 2.0) // 5 days = 0 whole periods → full
    ).toDF("k", "ts", "v")
      .withColumn("ts", org.apache.spark.sql.functions.col("ts")
        .cast("timestamp"))
    val got = Features.decayScore(rows, "k", "ts", "v",
        halfLifeDays = 7, horizonDays = 84)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got("u") == 1.50024, s"got ${got("u")}")
    assert(got("v") == 2.0, "ages under one half-life decay nothing")
    assertThrows[IllegalArgumentException](
      Features.decayScore(rows, "k", "ts", "v", 7, 85)) // not a multiple
    assertThrows[IllegalArgumentException](
      Features.decayScore(rows, "k", "ts", "v", 1, 60)) // 2^60 overflows
  }

  test("woeEncode: smoothed WOE and IV hand-checked") {
    // A: pos 2 / neg 1, B: pos 0 / neg 3; P=2, N=4, s=0.5
    // woe(A) = ln((2.5/2)/(1.5/4)) = ln(10/3) = 1.2039728 → 1.20397
    // iv(A)  = (1.25 − 0.375)·1.2039728 = 1.0534762 → 1.05348
    // woe(B) = ln((0.5/2)/(3.5/4)) = −1.2527630 → −1.25276
    // iv(B)  = (0.25 − 0.875)·(−1.2527630) = 0.7829769 → 0.78298
    val df = Seq(("A", true), ("A", true), ("A", false),
      ("B", false), ("B", false), ("B", false)).toDF("cat", "lbl")
    val got = Features.woeEncode(df, "cat",
        org.apache.spark.sql.functions.col("lbl"))
      .as[(String, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got("A") == ((2L, 1L, 1.20397, 1.05348)))
    assert(got("B") == ((0L, 3L, -1.25276, 0.78298)))
  }

  test("targetEncodeKFold: own fold excluded, single-fold category NULL, deterministic") {
    val df = Seq((1L, "A", 10.0), (2L, "A", 20.0), (3L, "A", 30.0),
      (4L, "A", 40.0), (5L, "B", 7.0)).toDF("id", "cat", "y")
    val out = Features.targetEncodeKFold(df, "id", "cat", "y", folds = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(2), if (r.isNullAt(3)) None else Some(r.getDouble(3)))))
      .toMap
    // replay the hash fold assignment and the exclusion by hand
    def fold(id: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(15), 16) % 2
    }
    val cents = Map(1L -> 1000L, 2L -> 2000L, 3L -> 3000L, 4L -> 4000L)
    for (id <- Seq(1L, 2L, 3L, 4L)) {
      val mine = fold(id)
      assert(out(id)._1 == mine)
      val others = cents.filter { case (j, _) => fold(j) != mine }.values
      if (others.isEmpty) assert(out(id)._2.isEmpty)
      else {
        val exp = math.floor(others.sum / 100.0 / others.size * 100000 + 0.5) / 100000.0
        assert(out(id)._2.contains(exp), s"id=$id got ${out(id)._2} want $exp")
      }
    }
    // B exists only in id 5's fold -> its own fold is the whole category
    assert(out(5L)._2.isEmpty)
    // the assignment is content-determined: a reshuffled frame agrees
    val out2 = Features.targetEncodeKFold(df.repartition(7), "id", "cat", "y",
      folds = 2).collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert((1L to 5L).forall(id => out2(id) == out(id)._1))
  }
}
