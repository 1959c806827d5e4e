package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CleanSpec extends SparkSpec {
  import spark.implicits._

  test("zscoreOutliers flags exactly the planted extreme, per group") {
    // group a: 10 values at 1.0 plus one at 100 -> only 100 flags;
    // group b: tight cluster, nothing flags
    val rows = (1L to 10L).map(i => (i, "a", 1.0)) ++ Seq((11L, "a", 100.0)) ++
      (12L to 20L).map(i => (i, "b", 5.0 + (i % 3) * 0.1))
    val df = rows.toDF("id", "g", "v")
    val out = Clean.zscoreOutliers(df, "v", "g", Seq("id"), threshold = 2.0)
      .select("id").as[Long].collect().toSeq
    assert(out == Seq(11L))
  }

  test("winsorize clips planted extremes and reports exact discrete bounds") {
    // 1..20 in one group: p05 cut = element at rank 1 (=1), p95 at rank 19
    val df = (1L to 20L).map(i => (i, "g", i.toDouble)).toDF("id", "g", "v")
    val r = Clean.winsorize(df, "v", "g", pLo = 0.05, pHi = 0.95)
      .collect().head
    assert(r.getAs[Double]("lo") == 1.0 && r.getAs[Double]("hi") == 19.0)
    assert(r.getAs[Long]("n_lo") == 0 && r.getAs[Long]("n_hi") == 1)
    // clipped sum: 1..19 plus 20->19
    assert(r.getAs[Double]("wsum") == ((1 to 19).sum + 19).toDouble)
    assert(r.getAs[Long]("n") == 20)
  }

  test("empty input yields empty output (no null-stat rows) for both cleaners") {
    val empty = Seq.empty[(Long, String, Double)].toDF("id", "g", "v")
    assert(Clean.zscoreOutliers(empty, "v", "g", Seq("id"), 2.0).count() == 0)
    assert(Clean.winsorize(empty, "v", "g").count() == 0)
  }

  test("percentileCuts == brute-force rank-k over random grouped data (duplicates included)") {
    val rnd = new scala.util.Random(11)
    val rows = (1 to 400).map { _ =>
      (s"g${rnd.nextInt(4)}", rnd.nextInt(25).toDouble)
    }
    val ps = Seq("p01" -> 0.01, "p25" -> 0.25, "p50" -> 0.5, "p100" -> 1.0)
    val got = Clean.percentileCuts(rows.toDF("g", "v"), "v", "g", ps)
      .collect().map(r => r.getString(0) ->
        ps.map { case (n, _) => r.getAs[Double](n) }).toMap
    val want = rows.groupBy(_._1).map { case (g, vs) =>
      val sorted = vs.map(_._2).sorted
      g -> ps.map { case (_, p) =>
        sorted(math.max(1, math.ceil(p * sorted.size).toInt) - 1) }
    }
    assert(got == want)
  }

  test("weightedQuantiles == brute-force weighted rank over random grouped data") {
    val rnd = new scala.util.Random(7)
    val rows = (1 to 300).map { _ =>
      (s"g${rnd.nextInt(3)}", rnd.nextInt(20).toDouble, (1 + rnd.nextInt(9)).toDouble)
    }
    val ps = Seq("q10" -> 0.1, "q50" -> 0.5, "q90" -> 0.9, "q100" -> 1.0)
    val got = Clean.weightedQuantiles(rows.toDF("g", "v", "w"), "v", "w", "g", ps)
      .collect().map(r => r.getString(0) ->
        ps.map { case (n, _) => r.getAs[Double](n) }).toMap
    val want = rows.groupBy(_._1).map { case (g, vs) =>
      val sorted = vs.map(t => (t._2, t._3.toLong)).sortBy(_._1)
      val total = sorted.map(_._2).sum
      g -> ps.map { case (_, p) =>
        val k = math.max(1L, math.ceil(p * total).toLong)
        var cum = 0L
        sorted.find { case (_, w) => cum += w; cum >= k }.get._1
      }
    }
    assert(got == want)
  }

  test("weightedQuantiles with weight 1 reduces exactly to percentileCuts") {
    val rnd = new scala.util.Random(13)
    val rows = (1 to 200).map(_ => (s"g${rnd.nextInt(3)}", rnd.nextInt(30).toDouble))
    val df = rows.toDF("g", "v").withColumn("one", lit(1.0))
    val ps = Seq("q25" -> 0.25, "q50" -> 0.5, "q75" -> 0.75)
    val a = Clean.weightedQuantiles(df, "v", "one", "g", ps)
      .collect().map(r => r.getString(0) -> ps.map(p => r.getAs[Double](p._1))).toMap
    val b = Clean.percentileCuts(df, "v", "g", ps)
      .collect().map(r => r.getString(0) -> ps.map(p => r.getAs[Double](p._1))).toMap
    assert(a == b)
  }

  test("winsorize accepts pLo = 0 (documented domain): low cut = group minimum, nothing clipped low") {
    val df = (1 to 20).map(i => (i.toLong, "g", i.toDouble)).toDF("id", "g", "v")
    val r = Clean.winsorize(df, "v", "g", pLo = 0.0, pHi = 0.95).collect().head
    assert(r.getAs[Double]("lo") == 1.0 && r.getAs[Long]("n_lo") == 0)
  }

  test("madOutliers flags the planted extreme the stddev method misses") {
    // group a: 20 tight values + THREE extremes. The extremes inflate the
    // sample stddev enough that z-scoring at 3.5 misses all of them
    // (masking); median/MAD flags all three.
    val rows = (1L to 20L).map(i => (i, "a", 10.0 + (i % 5) * 0.1)) ++
      Seq((21L, "a", 500.0), (22L, "a", 510.0), (23L, "a", 520.0))
    val df = rows.toDF("id", "g", "v")
    val mad = Clean.madOutliers(df, "v", "g", Seq("id"), threshold = 3.5)
      .select("id").as[Long].collect().toSet
    assert(mad == Set(21L, 22L, 23L))
    val z = Clean.zscoreOutliers(df, "v", "g", Seq("id"), threshold = 3.5)
      .select("id").as[Long].collect().toSet
    assert(z.isEmpty) // the masking this operator exists to fix
  }

  test("madOutliers: discrete median/MAD match brute force; rz value exact") {
    val vs = Seq(1.0, 2.0, 3.0, 4.0, 100.0)
    val df = vs.zipWithIndex.map { case (v, i) => (i.toLong, "g", v) }
      .toDF("id", "g", "v")
    // sorted = [1,2,3,4,100], n=5, rank ceil(2.5)=3 -> med=3
    // devs sorted = [0,1,1,2,97] -> mad=1
    val r = Clean.madOutliers(df, "v", "g", Seq("id"), threshold = 3.5)
      .collect()
    assert(r.length == 1)
    assert(r.head.getAs[Double]("med") == 3.0)
    assert(r.head.getAs[Double]("mad") == 1.0)
    assert(r.head.getAs[Double]("rz") ==
      BigDecimal(0.6745 * 97).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble)
  }

  test("madOutliers: constant-majority group (MAD=0) yields no flags, not a divide error") {
    val df = ((1L to 9L).map(i => (i, "g", 5.0)) :+ (10L, "g", 50.0))
      .toDF("id", "g", "v")
    // median=5, deviations = eight 0s + 45 -> MAD=0 -> null rz -> filtered
    assert(Clean.madOutliers(df, "v", "g", Seq("id"), 3.5).count() == 0)
  }

  test("single-value group: sd=0 -> no outliers (null z filtered); winsorize degenerates to identity") {
    val df = Seq((1L, "g", 5.0), (2L, "g", 5.0)).toDF("id", "g", "v")
    // sd = 0 -> z is null -> abs(z) > t is null -> filtered, not crashed
    assert(Clean.zscoreOutliers(df, "v", "g", Seq("id"), 2.0).count() == 0)
    val r = Clean.winsorize(df, "v", "g").collect().head
    assert(r.getAs[Double]("lo") == 5.0 && r.getAs[Double]("hi") == 5.0)
    assert(r.getAs[Long]("n_lo") == 0 && r.getAs[Long]("n_hi") == 0)
  }
}
