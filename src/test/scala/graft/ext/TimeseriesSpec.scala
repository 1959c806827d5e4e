package graft.ext

import graft.SparkSpec

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
        BigDecimal(refEwma(vs, 0.25)).setScale(5, BigDecimal.RoundingMode.HALF_UP)
          .toDouble)
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

  test("ewma edge cases: single event returns its value; alpha=1 returns the last value") {
    val one = Seq(("u", 1L, 42.125)).toDF("k", "seq", "v")
    assert(Timeseries.ewma(one, "k", Seq("seq"), "v", 0.25)
      .collect().head.getAs[Double]("ewma") == 42.125)
    val many = Seq(("u", 1L, 5.0), ("u", 2L, 7.0), ("u", 3L, 9.5))
      .toDF("k", "seq", "v")
    assert(Timeseries.ewma(many, "k", Seq("seq"), "v", 1.0)
      .collect().head.getAs[Double]("ewma") == 9.5)
  }
}
