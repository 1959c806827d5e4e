package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RetentionSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("cohortRetention cohorts by first month and counts distinct active months") {
    val df = Seq(
      (1L, ts("2024-01-05 00:00:00")), // u1 cohort Jan, active Jan+Mar
      (1L, ts("2024-01-20 00:00:00")),
      (1L, ts("2024-03-02 00:00:00")),
      (2L, ts("2024-02-10 00:00:00"))  // u2 cohort Feb, active Feb only
    ).toDF("u", "t")
    val out = Retention.cohortRetention(df, "u", "t")
      .orderBy("cohort_month", "month_offset")
      .as[(String, Long, Long)].collect().toSeq
    assert(out == Seq(
      ("2024-01-01", 0L, 1L), ("2024-01-01", 2L, 1L), ("2024-02-01", 0L, 1L)))
  }

  test("rollingActive counts an entity toward the trailing window on observed days only") {
    // u1 active day 1; u2 active days 1 and 3; only days 1 and 3 observed.
    // day1: {u1,u2}=2. day3: both still in the 3-day trailing window = 2.
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00")),
      (2L, ts("2024-01-01 11:00:00")),
      (2L, ts("2024-01-03 09:00:00"))
    ).toDF("u", "t")
    val out = Retention.rollingActive(df, "u", "t", windowDays = 3)
      .orderBy("day").as[(String, Long)].collect().toSeq
    assert(out == Seq(("2024-01-01", 2L), ("2024-01-03", 2L)))
    // a 1-day window degenerates to plain DAU
    val dau = Retention.rollingActive(df, "u", "t", windowDays = 1)
      .orderBy("day").as[(String, Long)].collect().toSeq
    assert(dau == Seq(("2024-01-01", 2L), ("2024-01-03", 1L)))
  }

  test("empty stream yields empty retention matrix and active series") {
    val empty = Seq.empty[(Long, java.sql.Timestamp)].toDF("u", "t")
    assert(Retention.cohortRetention(empty, "u", "t").count() == 0)
    assert(Retention.rollingActive(empty, "u", "t").count() == 0)
  }

  test("kaplanMeier: hand-checked curve with right-censoring at corpus end") {
    import org.apache.spark.sql.functions.col
    // u1 dies t=0, u2 dies t=1, u3 (t=3) and u4 (t=2) end on the corpus's
    // final day → censored; S = 3/4 at t=0, then ×(1−1/3) = 1/2, flat after
    def ts(s: String) = s"$s 10:00:00"
    val ev = Seq(
      (1L, ts("2024-01-01")),
      (2L, ts("2024-01-01")), (2L, ts("2024-01-02")),
      (3L, ts("2024-01-01")), (3L, ts("2024-01-04")),
      (4L, ts("2024-01-02")), (4L, ts("2024-01-04"))
    ).toDF("u", "t").select(col("u"), col("t").cast("timestamp").as("t"))
    val got = Retention.kaplanMeier(ev, "u", "t")
      .as[(Long, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got == Map(
      0L -> ((4L, 1L, 0L, 0.75)),
      1L -> ((3L, 1L, 0L, 0.5)),
      2L -> ((2L, 0L, 1L, 0.5)),
      3L -> ((1L, 0L, 1L, 0.5))))
  }
}
