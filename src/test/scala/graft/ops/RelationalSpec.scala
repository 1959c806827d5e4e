package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.ops.Relational._

class RelationalSpec extends SparkSpec {
  import spark.implicits._

  test("conj of empty predicate list selects everything (absent WHERE, etl_io.py:269)") {
    val df = Seq(1, 2, 3).toDF("x")
    assert(df.where(conj(Nil)).count() == 3)
  }

  test("conj ANDs multiple predicates") {
    val df = Seq(1, 2, 3, 4).toDF("x")
    assert(df.where(conj(Seq(col("x") > 1, col("x") < 4))).count() == 2)
  }

  test("semiJoin keeps fact rows with a matching dim key, never duplicates on dup dims (etl_io.py:354-357)") {
    val facts = Seq((1, "a"), (2, "b"), (3, "c")).toDF("k", "v")
    val dims = Seq(1, 1, 2).toDF("k") // duplicate dim keys must not fan out
    val out = semiJoin(facts, dims, "k")
    assert(out.collect().map(_.getInt(0)).sorted.toSeq == Seq(1, 2))
  }

  test("antiJoin keeps fact rows without a matching dim key") {
    val facts = Seq((1, "a"), (2, "b"), (3, "c")).toDF("k", "v")
    val dims = Seq(1).toDF("k")
    assert(antiJoin(facts, dims, "k").collect().map(_.getInt(0)).sorted.toSeq == Seq(2, 3))
  }

  test("dedupPairs drops nulls and duplicate mapping rows before a join (etl_io.py:922)") {
    val stone = Seq(
      (Some("a"), Some("x")), (Some("a"), Some("x")),
      (Some("b"), None), (None, Some("y"))).toDF("l", "r")
    assert(dedupPairs(stone, "l", "r").count() == 1)
  }

  test("asofJoin attaches the latest right row at or before each left ts; inner drops unmatched") {
    val clicks = Seq((10L, 1L, 10L), (20L, 1L, 20L), (30L, 2L, 7L))
      .toDF("click_id", "k", "ts")
    val quotes = Seq((1L, 5L, 1.0), (1L, 20L, 2.0), (1L, 25L, 3.0))
      .toDF("k", "ts", "q")
    val out = asofJoin(clicks, quotes, "k", "ts", Seq("q"))
      .orderBy("click_id").collect()
      .map(r => (r.getAs[Long]("click_id"), r.getAs[Double]("q")))
    // ts=10 -> quote@5; ts=20 -> quote@20 (equal ts matches); k=2 unmatched dropped
    assert(out.toSeq == Seq((10L, 1.0), (20L, 2.0)))
    val left = asofJoin(clicks, quotes, "k", "ts", Seq("q"), how = "left")
      .orderBy("click_id").collect()
    assert(left.length == 3 && left(2).isNullAt(left(2).fieldIndex("q")))
  }

  test("rangeJoin matches interval containment exactly, including bin-straddling intervals") {
    val points = Seq((1L, 0.5), (2L, 10.0), (3L, 99.9), (4L, 150.0))
      .toDF("id", "value")
    val ivals = Seq((0.0, 10.0, "a"), (5.0, 120.0, "b")) // b straddles bins
      .toDF("lo", "hi", "band")
    val out = rangeJoin(points, ivals, "value", "lo", "hi", binSize = 10.0)
      .select("id", "band").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    // 0.5 in a only; 10.0 in b only (hi-exclusive for a); 99.9 in b; 150 nowhere
    assert(out == Set((1L, "a"), (2L, "b"), (3L, "b")))
  }

  test("dsum is exact for 2-decimal doubles regardless of partitioning") {
    val vals = (1 to 1000).map(i => i * 0.01)
    val one = vals.toDF("v").coalesce(1).agg(dsum(col("v"))).head.getDouble(0)
    val many = vals.toDF("v").repartition(7).agg(dsum(col("v"))).head.getDouble(0)
    assert(one == many)
    assert(one == 5005.0) // sum(1..1000)*0.01 exactly
  }

  test("inList builds an isin predicate") {
    val df = Seq("a", "b", "c").toDF("x")
    assert(df.where(inList(col("x"), Seq("a", "c"))).count() == 2)
  }

  test("bloomPrunedJoin equals the plain join (no false negatives survive the final join)") {
    val probe = (1L to 500L).map(i => (i % 97, i)).toDF("pk", "pv")
    val build = Seq((3L, "x"), (10L, "y"), (96L, "z")).toDF("bk", "bv")
    val got = bloomPrunedJoin(probe, build, "pk", "bk",
        expectedItems = 100, numBits = 4096)
      .select("pk", "pv", "bv").collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val want = probe.join(build, col("pk") === col("bk"))
      .select("pk", "pv", "bv").collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(got == want && want.nonEmpty)
  }

  test("bloomPrunedJoin with an empty build side returns the empty join, not a crash") {
    val probe = Seq((1L, "a")).toDF("pk", "pv")
    val build = Seq((1L, "b")).toDF("bk", "bv").where(lit(false))
    assert(bloomPrunedJoin(probe, build, "pk", "bk").count() == 0)
  }

  test("debounce keeps an event only when > gap after the key's PREVIOUS event (not previous kept)") {
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def at(s: Long) = new java.sql.Timestamp(base.getTime + s * 1000)
    // one user: events at 0s, 200s, 400s with gap=300 — 200s is within 300
    // of 0s (drop); 400s is within 300 of the previous EVENT at 200s (drop
    // too, even though 200s itself was dropped): the lag rule, exactly what
    // the dedup_debounce oracle computes
    val ev = Seq(
      (1L, "u", at(0)), (2L, "u", at(200)), (3L, "u", at(400)),
      (4L, "v", at(0)), (5L, "v", at(400))
    ).toDF("event_id", "k", "ts")
    val kept = debounce(ev, Seq("k"), "ts", "event_id", gapSeconds = 300)
      .select("event_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(kept == Seq(1L, 4L, 5L))
  }

  test("debounce breaks equal-ts ties by id deterministically") {
    val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val ev = Seq((2L, "u", ts), (1L, "u", ts)).toDF("event_id", "k", "ts")
    val kept = debounce(ev, Seq("k"), "ts", "event_id", gapSeconds = 300)
      .select("event_id").collect().map(_.getLong(0)).toSeq
    assert(kept == Seq(1L)) // id 1 sorts first; id 2 is 0s after it -> dropped
  }

  test("intervalJoin emits each overlapping pair exactly once; touching endpoints excluded") {
    val a = Seq((1L, 0.0, 25.0), (2L, 30.0, 35.0)).toDF("aid", "a_lo", "a_hi")
    val b = Seq(
      (10L, 5.0, 50.0),  // overlaps a1 across bins 0,1,2 and a2
      (11L, 25.0, 28.0), // touches a1 at 25 (half-open -> NO overlap)
      (12L, 60.0, 70.0)  // disjoint
    ).toDF("bid", "b_lo", "b_hi")
    val out = intervalJoin(a, b, "a_lo", "a_hi", "b_lo", "b_hi", binSize = 10.0)
      .select("aid", "bid").as[(Long, Long)].collect().toSeq.sorted
    // (1,10) must appear ONCE despite sharing 3 bins
    assert(out == Seq((1L, 10L), (2L, 10L)))
  }
}
