package graft.ext

import graft.SparkSpec

class FunnelSpec extends SparkSpec {
  import spark.implicits._

  test("funnel counts only in-order completions; same-ts steps count; wrong-order users don't") {
    val events = Seq(
      // user 1: full funnel in order
      (1L, 10L, "signup"), (1L, 20L, "click"), (1L, 30L, "purchase"),
      // user 2: click BEFORE signup, purchase after → reaches signup only
      (2L, 20L, "click"), (2L, 30L, "signup"), (2L, 40L, "purchase"),
      // wait — user 2's purchase follows signup but no click after signup:
      // steps are sequential, so purchase can't count without step-2 click
      // user 3: signup and click at the SAME ts (>= is inclusive), no purchase
      (3L, 10L, "signup"), (3L, 10L, "click"),
      // user 4: never signs up
      (4L, 10L, "click"), (4L, 20L, "purchase")
    ).toDF("user_id", "ts", "event_type")
    val out = Funnel.funnel(events, "user_id", "ts", "event_type",
        Seq("signup", "click", "purchase"))
      .as[(Long, String, Long)].collect().toSet
    assert(out == Set(
      (1L, "signup", 3L),   // users 1, 2, 3
      (2L, "click", 2L),    // users 1, 3 (user 2's click precedes signup)
      (3L, "purchase", 1L)  // user 1 only
    ))
  }

  test("funnel rejects equal consecutive steps (one event would satisfy both)") {
    val events = Seq((1L, 10L, "click")).toDF("user_id", "ts", "event_type")
    intercept[IllegalArgumentException] {
      Funnel.funnel(events, "user_id", "ts", "event_type", Seq("click", "click"))
    }
  }

  test("sessionizeBatch compares gaps at sub-second precision (no floor-seconds merge)") {
    import org.apache.spark.sql.functions.{col, timestamp_micros}
    val base = 1704067200000000L // 2024-01-01 00:00:00 UTC in micros
    // gap of exactly 1800 s -> same session; gap of 1800.000050 s -> split.
    // Floor-to-seconds arithmetic would read BOTH as 1800 and merge them.
    val df = Seq(
      (1L, 1L, base), (2L, 1L, base + 1800L * 1000000),
      (3L, 2L, base), (4L, 2L, base + 1800L * 1000000 + 50)
    ).toDF("event_id", "user_id", "us")
      .select(col("event_id"), col("user_id"),
        timestamp_micros(col("us")).as("ts"))
    val out = Funnel.sessionizeBatch(df, "user_id", "ts",
        Seq("event_id"), gapMinutes = 30)
      .groupBy("user_id").count()
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 1L, 2L -> 2L))
  }

  test("transitions counts consecutive pairs per user and normalizes per from-state") {
    // user 1: view click purchase view click -> v→c ×2, c→p, p→v
    // user 2: click view -> c→v
    val rows = Seq(
      (1L, 1L, "view"), (1L, 2L, "click"), (1L, 3L, "purchase"),
      (1L, 4L, "view"), (1L, 5L, "click"),
      (2L, 1L, "click"), (2L, 2L, "view"))
      .map { case (u, i, t) =>
        (u, new java.sql.Timestamp(1704067200000L + i * 1000), i, t)
      }
    val got = Funnel.transitions(
        rows.toDF("user_id", "ts", "event_id", "event_type"),
        "user_id", "ts", Seq("event_id"), "event_type")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Long]("n"), r.getAs[Double]("p"))).toMap
    assert(got == Map(
      ("view", "click") -> (2L, 1.0),
      ("click", "purchase") -> (1L, 0.5),
      ("click", "view") -> (1L, 0.5),
      ("purchase", "view") -> (1L, 1.0)))
  }

  test("funnelWindowed counts only conversions inside the anchor window") {
    def ts(sec: Long) = new java.sql.Timestamp(1704067200000L + sec * 1000)
    val rows = Seq(
      // user 1: converts fully within the hour
      (1L, ts(0), "signup"), (1L, ts(100), "click"), (1L, ts(200), "purchase"),
      // user 2: clicks inside the window, purchases after it closes
      (2L, ts(0), "signup"), (2L, ts(3599), "click"), (2L, ts(5000), "purchase"),
      // user 3: click arrives past the anchor window entirely
      (3L, ts(0), "signup"), (3L, ts(4000), "click"), (3L, ts(4100), "purchase"))
    val df = rows.toDF("user_id", "ts", "event_type")
    val got = Funnel.funnelWindowed(df, "user_id", "ts", "event_type",
        Seq("signup", "click", "purchase"), windowSeconds = 3600L)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("n_users")).toMap
    assert(got == Map(1L -> 3L, 2L -> 2L, 3L -> 1L))
    // sanity: the unbounded funnel would convert everyone
    val unbounded = Funnel.funnel(df, "user_id", "ts", "event_type",
        Seq("signup", "click", "purchase"))
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("n_users")).toMap
    assert(unbounded == Map(1L -> 3L, 2L -> 3L, 3L -> 3L))
  }

  test("pathTrigrams counts 3-step journeys with a deterministic top-k boundary") {
    // user 1: a b c a b c -> abc×2, bca, cab; user 2: a b c -> abc
    val rows = (Seq("a", "b", "c", "a", "b", "c").zipWithIndex
        .map { case (t, i) => (1L, i.toLong, t) }) ++
      (Seq("a", "b", "c").zipWithIndex.map { case (t, i) => (2L, i.toLong, t) })
    val df = rows.map { case (u, i, t) =>
      (u, new java.sql.Timestamp(1704067200000L + i * 1000), i, t)
    }.toDF("user_id", "ts", "event_id", "event_type")
    val got = Funnel.pathTrigrams(df, "user_id", "ts", Seq("event_id"),
        "event_type", k = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getAs[Long]("n"))).toList
    // abc: 3; then bca and cab tie at 1 -> lexicographic picks bca
    assert(got == List(("a", "b", "c", 3L), ("b", "c", "a", 1L)))
  }

  test("typeEntropy: uniform 2-type user = ln 2, one-trick user = 0, skew in between") {
    val rows =
      Seq((1L, "a"), (1L, "b"), (1L, "a"), (1L, "b")) ++ // uniform over 2
      Seq((2L, "a"), (2L, "a"), (2L, "a")) ++            // single type
      Seq((3L, "a"), (3L, "a"), (3L, "a"), (3L, "b"))    // 3:1 skew
    val got = Funnel.typeEntropy(rows.toDF("user_id", "event_type"),
        "user_id", "event_type")
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("n_events"), r.getAs[Double]("entropy"))).toMap
    assert(got(1L) == ((4L, 0.69315))) // r5(ln 2)
    assert(got(2L) == ((3L, 0.0)))
    // H(3/4, 1/4) = ln4 - (3 ln3)/4 = 0.56233514... -> r5 0.56234
    assert(got(3L)._2 == 0.56234)
  }

  test("gappedPairs: subsequence containment, not adjacency") {
    // user 1: A@1, B@3, A@5 — (A,B) via 1<3, (B,A) via 3<5 (gapped over
    // the intervening A), (A,A) via 1<5; (B,B) needs two B's — absent.
    // user 2: a single A — no repeat, contributes nothing.
    val ev = Seq((1L, 1L, "A"), (1L, 3L, "B"), (1L, 5L, "A"), (2L, 1L, "A"))
      .toDF("user_id", "t", "typ")
    val got = Funnel.gappedPairs(ev, "user_id", "t", "typ")
      .as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got == Map(("A", "B") -> 1L, ("B", "A") -> 1L, ("A", "A") -> 1L))
  }
}
