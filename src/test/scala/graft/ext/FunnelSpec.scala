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
}
