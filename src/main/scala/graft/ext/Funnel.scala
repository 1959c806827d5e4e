package graft.ext
import graft.Ckpt.CkptOps

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Time.{tsMicros, tsSeconds}

/** Ordered-step funnel analysis: how many users reach each step of a
  * required event sequence, where step i+1 counts only if it happens at or
  * after the user's step-i completion (earliest-completion semantics, the
  * standard product-analytics funnel).
  *
  * Each step is a filter + equi-join against the previous step's
  * (user, ts) frame + a min aggregation — all shuffled on the user key, no
  * windows over the full event stream and no per-user event collection, so
  * the plan is |steps| hash joins regardless of events-per-user. At 100 TB
  * the step frames shrink monotonically (funnels narrow), which AQE
  * exploits by broadcasting the later, smaller sides.
  */
object Funnel {

  /** Per-step reach counts for `steps` (event-type values, in funnel
    * order): (step, event_type, n_users). A user reaches step i+1 iff they
    * have a qualifying event at ts >= their earliest step-i completion. */
  def funnel(events: DataFrame, userCol: String, tsCol: String,
             typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    // with equal consecutive types, ts >= prev-ts would let ONE event
    // satisfy both steps (it is its own >= match) — reject rather than
    // silently over-count
    require(steps.sliding(2).forall(p => p.length < 2 || p(0) != p(1)),
      "consecutive funnel steps must differ (one event would satisfy both)")
    var reached: DataFrame = null
    val counts = steps.zipWithIndex.map { case (st, i) =>
      val evs = events.where(col(typeCol) === st)
        .select(col(userCol).as("u"), col(tsCol).as("t"))
      // localCheckpoint per step: each step frame is tiny (≤ one row per
      // user) and is consumed TWICE (next step's join + this step's count);
      // without it every union branch re-derives the whole prior join
      // chain — O(steps²) scans of the event table instead of O(steps)
      reached =
        (if (reached == null) evs.groupBy("u").agg(min("t").as("t"))
         else evs.join(reached.select(col("u"), col("t").as("tp")), Seq("u"))
           .where(col("t") >= col("tp"))
           .groupBy("u").agg(min("t").as("t"))).ckpt()
      reached.agg(count(lit(1)).as("n_users"))
        .select(lit(i + 1L).as("step"), lit(st).as("event_type"),
          col("n_users"))
    }
    counts.reduce(_.unionByName(_))
  }

  /** Time-bounded funnel: [[funnel]] with a conversion window — step i+1
    * counts only if it happens at-or-after the previous step's completion
    * AND within `windowSeconds` of the user's STEP-1 completion (the
    * anchor-window definition product analytics uses for "converted
    * within 7 days"). The anchor rides along the per-step (user, t)
    * frames, so the plan stays |steps| user-keyed joins; the window
    * compare is in exact micros ([[sessionizeBatch]]'s precision
    * argument). */
  def funnelWindowed(events: DataFrame, userCol: String, tsCol: String,
                     typeCol: String, steps: Seq[String],
                     windowSeconds: Long): DataFrame = {
    require(steps.nonEmpty, "funnelWindowed needs at least one step")
    require(windowSeconds > 0, s"windowSeconds must be > 0: $windowSeconds")
    require(steps.sliding(2).forall(p => p.length < 2 || p(0) != p(1)),
      "consecutive funnel steps must differ (one event would satisfy both)")
    val winMicros = windowSeconds * 1000000L
    var reached: DataFrame = null
    val counts = steps.zipWithIndex.map { case (st, i) =>
      val evs = events.where(col(typeCol) === st)
        .select(col(userCol).as("u"), col(tsCol).as("t"))
      reached =
        (if (reached == null)
           evs.groupBy("u").agg(min("t").as("t"))
             .withColumn("t0u", tsMicros(col("t")))
         else evs.join(reached.select(col("u"), col("t").as("tp"),
             col("t0u")), Seq("u"))
           .where(col("t") >= col("tp") &&
             tsMicros(col("t")) - col("t0u") <= winMicros)
           .groupBy("u").agg(min("t").as("t"), min("t0u").as("t0u"))
        ).ckpt()
      reached.agg(count(lit(1)).as("n_users"))
        .select(lit(i + 1L).as("step"), lit(st).as("event_type"),
          col("n_users"))
    }
    counts.reduce(_.unionByName(_))
  }

  /** Sessionization via Spark's NATIVE `session_window` (the built-in
    * gap-merging window, usable in batch and streaming): one groupBy, no
    * lag/running-sum window pair — Catalyst plans a single aggregation
    * whose grouping key merges overlapping [ts, ts+gap) intervals per
    * user. Boundary semantics differ from [[sessionizeBatch]] by design:
    * `session_window` starts a NEW session when the gap is >= the
    * duration (strict interval overlap merges), while the lag formulation
    * merges on equality — the oracle replays the native rule. Session end
    * is last-event + gap (the native definition), not last-event.
    *
    * Scale: one shuffle on the user key and the merge runs inside the
    * aggregation operator — strictly less work than the two-window
    * lag+sum rewrite; this is the form to prefer wherever the
    * end-exclusive boundary semantics fit. */
  def sessionizeNative(events: DataFrame, userCol: String, tsCol: String,
                       gapMinutes: Int): DataFrame =
    events
      .groupBy(col(userCol),
        session_window(col(tsCol), s"$gapMinutes minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select(col(userCol),
        date_format(col("session_window.start"), "yyyy-MM-dd HH:mm:ss")
          .as("session_start"),
        date_format(col("session_window.end"), "yyyy-MM-dd HH:mm:ss")
          .as("session_end"),
        col("n_events"))

  /** Batch gap-sessionization — the offline twin of
    * [[Streaming.sessionSummaries]]: events more than `gapMinutes` apart
    * start a new session; one summary row per (user, session) with start,
    * end, duration and event count. Session boundaries come from one lag +
    * running-sum window over the user partition (state = one previous
    * timestamp, exactly the streaming version's state), then a (user,
    * session_seq) aggregation. Two shuffles total — the window's user
    * partition and the summary aggregation; nothing collects events per
    * user into memory, so a 10^6-event user costs the same per row as
    * anyone else. Timestamps leave as formatted strings (oracle-parity
    * contract, Reg.scala). */
  def sessionizeBatch(events: DataFrame, userCol: String, tsCol: String,
                      tiebreak: Seq[String], gapMinutes: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(userCol)
      .orderBy(col(tsCol) +: tiebreak.map(col): _*)
    // gap compare in MICROS, not floor-seconds: a cast-to-long truncates
    // each endpoint, so a true gap of 1800.05 s could read as exactly 1800
    // and silently merge two sessions the exact-precision oracle (and the
    // streaming twin, which compares micros) would split
    val gapMicros = gapMinutes * 60L * 1000000L
    events
      .withColumn("__new",
        when(lag(col(tsCol), 1).over(w).isNull ||
          tsMicros(col(tsCol)) - tsMicros(lag(col(tsCol), 1).over(w))
            > gapMicros, 1L).otherwise(0L))
      .withColumn("session_seq", sum(col("__new")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(userCol), col("session_seq"))
      .agg(
        date_format(min(col(tsCol)), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        date_format(max(col(tsCol)), "yyyy-MM-dd HH:mm:ss").as("session_end"),
        (tsSeconds(max(col(tsCol))) - tsSeconds(min(col(tsCol))))
          .as("duration_sec"),
        count(lit(1)).as("n_events"))
  }

  /** First-order Markov transition matrix over the event-type sequence:
    * (from_type, to_type, n, p) where n counts consecutive pairs within a
    * user's (ts, tiebreak)-ordered stream and p = n / Σ n over the from
    * state — the behavioral-feature / next-event-model primitive (and, on
    * a token stream, exactly a bigram LM's conditional table).
    *
    * Plan: ONE lead window over the user partition produces the pairs,
    * then a (from, to) count; the per-from denominator is re-aggregated
    * from the counts (state-pair cardinality, tiny) and joined back —
    * broadcast at any scale, so the event table is scanned once and
    * shuffled once. p is deterministic cross-engine: both factors are
    * exact BIGINTs and the single division + FLOOR-rounding
    * ([[Timeseries.r5]]) is the same three IEEE ops everywhere. */
  def transitions(events: DataFrame, userCol: String, tsCol: String,
                  tiebreak: Seq[String], typeCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(userCol)
      .orderBy(col(tsCol) +: tiebreak.map(col): _*)
    val counts = events
      .select(col(typeCol).as("from_type"),
        lead(col(typeCol), 1).over(w).as("to_type"))
      .where(col("to_type").isNotNull)
      .groupBy("from_type", "to_type")
      .agg(count(lit(1)).as("n"))
    val totals = counts.groupBy("from_type")
      .agg(sum(col("n")).as("__tot"))
    counts.join(broadcast(totals), Seq("from_type"))
      .select(col("from_type"), col("to_type"), col("n"),
        Timeseries.r5(col("n").cast("double") / col("__tot").cast("double"))
          .as("p"))
  }

  /** Gapped order-2 sequential patterns (the support counts of GSP /
    * PrefixSpan at length 2 — Srikant & Agrawal, "Mining sequential
    * patterns: generalizations and performance improvements", EDBT'96):
    * for every ordered type pair (x, y), how many users have SOME x event
    * strictly before SOME y event — subsequence containment with
    * arbitrary gaps, where [[transitions]] counts only CONSECUTIVE steps.
    * (x, x) counts users with ≥ 2 x-occurrences at distinct times.
    *
    * Containment collapses to a two-scalar test — first(x) < last(y) —
    * so the engine never materializes event pairs: ONE partial-aggregable
    * (user, type) min/max aggregation, then a self-equi-join on the user
    * whose fan-out is bounded by (distinct types per user)², independent
    * of the user's event count. At 100 TB with an unbounded type
    * vocabulary, cap types per user first (the same armor as
    * [[Recommend.itemCooccur]]'s maxBasket). */
  def gappedPairs(events: DataFrame, userCol: String, tsCol: String,
                  typeCol: String): DataFrame = {
    val ut = events.groupBy(col(userCol).as("u"), col(typeCol).as("t"))
      .agg(min(col(tsCol)).as("f"), max(col(tsCol)).as("l"))
      .ckpt() // self-joined: derive the (user, type) frame once
    ut.select(col("u"), col("t").as("x"), col("f"))
      .join(ut.select(col("u"), col("t").as("y"), col("l")), Seq("u"))
      .where(col("f") < col("l"))
      .groupBy("x", "y").agg(count(lit(1)).as("n_users"))
  }

  /** Top-k 3-step paths across all users: the most common
    * (type → type → type) sequences within user streams — the "top user
    * journeys" product-analytics view and the order-3 extension of
    * [[transitions]]. One window (two leads share it), one count, and a
    * fully-tiebroken top-k (count desc, then the path lexicographically)
    * so the boundary is deterministic on every engine. The TopK sort
    * runs on the |types|³-bounded path table, not the events. */
  def pathTrigrams(events: DataFrame, userCol: String, tsCol: String,
                   tiebreak: Seq[String], typeCol: String,
                   k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(userCol)
      .orderBy(col(tsCol) +: tiebreak.map(col): _*)
    events
      .select(col(typeCol).as("t1"),
        lead(col(typeCol), 1).over(w).as("t2"),
        lead(col(typeCol), 2).over(w).as("t3"))
      .where(col("t2").isNotNull && col("t3").isNotNull)
      .groupBy("t1", "t2", "t3")
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("t1"), col("t2"), col("t3"))
      .limit(k)
  }

  /** Shannon entropy (nats) of each user's event-type distribution —
    * behavioral diversity: 0 for a one-trick user, ln(k) for a uniform
    * spread over k types. Factored for exactness as
    * H = ln(n) − (Σ cᵗ·ln cᵗ)/n over the per-type counts cᵗ: the counts
    * are exact integers and the Σ is a LEFT FOLD over the counts in
    * type-sorted order (an `aggregate` HOF, not a float SUM whose
    * accumulation order varies by executor count) — so the pre-rounding
    * double is bit-identical on any engine that folds the same order.
    * Per-user state is one entry per distinct type (bounded by the type
    * vocabulary, not event count); two shuffles, both on the user key. */
  def typeEntropy(events: DataFrame, userCol: String,
                  typeCol: String): DataFrame = {
    val counts = events.groupBy(col(userCol), col(typeCol))
      .agg(count(lit(1)).as("__c"))
    counts.groupBy(col(userCol))
      .agg(sum(col("__c")).as("__n"),
        sort_array(collect_list(struct(col(typeCol).as("__t"),
          col("__c").cast("double").as("__cd")))).as("__l"))
      .select(col(userCol), col("__n").as("n_events"),
        Timeseries.r5(
          log(col("__n").cast("double")) -
            aggregate(
              transform(col("__l"),
                s => s.getField("__cd") * log(s.getField("__cd"))),
              lit(0.0), (acc: Column, x: Column) => acc + x)
              / col("__n").cast("double")).as("entropy"))
  }
}
