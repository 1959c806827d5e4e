package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.io.Tables
import graft.ops.Relational.dsum

class StreamingSpec extends SparkSpec {

  test("mapGroupsWithState sessionization matches the lag-window batch formulation") {
    val dir = "/root/testdata/sf0.001"
    val events = Tables(spark, dir).events
    val stateful = Streaming.sessionSummaries(spark, events, gapMinutes = 30)
      .orderBy("user_id").collect()
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val batch = events
      .withColumn("prev", lag(col("ts"), 1).over(w))
      .withColumn("new_s",
        when(col("prev").isNull ||
          col("ts").cast("long") - col("prev").cast("long") > 30 * 60, 1L)
          .otherwise(0L))
      .groupBy("user_id")
      .agg(sum("new_s").as("n_sessions"), count(lit(1)).as("n_events"))
      .orderBy("user_id").collect()
    assert(stateful.length == batch.length && stateful.length > 0)
    assert(stateful.sameElements(batch))
  }

  test("transformWithState sessionization matches mapGroupsWithState in batch AND as a stream") {
    val dir = "/root/testdata/sf0.001"
    val events = Tables(spark, dir).events
    val v1 = Streaming.sessionSummaries(spark, events, gapMinutes = 30)
      .orderBy("user_id").collect()
    // batch-planned transformWithState (transient per-partition state store)
    val v2 = Streaming.sessionSummariesTws(spark, events, gapMinutes = 30)
      .orderBy("user_id").collect()
    assert(v1.length > 0 && v2.sameElements(v1))
    // true streaming run: update-mode emissions converge to the batch
    // summary — (n_sessions, n_events) are monotone per user, so the last
    // (= max) update per user is the final state
    val ss = Streaming.streamingSession(spark)
    val streamed = Streaming.runToTable(spark,
      Streaming.sessionSummariesTws(ss, Streaming.readEvents(ss, dir), 30),
      "tws_sessions", outputMode = "update")
    val fin = streamed.groupBy("user_id")
      .agg(max("n_sessions").as("n_sessions"), max("n_events").as("n_events"))
      .orderBy("user_id").collect()
    assert(fin.sameElements(v1))
  }

  test("timer-driven transformWithState append sessionization equals the v1 timeout form") {
    val dir = "/root/testdata/sf0.001"
    def run(v2: Boolean): Seq[(Long, Long, Long)] = {
      val ss = Streaming.streamingSession(spark)
      val events = Streaming.readEvents(ss, dir)
      val streamed =
        if (v2) Streaming.sessionRowsAppendTws(ss, events, gapMinutes = 30)
        else Streaming.sessionRowsAppend(ss, events, gapMinutes = 30)
      Streaming.runToTable(spark, streamed, s"appendcmp_${if (v2) "v2" else "v1"}",
          outputMode = "append")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSeq.sorted
    }
    val (v1, v2) = (run(v2 = false), run(v2 = true))
    assert(v1.nonEmpty && v1 == v2)
  }

  test("flatMapGroupsWithState session rows are consistent with the per-user summaries") {
    val dir = "/root/testdata/sf0.001"
    val events = Tables(spark, dir).events
    val rows = Streaming.sessionRows(spark, events, gapMinutes = 30)
    val fromRows = rows.groupBy("user_id")
      .agg(max("session_idx").as("n_sessions"), sum("n_events").as("n_events"))
      .orderBy("user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val summaries = Streaming.sessionSummaries(spark, events, gapMinutes = 30)
      .orderBy("user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(fromRows.length > 0)
    assert(fromRows.toSeq == summaries.toSeq)
    // session indices are 1..n per user with no gaps
    import spark.implicits._
    val gaps = rows.groupBy("user_id")
      .agg(max("session_idx").as("mx"), count(lit(1)).cast("long").as("cnt"))
      .where(col("mx") =!= col("cnt")).count()
    assert(gaps == 0)
  }

  test("sessionRowsAppend emits exactly the watermark-confirmed sessions, each once") {
    val dir = "/root/testdata/sf0.001"
    val got = Streaming.runToTable(spark,
        Streaming.sessionRowsAppend(spark, Streaming.readEvents(spark, dir), 30),
        "sess_append_spec", outputMode = "append")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.length == got.distinct.length, "a session was emitted twice")
    // brute-force reference: batch sessions whose end + gap <= the
    // ms-floored global max event time (= the final watermark)
    val gap = 30L * 60 * 1000000
    val evs = Tables(spark, dir).events
      .select(col("user_id"), unix_micros(col("ts")).as("tsu"), col("event_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val wm = (evs.map(_._2).max / 1000L) * 1000L
    val want = evs.groupBy(_._1).toSeq.flatMap { case (user, rows) =>
      val sorted = rows.sortBy(r => (r._2, r._3))
      val sessions = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)] // (n, end)
      var n = 0L; var last = Long.MinValue
      sorted.foreach { r =>
        if (last != Long.MinValue && r._2 - last > gap) { sessions += ((n, last)); n = 0 }
        n += 1; last = r._2
      }
      sessions += ((n, last))
      sessions.zipWithIndex.collect {
        case ((cnt, end), i) if end + gap <= wm => (user, (i + 1).toLong, cnt)
      }
    }
    assert(got.toSet == want.toSet)
    assert(got.nonEmpty)
  }

  test("stream-stream attribution join equals the batch interval join (sf0.001)") {
    val dir = "/root/testdata/sf0.001"
    val streamed = Streaming.runToTable(spark,
      Streaming.attributionJoin(Streaming.readEvents(spark, dir), 60),
      "attr_test", outputMode = "append")
      .orderBy("click_id", "purchase_id").collect()
    val e = Tables(spark, dir).events
    val c = e.where(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"), col("ts").as("cts"))
    val p = e.where(col("event_type") === "purchase")
      .select(col("user_id").as("pu"), col("event_id").as("purchase_id"),
        col("ts").as("pts"))
    val batch = c.join(p, col("user_id") === col("pu") &&
        col("pts") >= col("cts") && col("pts") <= col("cts") + expr("INTERVAL 60 MINUTES"))
      .select(col("click_id"), col("purchase_id"), col("user_id"),
        (unix_micros(col("pts")) - unix_micros(col("cts"))).as("lag_us"))
      .orderBy("click_id", "purchase_id").collect()
    assert(streamed.length == batch.length && streamed.length > 0)
    assert(streamed.sameElements(batch))
  }

  test("runToTable drops its memory-sink view: catalog table count is stable across runs") {
    val dir = "/root/testdata/sf0.001"
    def run(n: String) = Streaming.runToTable(spark,
      Streaming.windowedAgg(Streaming.readEvents(spark, dir)), n)
    val r1 = run("stream_hygiene_1")
    val before = spark.catalog.listTables().count()
    val r2 = run("stream_hygiene_2")
    assert(spark.catalog.listTables().count() == before)
    // and the snapshot stays readable after its view is gone
    assert(r1.count() == r2.count() && r1.count() > 0)
  }

  test("staged-dir lifecycle: a stream planned before a source regeneration still reads its stage; a new read sees the new data") {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    import org.apache.spark.sql.functions.timestamp_micros
    import spark.implicits._
    val dir = Files.createTempDirectory("stream_regen")
    def writeEvents(n: Int): Unit = {
      // write through Spark, then move the single part file to the bare
      // events.parquet FILE layout readEvents stages from
      val tmp = dir.resolve("w")
      (0 until n).map(i => (i.toLong, 1704067200000000L + i * 1000000L,
          i.toLong % 7, "click", 1.0, "{}"))
        .toDF("event_id", "us", "user_id", "event_type", "value", "props")
        .select(col("event_id"), timestamp_micros(col("us")).as("ts"),
          col("user_id"), col("event_type"), col("value"), col("props"))
        .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = Files.list(tmp).filter(_.toString.endsWith(".parquet"))
        .findFirst().get()
      Files.move(part, dir.resolve("events.parquet"),
        StandardCopyOption.REPLACE_EXISTING)
    }
    writeEvents(10)
    val streamV1 = Streaming.windowedAgg(Streaming.readEvents(spark, dir.toString))
    writeEvents(25) // regeneration: same path, new content/mtime
    val streamV2 = Streaming.windowedAgg(Streaming.readEvents(spark, dir.toString))
    // the V1 plan still runs against its retired-but-kept stage
    val n1 = Streaming.runToTable(spark, streamV1, "regen_v1")
      .agg(sum("n_events")).collect().head.getLong(0)
    val n2 = Streaming.runToTable(spark, streamV2, "regen_v2")
      .agg(sum("n_events")).collect().head.getLong(0)
    assert(n1 == 10, s"pre-regeneration stream read $n1 events, want 10")
    assert(n2 == 25, s"post-regeneration stream read $n2 events, want 25")
  }

  test("retiredKeep bounds staged-dir growth across many regenerations; every new read sees its own data") {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    import org.apache.spark.sql.functions.timestamp_micros
    import spark.implicits._
    val dir = Files.createTempDirectory("stream_regen_many")
    def writeEvents(n: Int): Unit = {
      val tmp = dir.resolve("w")
      (0 until n).map(i => (i.toLong, 1704067200000000L + i * 1000000L,
          i.toLong % 7, "click", 1.0, "{}"))
        .toDF("event_id", "us", "user_id", "event_type", "value", "props")
        .select(col("event_id"), timestamp_micros(col("us")).as("ts"),
          col("user_id"), col("event_type"), col("value"), col("props"))
        .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = Files.list(tmp).filter(_.toString.endsWith(".parquet"))
        .findFirst().get()
      Files.move(part, dir.resolve("events.parquet"),
        StandardCopyOption.REPLACE_EXISTING)
    }
    val tmpRoot = Paths.get(System.getProperty("java.io.tmpdir"))
    def stageCount(): Long =
      Files.list(tmpRoot).filter(_.getFileName.toString
        .startsWith("graft_stream_events")).count()
    val before = stageCount()
    // 7 regenerations > retiredKeep (4): the oldest retired stages must be
    // DELETED (bounded growth), while each fresh read sees its own data
    (1 to 7).foreach { k =>
      writeEvents(10 + k)
      val n = Streaming.runToTable(spark,
          Streaming.windowedAgg(Streaming.readEvents(spark, dir.toString)),
          s"regen_many_$k")
        .agg(sum("n_events")).collect().head.getLong(0)
      assert(n == 10 + k, s"regeneration $k read $n events, want ${10 + k}")
    }
    val grown = stageCount() - before
    // 7 stages were created for this path; kept = 1 active + <= 4 retired
    assert(grown <= 5, s"staged dirs grew by $grown (> active + retiredKeep)")
  }

  test("sessionize_append result is independent of the streaming shuffle-partition count") {
    val dir = "/root/testdata/sf0.001"
    def run(partitions: Int) = {
      val ss = Streaming.streamingSession(spark, partitions)
      Streaming.runToTable(spark,
          Streaming.sessionRowsAppend(ss, Streaming.readEvents(ss, dir), 30),
          s"sess_parts_$partitions", outputMode = "append")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    }
    val p3 = run(3)
    val p13 = run(13)
    assert(p3.nonEmpty)
    assert(p3 == p13,
      s"session set differs across partition counts: ${(p3 diff p13).take(3)} / ${(p13 diff p3).take(3)}")
  }

  test("bootstrapped handover equals full-range sessionization at any boundary and partition count") {
    val dir = "/root/testdata/sf0.001"
    val events = Tables(spark, dir).events
    val full = Streaming.sessionSummaries(spark, events, gapMinutes = 30)
      .orderBy("user_id").collect()
    import graft.functions.Time.tsMicros
    // three handover boundaries: early (most events stream), midpoint, and
    // late (most users never appear in the stream — covered purely by the
    // seeded batch state), plus a non-default partition count
    val Array(lo, hi) = events
      .agg(min(tsMicros(col("ts"))), max(tsMicros(col("ts"))))
      .head().toSeq.map(_.asInstanceOf[Long]).toArray
    for ((frac, parts) <- Seq((0.25, 8), (0.5, 5), (0.9, 13))) {
      val b = lo + ((hi - lo) * frac).toLong
      val ss = Streaming.streamingSession(spark, parts)
      val history = events.where(tsMicros(col("ts")) < b)
      val stream = Streaming.readEvents(ss, dir)
        .where(tsMicros(col("ts")) >= b)
      val streamed = Streaming.runToTable(spark,
        Streaming.sessionSummariesTwsBootstrapped(ss, stream, history, 30),
        s"tws_boot_${(frac * 100).toInt}_$parts", outputMode = "update")
      val fin = streamed.groupBy("user_id")
        .agg(max("n_sessions").as("n_sessions"), max("n_events").as("n_events"))
        .unionByName(Streaming.sessionStateBatch(history, 30)
          .select(col("user_id"), col("n_sessions"), col("n_events")))
        .groupBy("user_id")
        .agg(max("n_sessions").as("n_sessions"), max("n_events").as("n_events"))
        .orderBy("user_id").collect()
      assert(fin.sameElements(full),
        s"handover at frac=$frac parts=$parts diverges from full-range")
    }
  }

  test("checkpoint recovery: stop mid-corpus, restart from the SAME checkpoint, final sessions identical to the unbroken run (exactly once)") {
    // The production property none of the start-to-finish streaming tests
    // pin: a query killed mid-corpus and restarted from its checkpoint must
    // reload RocksDB state (open-session counters, the pending ListState,
    // event-time timers, the watermark) and end byte-identical to a run
    // that never stopped — with no session row emitted twice (the parquet
    // sink's commit log + transformWithState state reload together give
    // exactly-once across the restart).
    import spark.implicits._
    import org.apache.spark.sql.streaming.Trigger
    val base = java.nio.file.Files.createTempDirectory("graft_recovery").toString
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00").getTime
    def ev(user: Long, minute: Long, id: Long) =
      (user, new java.sql.Timestamp(t0 + minute * 60000L), id)
    // user 1's second session STRADDLES the stop boundary (events at
    // minutes 90 and 95, gap 5 < 30): run 2 can only count it as one
    // 2-event session by reloading run 1's open-session state
    val all = Seq(
      ev(1L, 0, 1), ev(1L, 10, 2), ev(1L, 20, 3),   // u1 s1: 3 events
      ev(1L, 90, 4), ev(1L, 95, 5),                 // u1 s2: straddles
      ev(1L, 200, 6),                               // u1 s3: open at end
      ev(2L, 0, 7), ev(2L, 40, 8),                  // u2 s1, s2 (gap 40)
      ev(2L, 100, 9), ev(2L, 105, 10),              // u2 s3
      ev(3L, 150, 11), ev(3L, 160, 12))             // u3 s1 (h2 only)
    val half1 = all.filter(_._2.getTime <= t0 + 92 * 60000L)
    val half2 = all.filterNot(_._2.getTime <= t0 + 92 * 60000L)
    assert(half1.nonEmpty && half2.nonEmpty)

    def writeEvents(rows: Seq[(Long, java.sql.Timestamp, Long)], dir: String): Unit =
      rows.toDF("user_id", "ts", "event_id")
        .coalesce(1).write.mode("append").parquet(dir)
    val schema = Seq.empty[(Long, java.sql.Timestamp, Long)]
      .toDF("user_id", "ts", "event_id").schema

    def runOnce(srcDir: String, outDir: String, ckptDir: String): Unit = {
      // fresh session per (re)start — a real restart is a new driver
      val ss = Streaming.streamingSession(spark)
      val events = ss.readStream.schema(schema).parquet(srcDir)
      val q = Streaming.sessionRowsAppendTws(ss, events, gapMinutes = 30)
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckptDir)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }

    // broken run: half 1, stop, add half 2, restart from the same checkpoint
    writeEvents(half1, s"$base/src")
    runOnce(s"$base/src", s"$base/out", s"$base/ckpt")
    val afterRun1 = spark.read.parquet(s"$base/out")
      .as[(Long, Long, Long)].collect().toSeq
    writeEvents(half2, s"$base/src")
    runOnce(s"$base/src", s"$base/out", s"$base/ckpt")

    // unbroken run: everything in one go, fresh checkpoint
    writeEvents(all, s"$base/src2")
    runOnce(s"$base/src2", s"$base/out2", s"$base/ckpt2")

    val broken = spark.read.parquet(s"$base/out")
      .as[(Long, Long, Long)].collect().toSeq.sorted
    val unbroken = spark.read.parquet(s"$base/out2")
      .as[(Long, Long, Long)].collect().toSeq.sorted
    assert(broken.nonEmpty && broken == unbroken,
      s"recovered run diverged:\nbroken=$broken\nunbroken=$unbroken")
    // exactly-once: nothing run 1 emitted appears twice after the restart
    assert(broken.distinct == broken, s"duplicate emission: $broken")
    assert(afterRun1.toSet.subsetOf(broken.toSet),
      s"restart lost run-1 output: run1=$afterRun1 final=$broken")
    // the straddling session was stitched across the restart: one 2-event
    // session for user 1 spanning minutes 90-95, not two 1-event fragments
    assert(broken.contains((1L, 2L, 2L)),
      s"boundary session not recovered from state: $broken")
  }

  test("checkpoint recovery: windowed aggregation restarts with its state, a window straddling the stop emits once with full counts") {
    // Same recovery property as the sessionization case but for the
    // WINDOWED-AGGREGATION state path (StateStoreSave/Restore, a different
    // state codepath than transformWithState): a day window whose events
    // straddle the stop must emit exactly once with counts from BOTH runs.
    import spark.implicits._
    import org.apache.spark.sql.streaming.Trigger
    val base = java.nio.file.Files.createTempDirectory("graft_recovery_agg").toString
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val all = Seq(
      (ts("2026-02-01 01:00:00"), "a", 1.50),
      (ts("2026-02-01 05:00:00"), "b", 2.25),
      (ts("2026-02-02 03:00:00"), "a", 3.00),   // day-2 half 1
      (ts("2026-02-02 20:00:00"), "a", 4.50),   // day-2 half 2 — same window
      (ts("2026-02-02 21:00:00"), "b", 1.00),
      (ts("2026-02-03 10:00:00"), "a", 2.00),   // day 3: watermark never
      (ts("2026-02-03 23:00:00"), "b", 0.50),   //  confirms it — held back
      (ts("2026-02-04 12:00:00"), "c", 0.25))   // sentinel: advances the 1-day
                                                //  watermark past day-2's end
    val cut = ts("2026-02-02 12:00:00")
    val half1 = all.filter(!_._1.after(cut))
    val half2 = all.filter(_._1.after(cut))
    def write(rows: Seq[(java.sql.Timestamp, String, Double)], dir: String): Unit =
      rows.toDF("ts", "event_type", "value")
        .coalesce(1).write.mode("append").parquet(dir)
    val schema = Seq.empty[(java.sql.Timestamp, String, Double)]
      .toDF("ts", "event_type", "value").schema
    def run(srcDir: String, outDir: String, ckptDir: String): Unit = {
      val ss = Streaming.streamingSession(spark)
      val q = Streaming.windowedAgg(ss.readStream.schema(schema).parquet(srcDir))
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckptDir)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    write(half1, s"$base/src"); run(s"$base/src", s"$base/out", s"$base/ckpt")
    write(half2, s"$base/src"); run(s"$base/src", s"$base/out", s"$base/ckpt")
    write(all, s"$base/src2"); run(s"$base/src2", s"$base/out2", s"$base/ckpt2")
    def readOut(p: String) = spark.read.parquet(p)
      .as[(String, String, Long, Double)].collect().toSeq.sorted
    val broken = readOut(s"$base/out")
    val unbroken = readOut(s"$base/out2")
    assert(broken.nonEmpty && broken == unbroken,
      s"recovered agg diverged:\nbroken=$broken\nunbroken=$unbroken")
    assert(broken.distinct == broken, s"window emitted twice: $broken")
    // the straddling day-2 'a' window carries BOTH halves' events
    assert(broken.contains(("2026-02-02", "a", 2L, 7.5)), broken.toString)
  }

  test("checkpoint recovery: stream-stream join buffers an unmatched click across restart and emits the pair when its purchase arrives") {
    // Third stateful codepath: SYMMETRIC-HASH-JOIN state. A click with no
    // purchase yet is buffered in the join state store; the query stops;
    // the restart (same checkpoint) receives the matching purchase — the
    // pair can only emit if the buffered click was reloaded from state.
    import spark.implicits._
    import org.apache.spark.sql.streaming.Trigger
    val base = java.nio.file.Files.createTempDirectory("graft_recovery_join").toString
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // (ts, user_id, event_id, event_type); 60-min attribution window
    val half1 = Seq(
      (ts("2026-03-01 01:00:00"), 1L, 101L, "click"),    // matched ACROSS restart
      (ts("2026-03-01 02:00:00"), 2L, 102L, "click"),
      (ts("2026-03-01 02:10:00"), 2L, 202L, "purchase"), // same-run match
      (ts("2026-03-01 04:00:00"), 3L, 103L, "click"))    // never matched
    val half2 = Seq(
      (ts("2026-03-01 01:30:00"), 1L, 201L, "purchase"), // matches buffered 101
      (ts("2026-03-01 05:00:00"), 1L, 104L, "click"),
      (ts("2026-03-01 05:20:00"), 1L, 203L, "purchase"), // run-2 match
      (ts("2026-03-01 06:00:00"), 4L, 204L, "purchase")) // purchase, no click
    def write(rows: Seq[(java.sql.Timestamp, Long, Long, String)], dir: String): Unit =
      rows.toDF("ts", "user_id", "event_id", "event_type")
        .coalesce(1).write.mode("append").parquet(dir)
    val schema = Seq.empty[(java.sql.Timestamp, Long, Long, String)]
      .toDF("ts", "user_id", "event_id", "event_type").schema
    def run(srcDir: String, outDir: String, ckptDir: String): Unit = {
      val ss = Streaming.streamingSession(spark)
      val q = Streaming.attributionJoin(ss.readStream.schema(schema).parquet(srcDir), 60)
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckptDir)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    write(half1, s"$base/src"); run(s"$base/src", s"$base/out", s"$base/ckpt")
    write(half2, s"$base/src"); run(s"$base/src", s"$base/out", s"$base/ckpt")
    write(half1 ++ half2, s"$base/src2"); run(s"$base/src2", s"$base/out2", s"$base/ckpt2")
    def readOut(p: String) = spark.read.parquet(p)
      .as[(Long, Long, Long, Long)].collect().toSeq.sorted
    val broken = readOut(s"$base/out")
    val unbroken = readOut(s"$base/out2")
    assert(broken == unbroken && broken.distinct == broken,
      s"recovered join diverged:\nbroken=$broken\nunbroken=$unbroken")
    // the cross-restart pair: click 101 (run 1) × purchase 201 (run 2)
    assert(broken.contains((101L, 201L, 1L, 1800000000L)), broken.toString)
    assert(broken.map(_._1).toSet == Set(101L, 102L, 104L)) // 103 unmatched; inner join
  }

  test("checkpoint recovery: dedup state survives restart — a run-2 duplicate of a run-1 key is suppressed") {
    // Fourth stateful codepath: DEDUP state (dropDuplicatesWithinWatermark
    // key store). A (user, event_type) first seen in run 1 must still
    // suppress a duplicate arriving in run 2 from the same checkpoint —
    // only possible if the key state was reloaded.
    import spark.implicits._
    import org.apache.spark.sql.streaming.Trigger
    val base = java.nio.file.Files.createTempDirectory("graft_recovery_dedup").toString
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // (ts, user_id, event_id, event_type); 1-day dedup watermark
    val half1 = Seq(
      (ts("2026-04-01 01:00:00"), 1L, 1L, "click"),
      (ts("2026-04-01 02:00:00"), 2L, 2L, "view"))
    val half2 = Seq(
      (ts("2026-04-01 03:00:00"), 1L, 3L, "click"), // dup of run-1 key — must drop
      (ts("2026-04-01 04:00:00"), 1L, 4L, "view"),  // new key
      (ts("2026-04-01 05:00:00"), 2L, 5L, "view"))  // dup of run-1 key — must drop
    def write(rows: Seq[(java.sql.Timestamp, Long, Long, String)], dir: String): Unit =
      rows.toDF("ts", "user_id", "event_id", "event_type")
        .coalesce(1).write.mode("append").parquet(dir)
    val schema = Seq.empty[(java.sql.Timestamp, Long, Long, String)]
      .toDF("ts", "user_id", "event_id", "event_type").schema
    def run(srcDir: String, outDir: String, ckptDir: String): Unit = {
      val ss = Streaming.streamingSession(spark)
      val q = Streaming.dedupedPairsWithinWatermark(
          ss.readStream.schema(schema).parquet(srcDir))
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckptDir)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    write(half1, s"$base/src"); run(s"$base/src", s"$base/out", s"$base/ckpt")
    write(half2, s"$base/src"); run(s"$base/src", s"$base/out", s"$base/ckpt")
    write(half1 ++ half2, s"$base/src2"); run(s"$base/src2", s"$base/out2", s"$base/ckpt2")
    def readOut(p: String) = spark.read.parquet(p)
      .select("event_id", "user_id", "event_type")
      .as[(Long, Long, String)].collect().toSeq.sorted
    val broken = readOut(s"$base/out")
    val unbroken = readOut(s"$base/out2")
    assert(broken == unbroken, s"recovered dedup diverged:\nbroken=$broken\nunbroken=$unbroken")
    // exactly the three first-seen keys; events 3 and 5 suppressed by
    // state reloaded across the restart
    assert(broken.map(_._1) == Seq(1L, 2L, 4L), broken.toString)
  }

  test("checkpoint recovery: streaming near-dedup's durable index survives restart — run-2 copies of run-1 docs are suppressed") {
    // Fifth stateful codepath: the near-dedup BAND/SHINGLE INDEX — durable
    // batchId-keyed contributions on disk, not a Spark state store. A
    // run-2 near-copy of a run-1 doc must drop (index reloaded from the
    // bid<current partitions), INCLUDING a copy of a run-1 doc that was
    // itself DROPPED (all seen docs enter the index — the oracle's
    // any-earlier-doc rule), and the restarted run must equal the
    // unbroken run.
    import spark.implicits._
    val base = java.nio.file.Files
      .createTempDirectory("graft_recovery_neardup").toString
    val corpus = Seq(
      (0L, "the standing corpus document about federated scan sources"))
      .toDF("doc_id", "text")
    val (cb, cs) = Dedup.corpusNearDupIndex(corpus, "doc_id", "text")
    val half1 = Seq(
      (1L, "the standing corpus document about federated scan sources"), // corpus dup — drop
      (3L, "a genuinely novel first document with its own words"))       // keep
    val half2 = Seq(
      (5L, "a genuinely novel first document with its own words"),       // dup of kept 3 — drop
      (7L, "the standing corpus document about federated scan sources"), // dup of DROPPED 1 — drop
      (9L, "another fresh second document no earlier text resembles"))   // keep
    def write(rows: Seq[(Long, String)], dir: String): Unit =
      rows.toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(dir)
    val schema = Seq.empty[(Long, String)].toDF("doc_id", "text").schema
    def run(srcDir: String, stateDir: String, outDir: String,
            ckptDir: String): Seq[Long] =
      Streaming.nearDedupStream(
          spark.readStream.schema(schema).parquet(srcDir), cb, cs,
          stateDir, outDir, ckptDir, "doc_id", "text", threshold = 0.7)
        .select("doc_id").as[Long].collect().toSeq.sorted
    write(half1, s"$base/src")
    run(s"$base/src", s"$base/state", s"$base/out", s"$base/ckpt")
    write(half2, s"$base/src")
    val broken = run(s"$base/src", s"$base/state", s"$base/out", s"$base/ckpt")
    write(half1 ++ half2, s"$base/src2")
    val unbroken =
      run(s"$base/src2", s"$base/state2", s"$base/out2", s"$base/ckpt2")
    assert(broken == unbroken,
      s"recovered near-dedup diverged:\nbroken=$broken\nunbroken=$unbroken")
    assert(broken == Seq(3L, 9L), broken.toString)
  }

  test("near-dedup stream state stays BOUNDED across compactions; recovery crosses a compaction boundary") {
    // Round-13 demand: nearDedupStream previously accreted one
    // bid=<batchId> partition per microbatch forever and unioned ALL
    // priors per batch. With compactEvery=4 over 12 single-doc
    // microbatches (maxFilesPerTrigger=1), settled partitions fold into
    // a base at batches 4, 8 — suppression must still work against
    // FOLDED contributions (a copy of a doc now living in the base
    // drops), the on-disk state must stay bounded (≤ compactEvery bid
    // partitions + exactly one base), and a restart whose first batch
    // triggers a compaction must equal the unbroken run.
    import spark.implicits._
    val base = java.nio.file.Files
      .createTempDirectory("graft_neardup_compact").toString
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$base/src"))
    val corpus = Seq((0L, "the standing corpus document about federated " +
      "scan sources")).toDF("doc_id", "text")
    val (cb, cs) = Dedup.corpusNearDupIndex(corpus, "doc_id", "text")
    val A = "alpha wolves howl across the frozen northern tundra at dusk"
    val B = "database engines shuffle partitioned rows between executor nodes"
    val C = "gardeners plant heirloom tomato seedlings after the last frost"
    val D = "violin sections tune carefully before the evening symphony opens"
    val E = "submarines navigate ocean trenches using long range sonar pings"
    val F = "bakers fold laminated butter dough for tomorrow's croissant batch"
    val G = "astronomers catalog distant quasars from the mountain observatory"
    val schema = Seq.empty[(Long, String)].toDF("doc_id", "text").schema
    def writeOne(n: Int, id: Long, text: String, srcDir: String): Unit = {
      val tmp = s"$base/tmp"
      Seq((id, text)).toDF("doc_id", "text").coalesce(1)
        .write.mode("overwrite").parquet(tmp)
      val pf = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.move(pf.toPath,
        java.nio.file.Paths.get(f"$srcDir/b$n%02d.parquet"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    // 12 microbatches; dups placed to probe pre-fold, post-fold, and
    // double-fold suppression (compactions fire at batchId 4 and 8)
    val docs: Seq[(Long, String)] = Seq(
      1L -> A, 2L -> B, 3L -> A /*drop: recent*/, 4L -> C,
      5L -> B /*drop: folded at 4*/, 6L -> D, 7L -> C /*drop: folded*/,
      8L -> D /*drop: recent*/, 9L -> E, 10L -> E /*drop: recent*/,
      11L -> F, 12L -> A /*drop: double-folded*/)
    def run(srcDir: String, stateDir: String, outDir: String,
            ckptDir: String): Seq[Long] =
      Streaming.nearDedupStream(
          spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
            .parquet(srcDir), cb, cs,
          stateDir, outDir, ckptDir, "doc_id", "text", threshold = 0.7,
          compactEvery = 4)
        .select("doc_id").as[Long].collect().toSeq.sorted
    docs.zipWithIndex.foreach { case ((id, t), n) =>
      writeOne(n, id, t, s"$base/src") }
    val kept1 = run(s"$base/src", s"$base/state", s"$base/out", s"$base/ckpt")
    assert(kept1 == Seq(1L, 2L, 4L, 6L, 9L, 11L), kept1.toString)
    // state boundedness after 12 batches: one base (upto=8), bid
    // partitions only at 8..11 — the pre-fold listings are GONE
    def bids(kind: String, sd: String): Seq[Long] =
      new java.io.File(s"$sd/$kind").listFiles().toSeq
        .map(_.getName).filter(_.startsWith("bid="))
        .map(_.stripPrefix("bid=").toLong).sorted
    def bases(kind: String, sd: String): Seq[Long] =
      new java.io.File(s"$sd/${kind}_base").listFiles().toSeq
        .map(_.getName).filter(_.startsWith("upto="))
        .map(_.stripPrefix("upto=").toLong).sorted
    for (k <- Seq("bands", "sets")) {
      assert(bases(k, s"$base/state") == Seq(8L),
        s"$k base dirs: ${bases(k, s"$base/state")}")
      assert(bids(k, s"$base/state") == Seq(8L, 9L, 10L, 11L),
        s"$k bid dirs: ${bids(k, s"$base/state")}")
    }
    // restart: the resumed run's FIRST batch (batchId 12) triggers a
    // compaction folding bids 8..11; doc 13 (copy of F, just folded)
    // must drop, doc 14 (novel) must survive
    writeOne(12, 13L, F, s"$base/src")
    writeOne(13, 14L, G, s"$base/src")
    val kept2 = run(s"$base/src", s"$base/state", s"$base/out", s"$base/ckpt")
    assert(kept2 == Seq(1L, 2L, 4L, 6L, 9L, 11L, 14L), kept2.toString)
    // unbroken replay over the same 14 files equals the restarted run
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(s"$base/src2"))
    (docs ++ Seq(13L -> F, 14L -> G)).zipWithIndex.foreach {
      case ((id, t), n) => writeOne(n, id, t, s"$base/src2") }
    val unbroken =
      run(s"$base/src2", s"$base/state2", s"$base/out2", s"$base/ckpt2")
    assert(unbroken == kept2,
      s"compaction-crossing recovery diverged: $kept2 vs $unbroken")
  }

  test("a CRASHED compaction base write is never trusted as the watermark") {
    // Crash model: the JVM dies mid merged.write during a compaction —
    // the new upto=N dir exists but holds only _temporary, no _SUCCESS.
    // If baseUpto() took that dir as the watermark, the bid-range filter
    // would exclude every settled partition below N (duplicates pass
    // through) and the deferred cleanup would DELETE the previous good
    // base — silent total state loss. The fix: only _SUCCESS-committed
    // bases count; the partial dir is invisible and the next compaction's
    // overwrite-mode write replaces it.
    import spark.implicits._
    val base = java.nio.file.Files
      .createTempDirectory("graft_neardup_crash").toString
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$base/src"))
    val corpus = Seq((0L, "the standing corpus document about federated " +
      "scan sources")).toDF("doc_id", "text")
    val (cb, cs) = Dedup.corpusNearDupIndex(corpus, "doc_id", "text")
    val A = "alpha wolves howl across the frozen northern tundra at dusk"
    val B = "database engines shuffle partitioned rows between executor nodes"
    val G = "astronomers catalog distant quasars from the mountain observatory"
    val schema = Seq.empty[(Long, String)].toDF("doc_id", "text").schema
    def writeOne(n: Int, id: Long, text: String): Unit = {
      val tmp = s"$base/tmp"
      Seq((id, text)).toDF("doc_id", "text").coalesce(1)
        .write.mode("overwrite").parquet(tmp)
      val pf = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.move(pf.toPath,
        java.nio.file.Paths.get(f"$base/src/b$n%02d.parquet"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    def run(): Seq[Long] =
      Streaming.nearDedupStream(
          spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
            .parquet(s"$base/src"), cb, cs,
          s"$base/state", s"$base/out", s"$base/ckpt", "doc_id", "text",
          threshold = 0.7, compactEvery = 4)
        .select("doc_id").as[Long].collect().toSeq.sorted
    writeOne(0, 1L, A); writeOne(1, 2L, B)
    assert(run() == Seq(1L, 2L))
    // fabricate the crash artifact: a partial upto=99 dir, no _SUCCESS
    for (k <- Seq("bands", "sets")) {
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(
        s"$base/state/${k}_base/upto=99/_temporary"))
    }
    // resume: a copy of A must still DROP (state below the fake
    // watermark is the only thing that knows A) and a novel doc keeps
    writeOne(2, 3L, A); writeOne(3, 4L, G)
    val kept = run()
    assert(kept == Seq(1L, 2L, 4L),
      s"partial base dir was trusted as watermark — settled state lost: $kept")
  }

  test("streaming windowed agg equals the batch aggregation (sf0.001)") {
    val dir = "/root/testdata/sf0.001"
    val streamed = Streaming.runToTable(spark,
      Streaming.windowedAgg(Streaming.readEvents(spark, dir)),
      "stream_spec_check")
    val batch = Tables(spark, dir).events
      .groupBy(
        date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
    val s = streamed.orderBy("day", "event_type").collect()
    val b = batch.orderBy("day", "event_type").collect()
    assert(s.length == b.length && s.length > 0)
    assert(s.sameElements(b))
  }
}
