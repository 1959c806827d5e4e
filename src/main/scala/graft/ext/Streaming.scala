package graft.ext
import graft.Ckpt.CkptOps

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

import graft.ops.Relational.dsum
import graft.functions.Time.{tsMicros, tsSeconds}

/** Structured Streaming variants of the batch aggregations (SURVEY.md §2.9).
  *
  * The reference has no streaming; these are the extension-mandated
  * incremental forms of A1/A2 over the `events` table: readStream →
  * watermark → tumbling window → aggregate. State is bounded by the
  * watermark; at scale the same pipeline runs against a Kafka/file source
  * with checkpointing — only the source/sink options change.
  */
object Streaming {

  /** events schema for the streaming reader (streams must declare schemas —
    * no inference job on an unbounded source). Derived from the batch
    * file's parquet footer, NOT hardcoded: the corpus has shipped `ts` as
    * both TIMESTAMP(NANOS) (reads as nanos-long under the legacy conf) and
    * TIMESTAMP_NTZ(micros) across regenerations, and a schema pinned to
    * the wrong one either errors or — worse — silently mis-scales every
    * timestamp 1000×. One footer read per call; the subsequent
    * [[graft.io.Sources.normalizeTs]] branches on what the file actually
    * contains. */
  def eventsSchema(spark: SparkSession, src: String): StructType = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // memoized per (path, mtime+size) — staged files are immutable per
    // regeneration, and a fresh footer read per readEvents call costs the
    // same ~90 ms the batch layer's schema cache exists to remove
    graft.io.Sources.parquetSchema(spark, src)
  }

  /** Session for streaming runs: stateful-operator parallelism is a
    * CAPACITY knob — state volume per partition and per-partition state
    * store commit cost — not the analytic shuffle width, so it deserves
    * its own setting (each stream partition pays store open/commit/snapshot
    * per microbatch; a stream-stream join keeps four stores per partition).
    * `newSession` shares the SparkContext and catalog but carries an
    * independent SQLConf, so the override never leaks into concurrently
    * running batch queries. Everything built from the returned session
    * (readEvents → transforms → runToTable) inherits the setting.
    *
    * State store: RocksDB, not the default HDFS-backed provider. The
    * default keeps every partition's ENTIRE state map in executor heap
    * (plus a second copy while snapshotting) — the thing that OOMs first
    * when a stream-stream join or long-session state grows at 100 TB;
    * RocksDB spills state to local disk with bounded block-cache memory
    * and changelog-checkpoints to the fault-tolerant store. Same
    * exactly-once semantics, verified by the same oracles. */
  def streamingSession(spark: SparkSession, partitions: Int = 8): SparkSession = {
    val ss = spark.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", partitions.toString)
    ss.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    ss
  }

  /** File-source stream over the events parquet. The corpus ships
    * events.parquet as a single FILE, but Spark's file-stream source only
    * reads directories — stage a hardlink/copy into a temp dir once (cheap,
    * driver-side, test-corpus-only; a production source is a directory or
    * Kafka topic to begin with). */
  def readEvents(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val (streamDir, schemaPath) =
      streamSource(java.nio.file.Paths.get(dir, "events.parquet"))
    graft.io.Sources.normalizeTs(
      spark.readStream
        .schema(eventsSchema(spark, schemaPath))
        .parquet(streamDir))
  }

  /** File-source stream over the documents parquet — the ingest-stream
    * source for the streaming near-dedup path. Same staging contract as
    * [[readEvents]]; no timestamp normalization (documents carry none). */
  def readDocuments(spark: SparkSession, dir: String): DataFrame = {
    val (streamDir, schemaPath) =
      streamSource(java.nio.file.Paths.get(dir, "documents.parquet"))
    spark.readStream
      .schema(graft.io.Sources.parquetSchema(spark, schemaPath))
      .parquet(streamDir)
  }

  /** Resolve a corpus parquet source to a (streamable directory, schema
    * path) pair — staging single files behind the directory-only file
    * stream source per the [[readEvents]] contract. */
  private def streamSource(src: java.nio.file.Path): (String, String) = {
    val streamDir =
      if (java.nio.file.Files.isDirectory(src)) src.toString
      else {
        val name = src.getFileName.toString
        // cache key carries mtime+size: a REGENERATED source file at the
        // same path must re-stage, or the stream would silently read the
        // old inode through the stale hardlink
        val sig = s"${java.nio.file.Files.getLastModifiedTime(src)}" +
          s":${java.nio.file.Files.size(src)}"
        // keyed path -> (sig, dir): a regenerated source file REPLACES its
        // staged copy (the superseded dir is deleted) instead of accreting
        // one staged copy per regeneration within the JVM.
        // The superseded stage is RETIRED, not deleted: a streaming query
        // started against it before the source was regenerated may still be
        // mid-run, and deleting under it would fail that query on
        // file-not-found. Retired stages are kept last-N-bounded (see
        // retire), with the remainder cleaned at JVM exit. Retirement —
        // which recursively DELETES files — happens AFTER compute()
        // returns, never while holding the map's bin lock (a concurrent
        // readEvents for the same path must not block on disk I/O).
        // compute() runs the lambda synchronously on this thread, so a
        // plain local var captures the evicted dir across the call
        var evicted: String = null
        val staged = stagedDirs.compute(src.toString, { (_, prev) =>
          if (prev != null && prev._1 == sig) prev
          else {
            if (prev != null) evicted = prev._2
            val d = java.nio.file.Files.createTempDirectory(
              "graft_stream_" + name.stripSuffix(".parquet"))
            val dst = d.resolve(name)
            try java.nio.file.Files.createLink(dst, src)
            catch { case _: Exception => java.nio.file.Files.copy(src, dst) }
            (sig, d.toString)
          }
        })._2
        Option(evicted).foreach(retire)
        staged
      }
    // The stream's declared schema must come from the SAME inode the stream
    // will read: footer-read the STAGED file, not the live source path — a
    // regeneration racing between staging and schema read would otherwise
    // declare the new encoding against the old staged data (exactly the
    // 1000× ts mis-scale this footer-derived schema exists to prevent).
    val schemaPath =
      if (java.nio.file.Files.isDirectory(src)) src.toString
      else java.nio.file.Paths
        .get(streamDir, src.getFileName.toString).toString
    (streamDir, schemaPath)
  }

  /** One staged dir per source PATH per JVM (value = (mtime+size signature,
    * staged dir)) — repeated bench/test runs reuse it, and a regenerated
    * source evicts the stale stage instead of accreting. */
  private val stagedDirs =
    new java.util.concurrent.ConcurrentHashMap[String, (String, String)]()

  /** Superseded stages, newest last, bounded to [[retiredKeep]]: the most
    * recent N retired stages stay on disk for any stream still mid-run
    * against them; older ones (≥ N regenerations old — any stream that old
    * has either finished or already failed for its own reasons) are
    * deleted eagerly so a long-lived JVM doesn't accrete one stage per
    * regeneration. Whatever remains is cleaned at JVM exit. */
  private val retiredKeep = 4
  private val retiredDirs = new java.util.ArrayDeque[String]()
  private def retire(dir: String): Unit = retiredDirs.synchronized {
    retiredDirs.addLast(dir)
    while (retiredDirs.size > retiredKeep) rmTree(retiredDirs.pollFirst())
  }
  private def rmTree(d: String): Unit = {
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
    }
    rm(new java.io.File(d))
  }
  Runtime.getRuntime.addShutdownHook(new Thread(() => {
    retiredDirs.synchronized(retiredDirs.forEach(rmTree))
  }))

  /** Tumbling-window A1/A2: per (day, event_type) exact sums + counts,
    * 1-day watermark bounds state. */
  def windowedAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 day")
      .groupBy(window(col("ts"), "1 day"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd").as("day"),
        col("event_type"), col("n_events"), col("sum_value"))

  /** Custom-state sessionization (§2.9 depth): per-user session summaries
    * via `mapGroupsWithState` — sessions split on gaps > `gapMinutes`.
    * Events within a group are sorted in-state (bounded per user per
    * microbatch); state carries only counters + last timestamp, so it is
    * O(1) per user at any scale. */
  def sessionSummaries(spark: SparkSession, events: DataFrame,
                       gapMinutes: Int): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
    val gapMicros = gapMinutes * 60L * 1000000L
    events
      // microsecond longs, not Timestamp: exact ordering + arithmetic
      .select(col("user_id"), tsMicros(col("ts")).as("tsu"), col("event_id"))
      .as[(Long, Long, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState[(Long, Long, Long), (Long, Long, Long)](
        GroupStateTimeout.NoTimeout()) {
        case (user, it, state: GroupState[(Long, Long, Long)]) =>
          // state = (n_sessions, n_events, last_ts_micros)
          val (s0, e0, last0) = state.getOption.getOrElse((0L, 0L, Long.MinValue))
          var (s, e, last) = (s0, e0, last0)
          it.toSeq.sortBy(r => (r._2, r._3)).foreach { r =>
            if (last == Long.MinValue || r._2 - last > gapMicros) s += 1
            e += 1; last = r._2
          }
          state.update((s, e, last))
          (user, s, e)
      }
      .toDF("user_id", "n_sessions", "n_events")
  }

  /** Per-key streaming EWMA — the incremental form of
    * [[graft.ext.Timeseries.ewma]]: state is just (n_events, ewma), O(1)
    * per key forever, where the batch fold needs the key's history in one
    * task. Each microbatch sorts its own rows per key by (ts, event_id)
    * and folds them onto the carried state with EXACTLY the batch
    * arithmetic (y ← α·x + (1−α)·y, seeded with the key's first value), so
    * over the bounded AvailableNow source the result hash-matches the
    * batch/DuckDB oracle row for row — the streaming plan is proven
    * equivalent, not just plausible. Output rounds via the same
    * FLOOR(x·1e5 + 0.5) convention as the batch family. */
  def ewmaSummaries(spark: SparkSession, events: DataFrame,
                    alpha: Double): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0, 1]: $alpha")
    val decay = 1 - alpha
    events
      .select(col("user_id"), tsMicros(col("ts")).as("tsu"), col("event_id"),
        col("value").cast("double").as("v"))
      .as[(Long, Long, Long, Double)]
      .groupByKey(_._1)
      .mapGroupsWithState[(Long, Double), (Long, Long, Double)](
        GroupStateTimeout.NoTimeout()) {
        case (user, it, state: GroupState[(Long, Double)]) =>
          val (n0, e0) = state.getOption.getOrElse((0L, 0.0))
          var (n, e) = (n0, e0)
          it.toSeq.sortBy(r => (r._2, r._3)).foreach { r =>
            e = if (n == 0) r._4 else e * decay + r._4 * alpha
            n += 1
          }
          state.update((n, e))
          (user, n, math.floor(e * 100000.0 + 0.5) / 100000.0)
      }
      .toDF("user_id", "n_events", "ewma")
  }

  /** Streaming trailing-window anomaly detection — the incremental form of
    * [[graft.ext.Timeseries.anomalies]]: per-key state is ONLY the events
    * inside the last `windowSeconds` (evicted as the stream advances),
    * where the batch RANGE window re-scans the key's partition per query.
    * Rows of the SAME floor-second are absorbed into the buffer together
    * before any of them scores — that is the batch frame's peer rule
    * (RANGE includes same-second rows that sort later), not a convenience.
    * The z arithmetic replays the batch form exactly: integer numerator
    * and radicand (BigInt = the DECIMAL(38,0) path), one double division,
    * same FLOOR rounding — so over a bounded in-order source the flagged
    * rows hash-match the batch/DuckDB oracle. Late events older than the
    * key's current second would need watermark-held scoring (the
    * [[sessionRowsAppend]] treatment); this variant asserts the
    * batch-equivalence contract instead. */
  def anomalySummaries(spark: SparkSession, events: DataFrame,
                       windowSeconds: Long, threshold: Double,
                       minN: Long): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    require(windowSeconds > 0, s"windowSeconds must be > 0: $windowSeconds")
    events
      .select(col("user_id"), tsSeconds(col("ts")).as("sec"), col("event_id"),
        floor(col("value") * 100 + 0.5).cast("long").as("c"))
      .as[(Long, Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Seq[(Long, Long)], (Long, Long, Long, Double)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (user, it, state: GroupState[Seq[(Long, Long)]]) =>
          var buf = state.getOption.getOrElse(Seq.empty).toVector // (sec, c)
          val out = scala.collection.mutable.ArrayBuffer
            .empty[(Long, Long, Long, Double)]
          // process whole same-second RUNS: every peer joins the buffer
          // before any of them scores (the RANGE-frame peer rule)
          it.toSeq.sortBy(r => (r._2, r._3)).groupBy(_._2).toSeq.sortBy(_._1)
            .foreach { case (sec, run) =>
              buf = buf.filter(_._1 >= sec - windowSeconds) ++
                run.map(r => (sec, r._4))
              val n = buf.size.toLong
              val s = buf.iterator.map(_._2).sum
              val scc = buf.iterator
                .map(e => BigInt(e._2) * BigInt(e._2)).sum
              val den = BigInt(n) * scc - BigInt(s) * BigInt(s)
              run.sortBy(_._3).foreach { r =>
                val c = r._4
                if (n >= minN && den > 0) {
                  val z = (n * c - s).toDouble / math.sqrt(den.toDouble)
                  if (math.abs(z) > threshold)
                    out += ((user, r._3, n,
                      math.floor(z * 100000.0 + 0.5) / 100000.0))
                }
              }
            }
          state.update(buf)
          out.iterator
      }
      .toDF("user_id", "event_id", "n_win", "z")
  }

  /** One row PER SESSION via `flatMapGroupsWithState` (the multi-row-output
    * sibling of [[sessionSummaries]]'s mapGroupsWithState): sessions split
    * on gaps > `gapMinutes`; each emits (user, 1-based session index, event
    * count). State is the running session count + last ts — O(1) per user.
    * Batch-equivalence only: with NoTimeout, each batch emits the
    * still-open final session, which a later batch would re-emit with a
    * higher count if more events arrived. [[sessionRowsAppend]] is the true
    * incremental form (event-time timeout, exactly-once emission); this one
    * exists to mirror the batch oracle 1:1 over the bounded source. */
  def sessionRows(spark: SparkSession, events: DataFrame,
                  gapMinutes: Int): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val gapMicros = gapMinutes * 60L * 1000000L
    events
      .select(col("user_id"), tsMicros(col("ts")).as("tsu"), col("event_id"))
      .as[(Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long), (Long, Long, Long)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (user, it, state: GroupState[(Long, Long)]) =>
          // state = (n_sessions_so_far, last_ts_micros)
          var (sIdx, last) = state.getOption.getOrElse((0L, Long.MinValue))
          val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
          var n = 0L
          it.toSeq.sortBy(r => (r._2, r._3)).foreach { r =>
            if (last == Long.MinValue || r._2 - last > gapMicros) {
              if (n > 0) out += ((user, sIdx, n))
              sIdx += 1; n = 0L
            }
            n += 1; last = r._2
          }
          if (n > 0) out += ((user, sIdx, n))
          state.update((sIdx, last))
          out.iterator
      }
      .toDF("user_id", "session_idx", "n_events")
  }

  /** State for [[sessionRowsAppend]]: sessions close in event-time order,
    * so unconfirmed-but-closed ones queue in `pending` until the watermark
    * passes their gap boundary; `openN`/`openLast` track the live session.
    * `nextIdx` numbers sessions 1-based per user in start order. */
  case class PendSess(idx: Long, n: Long, endMicros: Long)
  case class SessAppendState(nextIdx: Long, pending: Seq[PendSess],
                             openN: Long, openLast: Long)

  /** TRUE append-mode sessionization: a session row is emitted EXACTLY ONCE,
    * and only after the event-time watermark passes its gap boundary
    * (EventTimeTimeout) — the correct incremental form ([[sessionRows]] is
    * the batch-equivalence variant; it re-emits the open session per batch).
    * Sessions closed by a later event still wait for watermark confirmation
    * (a late event inside the allowed lateness could otherwise have joined
    * them); trailing sessions whose boundary the final watermark never
    * passes are held in state — over a bounded AvailableNow run the final
    * no-data microbatch advances the watermark to the global max event
    * time, so exactly the sessions ending more than `gapMinutes` before
    * that max are emitted (the oracle replays that rule in SQL). */
  def sessionRowsAppend(spark: SparkSession, events: DataFrame,
                        gapMinutes: Int): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val gapMicros = gapMinutes * 60L * 1000000L

    def confirm(st: SessAppendState, wmMicros: Long,
                closeOpen: Boolean): (Seq[PendSess], SessAppendState) = {
      val withOpen =
        if (closeOpen && st.openN > 0 && st.openLast + gapMicros <= wmMicros)
          SessAppendState(st.nextIdx + 1,
            st.pending :+ PendSess(st.nextIdx, st.openN, st.openLast),
            0L, Long.MinValue)
        else st
      val (done, rest) = withOpen.pending.partition(_.endMicros + gapMicros <= wmMicros)
      (done, withOpen.copy(pending = rest))
    }

    events
      .withWatermark("ts", "0 seconds")
      // the watermarked ts column itself must reach the stateful operator
      // (the event-time-timeout checker requires it in the child output);
      // the micros long the state logic uses rides alongside
      .select(col("user_id"), tsMicros(col("ts")).as("tsu"),
        col("event_id"), col("ts"))
      .as[(Long, Long, Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[SessAppendState, (Long, Long, Long)](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (user, it, state: GroupState[SessAppendState]) =>
          val wmMicros = state.getCurrentWatermarkMs() * 1000L
          var st = state.getOption.getOrElse(
            SessAppendState(1L, Nil, 0L, Long.MinValue))
          if (!state.hasTimedOut) {
            var (nextIdx, pending, n, last) =
              (st.nextIdx, st.pending, st.openN, st.openLast)
            it.toSeq.sortBy(r => (r._2, r._3)).foreach { r =>
              if (last != Long.MinValue && r._2 - last > gapMicros) {
                pending = pending :+ PendSess(nextIdx, n, last)
                nextIdx += 1; n = 0L
              }
              n += 1; last = r._2
            }
            st = SessAppendState(nextIdx, pending, n, last)
          }
          val (done, kept) = confirm(st, wmMicros, closeOpen = state.hasTimedOut)
          // drained state still keeps the session counter (same rationale
          // as the tws processor's arm(): removing it would renumber a
          // returning user's sessions from 1)
          if (kept.pending.isEmpty && kept.openN == 0) state.update(kept)
          else {
            state.update(kept)
            // next confirmation boundary; EventTimeTimeout requires a
            // timestamp beyond the current watermark
            val boundaries = kept.pending.map(_.endMicros) ++
              (if (kept.openN > 0) Seq(kept.openLast) else Nil)
            val nextMs = (boundaries.min + gapMicros) / 1000L
            state.setTimeoutTimestamp(math.max(nextMs, state.getCurrentWatermarkMs() + 1))
          }
          done.iterator.map(p => (user, p.idx, p.n))
      }
      .toDF("user_id", "session_idx", "n_events")
  }

  /** [[sessionSummariesTws]]'s processor: the Spark 4 `StatefulProcessor`
    * form of [[sessionSummaries]]'s mapGroupsWithState closure. State is a
    * single ValueState tuple (n_sessions, n_events, last_ts_micros) — the
    * arbitrary-state-v2 API stores each named state in its own RocksDB
    * column family, so at scale a processor can carry several independent
    * states (value/list/map) without packing them into one blob, and TTL
    * is per-state declarative (TTLConfig) instead of hand-rolled timeout
    * bookkeeping. Top-level class, not an anonymous closure: the processor
    * is serialized to executors and must not capture the enclosing object. */
  private[ext] class SessionTwsProcessor(gapMicros: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, (Long, Long, Long), (Long, Long, Long)] {
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode, TimerValues, TTLConfig, ValueState}
    @transient private var st: ValueState[(Long, Long, Long)] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[(Long, Long, Long)]("sess",
        org.apache.spark.sql.Encoders.product[(Long, Long, Long)],
        TTLConfig.NONE)
    override def handleInputRows(user: Long, it: Iterator[(Long, Long, Long)],
                                 timers: TimerValues): Iterator[(Long, Long, Long)] = {
      var (s, e, last) = if (st.exists()) st.get() else (0L, 0L, Long.MinValue)
      it.toSeq.sortBy(r => (r._2, r._3)).foreach { r =>
        if (last == Long.MinValue || r._2 - last > gapMicros) s += 1
        e += 1; last = r._2
      }
      st.update((s, e, last))
      Iterator.single((user, s, e))
    }
  }

  /** [[sessionRowsAppendTws]]'s processor — [[sessionRowsAppend]]'s
    * exactly-once append sessionization rebuilt on the v2 state primitives:
    * the open session in a ValueState, watermark-unconfirmed closed
    * sessions in a ListState (v1 had to serialize the whole Seq into one
    * state blob; v2 appends element-wise, so a long pending queue never
    * rewrites itself), and confirmation driven by EVENT-TIME TIMERS
    * (`registerTimer`/`handleExpiredTimer`) instead of v1's single
    * per-key timeout timestamp. Emission rule is identical: a session row
    * leaves exactly once, only after the watermark passes its gap
    * boundary, so the two variants share one oracle. */
  private[ext] class SessionAppendTwsProcessor(gapMicros: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, (Long, Long, Long, java.sql.Timestamp), (Long, Long, Long)] {
    import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState, OutputMode, TimeMode, TimerValues, TTLConfig, ValueState}
    // open = (nextIdx, openN, openLastMicros); pending = closed, unconfirmed
    @transient private var open: ValueState[(Long, Long, Long)] = _
    @transient private var pending: ListState[PendSess] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      open = getHandle.getValueState[(Long, Long, Long)]("open",
        org.apache.spark.sql.Encoders.product[(Long, Long, Long)], TTLConfig.NONE)
      pending = getHandle.getListState[PendSess]("pending",
        org.apache.spark.sql.Encoders.product[PendSess], TTLConfig.NONE)
    }

    /** Emit every pending session the watermark has confirmed; keep the
      * rest. Returns the emitted rows. */
    private def confirm(user: Long, wmMicros: Long): Seq[(Long, Long, Long)] = {
      val all = pending.get().toSeq
      val (done, rest) = all.partition(_.endMicros + gapMicros <= wmMicros)
      // put() rejects empty arrays (ILLEGAL_STATE_STORE_VALUE) — clear instead
      if (done.nonEmpty) {
        if (rest.isEmpty) pending.clear() else pending.put(rest.toArray)
      }
      done.map(p => (user, p.idx, p.n))
    }

    /** Point the next timer at the earliest unconfirmed gap boundary
      * (clamped past the current watermark). When drained (every session
      * confirmed, none open) the pending queue clears but the per-user
      * session COUNTER stays: clearing it renumbered a returning user's
      * sessions from 1 — observed as a checkpoint-recovery divergence
      * (StreamingSpec "checkpoint recovery") and equally wrong across
      * microbatches within one run. Cumulative per-user numbering costs
      * exactly this one small ValueState per ever-seen user. */
    private def arm(wmMicros: Long): Unit = {
      val (idx, n, last) =
        if (open.exists()) open.get() else (1L, 0L, Long.MinValue)
      val boundaries = pending.get().map(_.endMicros).toSeq ++
        (if (n > 0) Seq(last) else Nil)
      if (boundaries.isEmpty) {
        pending.clear()
        open.update((idx, 0L, Long.MinValue))
      }
      else {
        val nextMs = (boundaries.min + gapMicros) / 1000L
        val target = math.max(nextMs, wmMicros / 1000L + 1)
        if (!getHandle.listTimers().contains(target))
          getHandle.registerTimer(target)
      }
    }

    override def handleInputRows(
        user: Long, it: Iterator[(Long, Long, Long, java.sql.Timestamp)],
        timers: TimerValues): Iterator[(Long, Long, Long)] = {
      val wm = timers.getCurrentWatermarkInMs() * 1000L
      var (nextIdx, n, last) =
        if (open.exists()) open.get() else (1L, 0L, Long.MinValue)
      it.toSeq.sortBy(r => (r._2, r._3)).foreach { r =>
        if (last != Long.MinValue && r._2 - last > gapMicros) {
          pending.appendValue(PendSess(nextIdx, n, last))
          nextIdx += 1; n = 0L
        }
        n += 1; last = r._2
      }
      open.update((nextIdx, n, last))
      val out = confirm(user, wm)
      arm(wm)
      out.iterator
    }

    override def handleExpiredTimer(
        user: Long, timers: TimerValues,
        info: ExpiredTimerInfo): Iterator[(Long, Long, Long)] = {
      val wm = timers.getCurrentWatermarkInMs() * 1000L
      val (idx, n, last) = if (open.exists()) open.get() else (1L, 0L, Long.MinValue)
      if (n > 0 && last + gapMicros <= wm) {
        pending.appendValue(PendSess(idx, n, last))
        open.update((idx + 1, 0L, Long.MinValue))
      }
      val out = confirm(user, wm)
      arm(wm)
      out.iterator
    }
  }

  /** TRUE append-mode sessionization on `transformWithState` with
    * event-time timers — the v2 sibling of [[sessionRowsAppend]] (same
    * exactly-once watermark-confirmed emission, same oracle). Streaming
    * only: timers need the event-time watermark machinery. */
  def sessionRowsAppendTws(spark: SparkSession, events: DataFrame,
                           gapMinutes: Int): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    val gapMicros = gapMinutes * 60L * 1000000L
    events
      .withWatermark("ts", "0 seconds")
      .select(col("user_id"), tsMicros(col("ts")).as("tsu"),
        col("event_id"), col("ts"))
      .as[(Long, Long, Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .transformWithState(new SessionAppendTwsProcessor(gapMicros),
        TimeMode.EventTime(), OutputMode.Append())
      .toDF("user_id", "session_idx", "n_events")
  }

  /** Per-user session summaries via `transformWithState` — the Spark 4
    * arbitrary-stateful-processing v2 API ([[sessionSummaries]] is the same
    * computation on the v1 `mapGroupsWithState`). Semantically identical
    * (same gap rule, same in-state sort), so the two share one SQL oracle;
    * what v2 buys at scale: per-state RocksDB column families, declarative
    * per-state TTL, timers decoupled from state (registerTimer), and
    * initial-state bootstrap — the API Spark is converging stateful
    * pipelines on. Runs in batch too (Spark plans it with a transient
    * per-partition state store), which is how the oracle checks it. */
  def sessionSummariesTws(spark: SparkSession, events: DataFrame,
                          gapMinutes: Int): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    // Batch-planned transformWithState still loads its transient state
    // stores through the driver's StateStoreCoordinator RPC endpoint, but
    // only a running STREAMING query registers that endpoint — a batch-only
    // session fails CANNOT_LOAD_STATE_STORE (RpcEndpointNotFoundException).
    // Touch the query manager's coordinator (private[sql], hence the one
    // reflective call) so the endpoint exists before the job runs.
    spark.streams.getClass.getMethod("stateStoreCoordinator")
      .invoke(spark.streams)
    val gapMicros = gapMinutes * 60L * 1000000L
    events
      .select(col("user_id"), tsMicros(col("ts")).as("tsu"), col("event_id"))
      .as[(Long, Long, Long)]
      .groupByKey(_._1)
      .transformWithState(new SessionTwsProcessor(gapMicros),
        TimeMode.None(), OutputMode.Update())
      .toDF("user_id", "n_sessions", "n_events")
  }

  /** [[sessionSummariesTwsBootstrapped]]'s processor: the
    * `StatefulProcessorWithInitialState` form of [[SessionTwsProcessor]] —
    * identical per-row logic, plus `handleInitialState` seeds each user's
    * (n_sessions, n_events, last_ts) from a BATCH-computed history frame
    * before the first microbatch. This is the v2 API's migration story: a
    * new streaming job takes over from a batch pipeline (or a replaced
    * stream) WITHOUT replaying history — state starts where the batch
    * summary left off, and the session-gap rule bridges the boundary
    * exactly (a stream event within `gap` of the last history event
    * continues that session). */
  private[ext] class SessionTwsBootProcessor(gapMicros: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessorWithInitialState[
        Long, (Long, Long, Long), (Long, Long, Long), (Long, Long, Long)] {
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode, TimerValues, TTLConfig, ValueState}
    @transient private var st: ValueState[(Long, Long, Long)] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[(Long, Long, Long)]("sess",
        org.apache.spark.sql.Encoders.product[(Long, Long, Long)],
        TTLConfig.NONE)
    override def handleInitialState(user: Long, initial: (Long, Long, Long),
                                    timers: TimerValues): Unit =
      st.update(initial)
    override def handleInputRows(user: Long, it: Iterator[(Long, Long, Long)],
                                 timers: TimerValues): Iterator[(Long, Long, Long)] = {
      var (s, e, last) = if (st.exists()) st.get() else (0L, 0L, Long.MinValue)
      it.toSeq.sortBy(r => (r._2, r._3)).foreach { r =>
        if (last == Long.MinValue || r._2 - last > gapMicros) s += 1
        e += 1; last = r._2
      }
      st.update((s, e, last))
      Iterator.single((user, s, e))
    }
  }

  /** Batch session state per user — (user_id, n_sessions, n_events,
    * last_ts_micros) via the lag-window formulation. The bootstrap frame
    * for [[sessionSummariesTwsBootstrapped]]; one shuffle, no state. */
  def sessionStateBatch(events: DataFrame, gapMinutes: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val gapMicros = gapMinutes * 60L * 1000000L
    val w = Window.partitionBy("user_id").orderBy("tsu", "event_id")
    events
      .select(col("user_id"), tsMicros(col("ts")).as("tsu"), col("event_id"))
      .withColumn("__prev", lag(col("tsu"), 1).over(w))
      .withColumn("__new_s",
        when(col("__prev").isNull || col("tsu") - col("__prev") > gapMicros, 1L)
          .otherwise(0L))
      .groupBy("user_id")
      .agg(sum(col("__new_s")).as("n_sessions"),
        count(lit(1)).as("n_events"), max(col("tsu")).as("last_tsu"))
  }

  /** Gap sessionization over a STREAM that takes over from batch history:
    * `history` (a batch frame of past events) seeds per-user state via the
    * v2 initial-state API, then the stream continues it — sessions
    * spanning the handover boundary merge exactly as if one engine had
    * seen every event (the registered oracle is the plain full-range
    * sessionization, so the hash PROVES the handover is seamless). */
  def sessionSummariesTwsBootstrapped(spark: SparkSession, stream: DataFrame,
                                      history: DataFrame,
                                      gapMinutes: Int): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    val gapMicros = gapMinutes * 60L * 1000000L
    val initial = sessionStateBatch(history, gapMinutes)
      .select(col("user_id"), col("n_sessions"), col("n_events"),
        col("last_tsu"))
      .as[(Long, Long, Long, Long)]
      .groupByKey(_._1)
      .mapValues(r => (r._2, r._3, r._4))
    stream
      .select(col("user_id"), tsMicros(col("ts")).as("tsu"), col("event_id"))
      .as[(Long, Long, Long)]
      .groupByKey(_._1)
      .transformWithState(new SessionTwsBootProcessor(gapMicros),
        TimeMode.None(), OutputMode.Update(), initial)
      .toDF("user_id", "n_sessions", "n_events")
  }

  /** Streaming CDC sink: apply a change-log STREAM into a standing table
    * via foreachBatch + [[graft.ops.Cdc.applyChangesVersioned]] — the
    * streaming-ingestion → merged-table loop (Kafka/Debezium → MERGE INTO)
    * every lakehouse pipeline runs. The versioned merge is associative
    * over batch splits, so the final table is independent of how the
    * source happened to batch the log — the property the spec pins with
    * random splits.
    *
    * The evolving target lives as a localCheckpoint'ed DataFrame (each
    * batch materializes the new target and breaks lineage — without that,
    * plan depth grows per microbatch). Production swaps the in-memory
    * target for a transactional table write (Delta/Iceberg MERGE) with the
    * identical per-batch plan; state here is bounded by the TABLE size,
    * exactly like the real sink. Returns the final table INCLUDING
    * tombstones — read the live rows with `op = 'U'`. */
  def mergeStream(changeStream: DataFrame, initial: DataFrame, key: String,
                  opCol: String = "op", seqCol: String = "seq"): DataFrame = {
    // AtomicReference, not a var: batches write on the microbatch thread,
    // the final read happens on the caller thread after awaitTermination —
    // the handoff needs an explicit happens-before, not the accidental one
    // inside the stream's own locks
    val target = new java.util.concurrent.atomic.AtomicReference(
      initial.ckpt())
    val q = changeStream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        target.set(graft.ops.Cdc
          .applyChangesVersioned(target.get(), batch, key, opCol, seqCol)
          .ckpt())
      }
      .outputMode("update")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    target.get()
  }

  /** STREAMING near-dedup against the persisted corpus index — the ingest
    * path completed: a document stream is filtered per micro-batch by
    * [[Dedup.incrementalNearDedupPersisted]] against the standing index
    * PLUS every stream document seen in earlier batches, so a later batch
    * drops near-duplicates of anything already streamed (first-seen wins —
    * the policy the batch sibling expresses as keep-min-id; the two agree
    * whenever arrival order is id-ascending, trivially so on a one-batch
    * bounded run, which is why `stream_near_dedup` shares
    * `dedup_incr_near_persisted`'s oracle verbatim).
    *
    * State is DURABLE and restart-idempotent, not a driver variable: each
    * batch writes its accepted docs to `outDir/bid=<batchId>` and its
    * band/shingle contribution (for ALL batch docs — dropped docs still
    * suppress later copies, exactly the oracle's any-earlier-doc rule) to
    * `stateDir/{bands,sets}/bid=<batchId>`, mode OVERWRITE — a batch
    * replayed after a crash between write and offset-commit rewrites the
    * same partition instead of duplicating it (the foreachBatch
    * exactly-once recipe). Each batch's index view = base index ∪
    * contributions with bid < current, so a replayed batch never sees its
    * own stale partial write. At 100 TB the contributions are exactly
    * what ingest appends to the standing index — the corpus is never
    * re-scanned (same plan contract as the batch sibling).
    *
    * Returns the accepted documents read back from `outDir` (empty-input
    * streams return an empty frame of the stream's schema). */
  def nearDedupStream(docStream: DataFrame, corpusBands: DataFrame,
                      corpusShingles: DataFrame, stateDir: String,
                      outDir: String, ckptDir: String,
                      idCol: String, textCol: String,
                      threshold: Double = 0.7, numHashes: Int = 64,
                      bands: Int = 16, shingleK: Int = 3,
                      maxBucket: Int = 10000,
                      compactEvery: Int = 8): DataFrame = {
    require(compactEvery >= 1, s"compactEvery must be >= 1: $compactEvery")
    val spark = docStream.sparkSession
    // a state dir can legitimately exist but hold NO parquet right after
    // a compaction deleted every settled bid partition and before the
    // current batch wrote its own — read it as absent, not as an
    // UNABLE_TO_INFER_SCHEMA failure
    def part(base: String): Option[DataFrame] =
      if (java.nio.file.Files.exists(java.nio.file.Paths.get(base)))
        try Some(spark.read.parquet(base))
        catch {
          case e: org.apache.spark.sql.AnalysisException
            if e.getErrorClass == "UNABLE_TO_INFER_SCHEMA" => None
        }
      else None
    // ---- bounded state (round-13): fold settled bid partitions into a
    // compacted base every `compactEvery` batches, so a long-running
    // ingest's per-batch plan reads ONE base + at most `compactEvery`
    // bid partitions instead of a file listing + union that grows with
    // batch count forever (the Sinks.compact precedent, stream-side).
    // The current base is the MAX `upto=` dir: base(upto=k) holds every
    // contribution with bid < k. All writes are idempotent overwrites —
    // a batch replayed after a crash anywhere in the sequence rebuilds
    // the same view: compaction to an existing upto is a no-op, and
    // partitions below the base watermark are EXCLUDED by the bid-range
    // filter even when their deferred deletion hasn't happened yet.
    // A crash during the merged-base write leaves a partial upto= dir
    // (only _temporary, no _SUCCESS). Such a dir must NOT become the
    // watermark: it would make compactTo skip the merge (cur == upTo)
    // and the deferred cleanup would delete the previous good base and
    // every settled partition below it — silently losing the whole
    // settled index. Only a committed write (_SUCCESS present) counts;
    // a partial dir is invisible here and gets overwritten by the next
    // compaction's mode("overwrite") write to the same path.
    def baseUpto(kind: String): Long = {
      val d = java.nio.file.Paths.get(s"$stateDir/${kind}_base")
      if (!java.nio.file.Files.exists(d)) 0L
      else {
        val us = d.toFile.listFiles().toSeq
          .filter(f => f.getName.startsWith("upto=") &&
            new java.io.File(f, "_SUCCESS").exists())
          .map(_.getName.stripPrefix("upto=").toLong)
        if (us.isEmpty) 0L else us.max
      }
    }
    def rmTree(f: java.io.File): Unit = {
      Option(f.listFiles).foreach(_.foreach(rmTree)); f.delete(); ()
    }
    def compactTo(kind: String, upTo: Long): Unit = {
      val cur = baseUpto(kind)
      if (cur < upTo) {
        val settled = part(s"$stateDir/$kind")
          .map(_.where(col("bid") >= cur && col("bid") < upTo).drop("bid"))
        val base = part(s"$stateDir/${kind}_base/upto=$cur")
        val merged = (base, settled) match {
          case (Some(b), Some(s)) => Some(b.unionByName(s))
          case (b, s) => b.orElse(s)
        }
        merged.foreach(_.write.mode("overwrite")
          .parquet(s"$stateDir/${kind}_base/upto=$upTo"))
      }
      // deferred cleanup (retried each compaction): older bases and
      // below-watermark partitions are dead weight, never read again
      val w = baseUpto(kind)
      val baseDir = new java.io.File(s"$stateDir/${kind}_base")
      Option(baseDir.listFiles).foreach(_.filter { f =>
        f.getName.startsWith("upto=") &&
          f.getName.stripPrefix("upto=").toLong < w
      }.foreach(rmTree))
      val partDir = new java.io.File(s"$stateDir/$kind")
      Option(partDir.listFiles).foreach(_.filter { f =>
        f.getName.startsWith("bid=") &&
          f.getName.stripPrefix("bid=").toLong < w
      }.foreach(rmTree))
    }
    def indexView(kind: String, corpus: DataFrame, batchId: Long): DataFrame = {
      val cur = baseUpto(kind)
      val base = part(s"$stateDir/${kind}_base/upto=$cur")
      val recent = part(s"$stateDir/$kind")
        .map(_.where(col("bid") >= cur && col("bid") < batchId).drop("bid"))
      Seq(Some(corpus), base, recent).flatten.reduce(_ unionByName _)
    }
    val q = docStream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (batchId > 0 && batchId % compactEvery == 0) {
          compactTo("bands", batchId)
          compactTo("sets", batchId)
        }
        val idxBands = indexView("bands", corpusBands, batchId)
        val idxSets = indexView("sets", corpusShingles, batchId)
        val kept = Dedup.incrementalNearDedupPersisted(idxBands, idxSets,
          batch, idCol, textCol, threshold, numHashes, bands, shingleK,
          maxBucket).ckpt()
        kept.write.mode("overwrite").parquet(s"$outDir/bid=$batchId")
        // ALL batch docs enter the index — a dropped doc must still
        // suppress its own later near-copies (the oracle's rule)
        val (nb, ns) = Dedup.corpusNearDupIndex(batch, idCol, textCol,
          numHashes, bands, shingleK)
        nb.write.mode("overwrite").parquet(s"$stateDir/bands/bid=$batchId")
        ns.write.mode("overwrite").parquet(s"$stateDir/sets/bid=$batchId")
      }
      .outputMode("update")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ckptDir)
      .start()
    q.awaitTermination()
    part(outDir).map(_.drop("bid")).getOrElse(
      spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
        docStream.schema))
  }

  /** Run a streaming DataFrame to completion over the (bounded) file source
    * with AvailableNow, collecting results via a memory sink; returns the
    * final table. Batch-equivalent by construction — used to verify the
    * streaming plan against the batch oracle. */
  def runToTable(spark: SparkSession, streamed: DataFrame, name: String,
                 outputMode: String = "complete"): DataFrame = {
    // the memory sink registers its table in the session that OWNS the
    // streaming frame (which may be a streamingSession child) — resolve
    // everything there, not in the caller's session
    val own = streamed.sparkSession
    val q = streamed.writeStream
      .format("memory")
      .queryName(name)
      .outputMode(outputMode)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // snapshot the sink (results here are bounded: aggregates / verify-size
    // frames), then drop the memory-sink temp view — otherwise a long-lived
    // session running the bench repeatedly accretes stream_* tables
    val out = own.table(name).ckpt()
    own.catalog.dropTempView(name)
    out
  }

  /** STREAM-STREAM interval join (attribution): purchases joined to the
    * clicks they follow within `windowMinutes`, per user — the canonical
    * two-stream correlation. Both sides are event-time streams (here a
    * self-split of one source; Kafka topics in production); the join
    * condition carries the time-range bound Structured Streaming requires
    * to size join state, and the watermarks bound how long an unmatched
    * row is retained. `lateness` must cover the source's disorder: state
    * for rows older than (watermark − lateness) is dropped, and a match
    * arriving later is LOST — that is the streaming contract, not a bug.
    * Over the bounded AvailableNow source a `lateness` ≥ the corpus time
    * span makes the result exactly the batch join (the oracle). */
  def attributionJoin(events: DataFrame, windowMinutes: Int,
                      lateness: String = "30 days"): DataFrame = {
    val clicks = events.where(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", lateness)
    val purchases = events.where(col("event_type") === "purchase")
      .select(col("user_id").as("__puid"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", lateness)
    clicks.join(purchases,
        col("user_id") === col("__puid") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") <= col("click_ts") +
          expr(s"INTERVAL $windowMinutes MINUTES"))
      .select(col("click_id"), col("purchase_id"), col("user_id"),
        (tsMicros(col("purchase_ts")) - tsMicros(col("click_ts")))
          .as("lag_us"))
  }

  /** Sessionization via the NATIVE streaming `session_window` — the
    * built-in alternative to the hand-rolled state of [[sessionRowsAppend]]:
    * Spark merges overlapping [ts, ts+gap) intervals in the session-window
    * state store and emits a session exactly once, when the watermark
    * passes its end. Same bounded-source contract as sessionize_append:
    * over an AvailableNow run the final no-data batch advances the
    * watermark to the global max event time, so exactly the sessions
    * ending (last event + gap) at or before that watermark are emitted —
    * the oracle replays that rule in SQL. Output shape matches
    * [[graft.ext.Funnel.sessionizeNative]] (the batch twin) minus the
    * watermark-held tail. */
  def sessionWindowAppend(events: DataFrame, gapMinutes: Int): DataFrame =
    events
      .withWatermark("ts", "0 seconds")
      .groupBy(col("user_id"),
        session_window(col("ts"), s"$gapMinutes minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        date_format(col("session_window.start"), "yyyy-MM-dd HH:mm:ss")
          .as("session_start"),
        date_format(col("session_window.end"), "yyyy-MM-dd HH:mm:ss")
          .as("session_end"),
        col("n_events"))

  /** Streaming dedup within watermark (§2.9): first event per
    * (user_id, event_type); the 1-day watermark bounds dedup state. */
  def dedupedPairs(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 day")
      .dropDuplicates("user_id", "event_type")

  /** [[dedupedPairs]] via `dropDuplicatesWithinWatermark` — the API for
    * sources whose duplicates carry DIFFERENT event times (retried
    * webhooks, at-least-once producers): plain dropDuplicates keys state
    * forever unless the event-time column is part of the key, while the
    * WithinWatermark form guarantees dedup of duplicates arriving within
    * the watermark delay of the first occurrence AND evicts state after
    * it — the production shape for unbounded dedup state. Same
    * first-per-key result over the bounded source. */
  def dedupedPairsWithinWatermark(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 day")
      .dropDuplicatesWithinWatermark("user_id", "event_type")

  /** LEFT OUTER stream-stream interval join: [[attributionJoin]] plus the
    * unattributed clicks, which Structured Streaming emits with a null
    * purchase side only once the watermark proves no match can still
    * arrive (state eviction — the outer row cannot be produced eagerly or
    * a late purchase would contradict it). `lateness` here must be the
    * REAL disorder bound, not the whole corpus span: the watermark's
    * advance is what releases unmatched rows, so a 30-day lateness over a
    * 30-day corpus would hold every unmatched click in state to the end
    * and emit nothing. Over the bounded AvailableNow source the final
    * watermark is the ms-floored global max event time, so exactly the
    * clicks whose window closed strictly before it emit null rows — the
    * oracle replays that rule. */
  def attributionJoinOuter(events: DataFrame, windowMinutes: Int): DataFrame = {
    val clicks = events.where(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", "0 seconds")
    val purchases = events.where(col("event_type") === "purchase")
      .select(col("user_id").as("__puid"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", "0 seconds")
    clicks.join(purchases,
        col("user_id") === col("__puid") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") <= col("click_ts") +
          expr(s"INTERVAL $windowMinutes MINUTES"),
        "left_outer")
      .select(col("click_id"), col("purchase_id"), col("user_id"),
        (tsMicros(col("purchase_ts")) - tsMicros(col("click_ts")))
          .as("lag_us"))
  }
}
