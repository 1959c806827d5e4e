package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): times every registered query on
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line. A failing query is reported
  * in an "errors" object — never silently timed as if it succeeded.
  *
  * Two passes:
  *   1. COVERAGE: every registered query back-to-back, 2 runs each, best.
  *      Cheap queries get believable numbers here; expensive ones can read
  *      several times their true cost because a 140+-query run in one JVM
  *      accumulates GC pressure, shuffle-dir churn, and JIT deopt (round 5:
  *      dq_report benched 8.99 s vs 1.02 s isolated — 9x phantom).
  *   2. QUIET RE-TIME: the K slowest queries from pass 1 re-run one at a
  *      time in a fresh session with cache clear + System.gc() + settle
  *      before each, approximating an isolated JVM. The reported per-query
  *      time is the best across both passes, so BENCH_r* is a usable
  *      regression signal for exactly the queries where pass 1 lies.
  * The JSON carries "retimed" (quiet-pass values) so a reader can see which
  * numbers were corrected and by how much.
  */
/** JSON formatting for the bench line, factored out for the locale spec:
  * the one line the driver parses must be byte-identical under any default
  * locale (a comma-decimal locale turns an f-interpolated %.3f into
  * `0,123` — invalid JSON). */
object BenchFormat {
  def esc(s: String): String = s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }
  def sec(d: Double): String =
    String.format(java.util.Locale.ROOT, "%.3f", Double.box(d))
}

object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
    // optional conf overrides for experiments: SPARK_GRAFT_CONF="k=v;k2=v2"
    sys.env.get("SPARK_GRAFT_CONF").toSeq
      .flatMap(_.split(";")).map(_.trim).filter(_.contains("="))
      .foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        builder.config(k, v)
      }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // corpus signature up front: BENCH artifacts must say WHICH corpus they
    // measured (round 6 closed against data the driver regenerated later —
    // schema drift was invisible in every artifact)
    val corpusSig = graft.io.CorpusSig.summary(spark, sfDir)
    graft.io.CorpusSig.perTable(spark, sfDir).foreach { case (n, m, h) =>
      System.err.println(s"[corpus] $n schema=$h mtime=$m")
    }
    System.err.println(s"[corpus] signature=$corpusSig dir=$sfDir")

    import BenchFormat.{esc, sec}

    // dev loop: SPARK_GRAFT_ONLY="q1,q2" times just those queries
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)

    def once(sess: SparkSession, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      // noop sink, NOT count(): count() lets Catalyst prune every output
      // column, so a query whose cost lives in its final projections
      // (string building, regex, HOF transforms) would time as a bare scan.
      // The noop sink consumes all columns — the same work Verify's parquet
      // dump pays — without write I/O.
      fn(sess, sfDir).write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }

    val runs = 2
    val results: Seq[(String, Either[String, Seq[Double]])] =
      SparkEntry.queries.toSeq.sortBy(_._1)
        .filter { case (name, _) => only.forall(_.contains(name)) }
        .map { case (name, fn) =>
        try {
          val base = (1 to runs).map(_ => once(spark, fn))
          // contention armor: when the two runs disagree >2x, something
          // external (GC, a concurrent process) likely polluted the window —
          // take a third run so the min is a believable operator time
          val times = if (base.max > 2 * base.min) base :+ once(spark, fn) else base
          name -> Right(times)
        } catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
            name -> Left(Option(e.getMessage).getOrElse(e.getClass.getName))
        }
      }

    val ok = results.collect { case (n, Right(ts)) => n -> ts.min }
    val bad = results.collect { case (n, Left(m)) => n -> m }

    // ---- pass 2: quiet re-time of the K slowest --------------------------
    // K defaults to 12 (round 5's top-12 covered every query >1.2 s at
    // sf0.1). Settle: clear cached relations, force a full GC (which also
    // drives the ContextCleaner's shuffle/broadcast cleanup), and give the
    // JVM a beat for compilation/cleanup threads to drain.
    val retimeK = sys.env.get("SPARK_GRAFT_RETIME").map(_.toInt).getOrElse(12)
    val byName = SparkEntry.queries
    val slowest = ok.sortBy(-_._2).take(retimeK).map(_._1)
    val retimed: Seq[(String, Double)] = slowest.flatMap { name =>
      try {
        spark.catalog.clearCache()
        System.gc()
        Thread.sleep(800)
        val sess = spark.newSession()
        sess.conf.set("spark.sql.shuffle.partitions", cpus)
        val ts = (1 to runs).map(_ => once(sess, byName(name)))
        Some(name -> ts.min)
      } catch { case e: Throwable =>
        System.err.println(s"[bench] retime $name FAILED: ${e.getMessage}")
        None
      }
    }
    val retimedMap = retimed.toMap

    // headline per-query number: best across both passes (a quiet-pass run
    // can still catch a stray GC; never report worse than what pass 1 saw)
    val finalTimes = ok.map { case (n, t) =>
      n -> math.min(t, retimedMap.getOrElse(n, t))
    }

    // per-query fixed cost of this harness (plan + dispatch + 32-partition
    // scheduling of a trivial job) — lets a reader separate Spark's
    // small-data constant from actual operator work when comparing against
    // the single-thread pandas baseline
    val floor = (1 to runs).map { _ =>
      val t0 = System.nanoTime()
      spark.range(1).write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }.min

    // Output layout vs the driver's TAIL-keeping truncation (r06 lost the
    // whole per-query map and graded on errors+summary alone):
    //   stderr — diagnostics (coverage-pass raws, retime corrections);
    //            expendable
    //   stdout — EXACTLY ONE JSON line (the driver contract), kept COMPACT
    //            (queries + errors + summary + corpus signature only) so it
    //            fits inside any plausible tail window intact and parses
    val qs = finalTimes.sortBy(_._2).map { case (k, t) =>
      "\"" + esc(k) + "\":" + sec(t)
    }.mkString("{", ",", "}")
    val rt = retimed.sortBy(-_._2).map { case (k, t) =>
      "\"" + esc(k) + "\":" + sec(t)
    }.mkString("{", ",", "}")
    // coverage-pass raw values for the retimed set: the delta vs "retimed"
    // is the measured contention inflation, kept for honesty
    val raw = retimed.sortBy(-_._2).map { case (k, _) =>
      "\"" + esc(k) + "\":" + sec(ok.toMap.apply(k))
    }.mkString("{", ",", "}")
    val errs = bad.map { case (k, m) => "\"" + esc(k) + "\":\"" + esc(m) + "\"" }
      .mkString("{", ",", "}")
    val total = finalTimes.map(_._2).sum
    System.err.println(s"""[bench] {"coverage_pass":$raw,"retimed":$rt}""")
    println(s"""{"queries":$qs,"errors":$errs,"n_ok":${ok.size},"n_err":${bad.size},"floor_sec":${sec(floor)},"sf":"$sfDir","corpus":"${esc(corpusSig)}","metric":"total","value":${sec(total)},"unit":"sec"}""")
    spark.stop()
  }
}
