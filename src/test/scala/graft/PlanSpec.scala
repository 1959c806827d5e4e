package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.SparkPlan
import graft.io.Tables

/** Performance-contract checks: these pin the PLAN properties the 100 TB
  * posture depends on — pushdown reaching the scan, pruned read schemas,
  * rank-limit pushdown, and shuffle-free joins between co-bucketed tables.
  * A regression here is a scale bug even when results stay correct. */
class PlanSpec extends SparkSpec {

  private lazy val t = Tables(spark, "/root/testdata/sf0.001")

  private def physical(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("filter + projection reach the parquet scan (PushedFilters/ReadSchema)") {
    val df = t.lineitem
      .where(col("l_shipdate") >= lit("1995-06-01").cast("timestamp"))
      .select("l_orderkey", "l_linenumber", "l_quantity")
    val scan = df.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("GreaterThanOrEqual(l_shipdate"), s"filter not pushed:\n$scan")
    assert(!scan.contains("l_extendedprice"), s"column pruning failed:\n$scan")
  }

  test("window top-k plans with rank-limit pushdown (WindowGroupLimit)") {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("value").desc)
    val df = t.events.select(col("user_id"), col("value"),
      row_number().over(w).as("rn")).where(col("rn") <= 3)
    assert(physical(df).contains("WindowGroupLimit"), physical(df))
  }

  test("small dims plan as broadcast joins in the awards pipeline") {
    val df = graft.api.Ipeds.awards(t,
      graft.api.GeoFilter(regionNames = Seq("ASIA")), how = "total")
    assert(physical(df).contains("BroadcastHashJoin"), physical(df))
  }

  test("IVF search plans with the native vec_dot codegen kernel, not the interpreted HOF") {
    val e = t.embeddings
    val df = graft.ext.Ivf.ivfTopK(e, e.where(col("vec_id") < 5),
      "vec_id", "embedding", "label", k = 3, nprobe = 2)
    val plan = physical(df)
    assert(plan.contains("vec_dot"), s"native kernel missing from plan:\n$plan")
    // the round-2 perf regression was exactly this: CodegenFallback
    // aggregate(zip_with(...)) per centroid per row
    assert(!plan.contains("aggregate(zip_with"),
      s"interpreted HOF fold crept back into the IVF path:\n$plan")
  }

  test("brute-force top-k plans with native vec_dot and a broadcast query side") {
    val e = t.embeddings
    val df = graft.ext.Similarity.bruteForceTopK(e,
      e.where(col("vec_id") < 5), "vec_id", "embedding", k = 3)
    val plan = physical(df)
    assert(plan.contains("vec_dot"), plan)
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"), plan)
  }

  test("similarity scans plan with fused vec_norm — no sqrt-over-fold third pass") {
    val e = t.embeddings
    val df = graft.ext.Similarity.bruteForceTopK(e,
      e.where(col("vec_id") < 5), "vec_id", "embedding", k = 3)
    val plan = physical(df)
    assert(plan.contains("vec_norm"), s"fused norm missing from plan:\n$plan")
    assert(!plan.contains("SQRT(vec_dot"), s"unfused norm still present:\n$plan")
  }

  test("native vec_norm equals sqrt(HOF dot) bit-for-bit; null element and empty array contracts") {
    import spark.implicits._
    assert(spark.catalog.functionExists("vec_norm"))
    val df = Seq(
      Seq(1.5f, -2.25f, 3.75f), Seq(0.0f, 0.0f, 0.0f), Seq(7.125f))
      .toDF("v")
    val rows = df.select(
      call_function("vec_norm", col("v")).as("n"),
      sqrt(graft.ext.Similarity.dot(col("v"), col("v"))).as("h")).collect()
    rows.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
    // empty array -> 0.0; null element -> NULL
    val edge = spark.sql(
      "SELECT vec_norm(CAST(array() AS ARRAY<DOUBLE>)) AS e, " +
        "vec_norm(array(1.0D, CAST(NULL AS DOUBLE))) AS nn").head
    assert(edge.getDouble(0) == 0.0 && edge.isNullAt(1))
    // regression: the expressions must DECLARE nullable=true — with
    // non-nullable inputs (literals) the default child-derived nullability
    // let collect() read the null slot as 0.0 instead of NULL
    val ragged = spark.sql(
      "SELECT vec_dot(array(1.0D), array(1.0D, 2.0D)) AS d").head
    assert(ragged.isNullAt(0), s"ragged vec_dot on non-nullable inputs: $ragged")
  }

  test("asofJoin nearest computes both frames in ONE Window node over one shuffle") {
    import spark.implicits._
    val l = Seq((1L, 1L, 5L)).toDF("lid", "k", "ts")
    val r = Seq((1L, 3L, 1.0)).toDF("k", "ts", "p")
    val plan = physical(graft.ops.Relational.asofJoin(
      l, r, "k", "ts", Seq("p"), direction = "nearest"))
    // both window frames share partitioning+ordering, so Catalyst must fuse
    // them — a second Window (or Exchange) would double the sort cost
    assert(plan.split("Window").length - 1 == 1, s"expected one Window:\n$plan")
    assert(plan.split("Exchange hashpartitioning").length - 1 == 1,
      s"expected one key shuffle:\n$plan")
  }

  test("directory-partitioned parquet prunes at the scan (PartitionFilters, not data filters)") {
    import spark.implicits._
    val p = java.nio.file.Files.createTempDirectory("graft_prune")
      .resolve("d").toString
    val df = (1 to 100).map(i => (i.toLong, s"cat${i % 4}")).toDF("id", "cat")
    graft.io.Sinks.parquet(df, p, partitionCols = Seq("cat"))
    val rd = spark.read.parquet(p).where(col("cat") === "cat1")
    val scan = rd.queryExecution.executedPlan.collectLeaves().head.toString
    // the predicate must land in PartitionFilters (directory pruning) —
    // as a row-level PushedFilter it would still open every file
    assert(scan.contains("PartitionFilters") && scan.contains("= cat1"),
      s"partition filter missing:\n$scan")
    assert(!scan.replaceAll(".*PushedFilters", "").contains("cat1"),
      s"partition predicate leaked into data filters:\n$scan")
    assert(rd.count() == 25)
  }

  test("packChunks touches one partition only for bucket totals — full data stays hash-partitioned") {
    import spark.implicits._
    val docs = (0 until 2000).map(i => (i.toLong, 1 + i % 50)).toDF("doc_id", "len")
    val plan = physical(graft.ext.Packing.packChunks(
      docs, "doc_id", col("len"), capacity = 256, bucketWidth = 64))
    // exactly ONE SinglePartition exchange (the |corpus|/bucketWidth bucket
    // totals); a second would mean the global-window shape crept back in
    assert(plan.split("Exchange SinglePartition").length - 1 == 1,
      s"expected exactly one single-partition stage:\n$plan")
    // the full-data window is partitioned on the bucket, not global
    assert(plan.contains("Exchange hashpartitioning"), plan)
  }

  test("dq_report scans orders once and lineitem twice — fused expectation passes") {
    // uniqueness + 3 predicate checks ride ONE orders scan; lineitem pays
    // its predicate pass plus the RI join input (n_rows folded into the
    // same scan, not a third count pass). At 100 TB each avoided scan is
    // a full-table read.
    val df = SparkEntry.queries("dq_report")(spark, "/root/testdata/sf0.001")
    val leaves = df.queryExecution.executedPlan.collectLeaves().map(_.toString)
    def scansOf(table: String) = leaves.count(_.contains(s"$table.parquet"))
    assert(scansOf("orders") <= 2, // 1 predicate+unique pass + 1 RI parent-key side
      s"orders scanned ${scansOf("orders")}x:\n${leaves.mkString("\n")}")
    assert(scansOf("lineitem") <= 2, // predicate pass + RI child (n_rows fused)
      s"lineitem scanned ${scansOf("lineitem")}x:\n${leaves.mkString("\n")}")
  }

  test("co-bucketed tables join without a shuffle (Exchange-free)") {
    import graft.io.Sinks
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      import spark.implicits._
      val a = (1 to 1000).map(i => (i.toLong % 50, s"a$i")).toDF("k", "va")
      val b = (1 to 500).map(i => (i.toLong % 50, s"b$i")).toDF("k", "vb")
      Sinks.writeBucketed(a, "bkt_a", "k", 8, sortCol = Some("k"))
      Sinks.writeBucketed(b, "bkt_b", "k", 8, sortCol = Some("k"))
      val joined = spark.table("bkt_a").join(spark.table("bkt_b"), Seq("k"))
      val plan = physical(joined)
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      assert(joined.count() == 1000 * 10) // 20 a-rows x 10 b-rows per key x 50 keys
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS bkt_a")
      spark.sql("DROP TABLE IF EXISTS bkt_b")
    }
  }

  test("staged bucketed edge table feeds an LPA round with NO Exchange on the edge input") {
    import graft.io.Sinks
    import spark.implicits._
    val und = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L)).toDF("a", "b")
    val e0 = und.select(col("a").as("src"), col("b").as("dst"))
      .unionAll(und.select(col("b").as("src"), col("a").as("dst")))
    Sinks.writeBucketed(e0, "bkt_edges_plan", "src", 8, sortCol = Some("src"))
    try {
      def round(e: org.apache.spark.sql.DataFrame): String = {
        val labels = e.select(col("src").as("node")).distinct()
          .select(col("node"), col("node").as("label"))
        physical(e.join(labels, e("src") === labels("node"))
          .groupBy(e("dst").as("node"), col("label"))
          .agg(count(lit(1)).as("n")))
      }
      val bucketed = round(spark.table("bkt_edges_plan"))
      val plain = round(e0)
      // the bucketed scan is consumed AS bucketed...
      assert(bucketed.contains("Bucketed: true"),
        s"edge scan not reading the bucket layout:\n$bucketed")
      // ...and the round pays strictly fewer shuffles than the plain edge
      // frame — the edge-side Exchange is gone (only the label side and
      // the message combine remain)
      def nEx(p: String): Int = p.sliding("Exchange hashpartitioning".length)
        .count(_ == "Exchange hashpartitioning")
      assert(nEx(bucketed) < nEx(plain),
        s"bucketed round did not remove the edge-side Exchange:" +
          s"\nbucketed ${nEx(bucketed)} vs plain ${nEx(plain)}\n$bucketed")
    } finally spark.sql("DROP TABLE IF EXISTS bkt_edges_plan")
  }

  test("trainOrder never single-partition-sorts the data — only the 256-row offset table") {
    val df = graft.ext.Sampling.trainOrder(t.documents, "doc_id")
    val plan = physical(df)
    // the data-side window partitions by the hash-prefix shard; a global
    // Window (empty partition spec over the full table) would appear as a
    // SinglePartition exchange feeding a Sort over the document rows
    assert(plan.contains("hashpartitioning(__shard"),
      s"per-shard window lost its shard partitioning:\n$plan")
    assert(plan.contains("BroadcastExchange"),
      s"shard offsets must broadcast, not shuffle the data side:\n$plan")
  }

  test("rollingActive broadcasts the observed-day dimension (semi join, no shuffle of contributions)") {
    val df = graft.ext.Retention.rollingActive(t.events, "user_id", "ts", 7)
    val plan = physical(df)
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftSemi"),
      s"observed-day filter should be a broadcast semi join:\n$plan")
  }

  test("winsorize and zscoreOutliers broadcast group stats back to the fact table") {
    val w = graft.ops.Clean.winsorize(t.lineitem, "l_extendedprice",
      "l_returnflag")
    assert(physical(w).contains("BroadcastHashJoin"), physical(w))
    val z = graft.ops.Clean.zscoreOutliers(t.events, "value", "event_type",
      Seq("event_id"), 3.0)
    assert(physical(z).contains("BroadcastHashJoin"), physical(z))
  }

  test("paragraph dedup never windows over the paragraph hash (boilerplate IS the skewed key)") {
    val paras = graft.ext.Paragraphs.explodeParagraphs(
      t.documents.withColumn("text",
        regexp_replace(col("text"), " the ", "\n\n")), "doc_id", "text")
    // keep-first: aggregate + semi join whose equi keys include (id, idx) —
    // a hot paragraph scatters; a WindowExec would buffer it in one task
    val dedup = graft.ext.Paragraphs.dropRepeatedParagraphs(paras)
    assert(!physical(dedup).contains("Window"),
      s"keep-first regressed to a window over the hash:\n${physical(dedup)}")
    assert(physical(dedup).contains("LeftSemi"), physical(dedup))
    // boilerplate cap: doc-frequency aggregate + ANTI join on the small
    // offending-hash set
    val bp = graft.ext.Paragraphs.dropBoilerplate(paras, maxDocFreq = 2)
    assert(!physical(bp).contains("Window"),
      s"boilerplate filter regressed to a window:\n${physical(bp)}")
    assert(physical(bp).contains("LeftAnti"), physical(bp))
  }

  test("searchPhrase prunes postings to the query terms before any shuffle") {
    val df = graft.ext.TextOps.searchPhrase(t.documents,
      Seq("table", "hash"), k = 5)
    val plan = df.queryExecution.executedPlan.toString
    // the IN-list must sit under the first Generate/explode output — i.e.
    // the filter appears, and the final top-k is a TakeOrderedAndProject
    assert(plan.contains("token#") && plan.contains("TakeOrderedAndProject"),
      plan)
    assert(plan.contains("INSET") || plan.contains(" IN "),
      s"token IN-list prune missing:\n$plan")
  }

  test("incrementalNearDedup cross-candidate join is equality-keyed — never a cross product") {
    import graft.ext.Dedup
    val d = t.documents
    val bBands = Dedup.minhashBands(d.where(col("doc_id") % 2 === 1),
      "doc_id", "text")
    val cBands = Dedup.minhashBands(d.where(col("doc_id") % 2 === 0),
      "doc_id", "text")
    val cands = Dedup.crossBandCandidates(bBands,
      Dedup.corpusBandSide(cBands, maxBucket = 10000))
    val plan = cands.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"cross-frame candidate join degenerated to an all-pairs plan:\n$plan")
    assert(plan.contains("band_hash"), plan)
  }

  test("AQE skew-join split fires on a skewed join key") {
    // j_salted proves MANUAL salting; this pins the OTHER half of the skew
    // story: AQE's runtime skew handling splits an oversized shuffle
    // partition on its own, so an unsalted join over a hot key does not
    // serialize into one straggler task. Thresholds are scaled down to
    // fire on test-sized data (the mechanism, not the defaults, is under
    // test); broadcast is disabled so the join actually shuffles.
    val ss = spark.newSession()
    ss.conf.set("spark.sql.adaptive.enabled", "true")
    ss.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    ss.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
    ss.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "100k")
    ss.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "50k")
    ss.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    ss.conf.set("spark.sql.shuffle.partitions", "8")
    // hot key 0 carries 100k rows; keys 1..40 carry ~50 each
    val left = ss.range(0, 100000)
      .select(lit(0L).as("k"), col("id").as("payload"))
      .union(ss.range(0, 2000)
        .select((col("id") % 40 + 1).as("k"), col("id").as("payload")))
    val right = ss.range(0, 41).select(col("id").as("k"), (col("id") * 10).as("v"))
    val joined = left.join(right, "k")
    // drive THIS frame's own QueryExecution (count() would plan a separate
    // one and leave joined's AdaptiveSparkPlan unexecuted)
    assert(joined.collect().length == 102000)
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("isFinalPlan=true"), plan)
    assert(plan.contains("skew=true"),
      s"AQE skew-join split did not fire:\n$plan")
  }

  test("persisted-index incremental near-dedup never scans corpus text") {
    import spark.implicits._
    import graft.ext.Dedup
    // corpus text lives ONLY at this path — any appearance of it in a plan
    // means the operator re-read the standing corpus, the exact cost the
    // persisted index exists to avoid at 100 TB
    val base = java.nio.file.Files.createTempDirectory("graft_neardup_idx").toString
    val corpusDocs = Seq(
      (0L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "completely different corpus text about other things entirely"),
      (4L, "a third standing document with its own unique content here")
    ).toDF("doc_id", "text")
    corpusDocs.write.parquet(s"$base/corpus_docs.parquet")
    val (bands, sets) = Dedup.corpusNearDupIndex(
      spark.read.parquet(s"$base/corpus_docs.parquet"), "doc_id", "text")
    graft.io.Sinks.parquet(bands, s"$base/corpus_bands.parquet")
    graft.io.Sinks.parquet(sets, s"$base/corpus_shingles.parquet")
    val idxBands = spark.read.parquet(s"$base/corpus_bands.parquet")
    val idxSets = spark.read.parquet(s"$base/corpus_shingles.parquet")
    val batch = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),    // corpus near-dup
      (3L, "an entirely fresh batch document nothing resembles")    // fresh
    ).toDF("doc_id", "text")

    // candidate generation: the cross-band join must read the PERSISTED
    // band table, not corpus text
    val candPlan = Dedup.crossBandCandidates(
      Dedup.minhashBands(batch, "doc_id", "text"),
      Dedup.corpusBandSide(idxBands, maxBucket = 10000))
      .queryExecution.executedPlan.toString
    assert(candPlan.contains("corpus_bands"), candPlan)
    assert(!candPlan.contains("corpus_docs"),
      s"candidate generation re-scanned corpus text:\n$candPlan")

    // full operator: corpus TEXT must appear nowhere. Since round 10 the
    // cross-verify hit list eagerly localCheckpoints inside the operator
    // (so the shared batch shingle cache can release before the caller
    // materializes), which means the corpus_shingles scan runs at
    // checkpoint time and the FINAL plan shows the checkpointed RDD —
    // assert the shingle read on the verify stage directly instead.
    val verifyPlan = Dedup.crossBandCandidates(
        Dedup.minhashBands(batch, "doc_id", "text"),
        Dedup.corpusBandSide(idxBands, maxBucket = 10000))
      .join(idxSets.select(col("id").as("c_id"), col("sh").as("c_sh")),
        Seq("c_id"))
      .queryExecution.executedPlan.toString
    assert(verifyPlan.contains("corpus_shingles"), verifyPlan)
    val kept = Dedup.incrementalNearDedupPersisted(
      idxBands, idxSets, batch, "doc_id", "text", threshold = 0.7)
    val plan = kept.queryExecution.executedPlan.toString
    assert(!plan.contains("corpus_docs"),
      s"verification re-scanned corpus text:\n$plan")

    // and the persisted path computes exactly what the raw-frame path does
    val keptIds = kept.select("doc_id").as[Long].collect().sorted.toSeq
    val rawIds = Dedup.incrementalNearDedup(
        spark.read.parquet(s"$base/corpus_docs.parquet"), batch,
        "doc_id", "text", threshold = 0.7)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(keptIds == rawIds, s"persisted=$keptIds raw=$rawIds")
    assert(keptIds == Seq(3L), s"expected only the fresh doc: $keptIds")

    // incremental CLOSURE maintenance over the same artifacts: the delta
    // pair list reads the persisted index, the base labels read persisted
    // parquet, and corpus TEXT appears nowhere in the delta plan — the
    // standing corpus is never re-scanned and its closure never re-run
    val baseLabels = Dedup.connectedComponents(
      Seq((0L, 4L)).toDF("a_id", "b_id"))
    graft.io.Sinks.parquet(baseLabels, s"$base/base_components.parquet")
    val deltaPairs = Dedup.incrementalNearDupPairs(
      idxBands, idxSets, batch, "doc_id", "text", threshold = 0.7)
    val labels = Dedup.incrementalComponents(
      spark.read.parquet(s"$base/base_components.parquet"),
      batch.select(col("doc_id")), deltaPairs)
    val labelPlan = labels.queryExecution.executedPlan.toString
    assert(labelPlan.contains("base_components"), labelPlan)
    assert(!labelPlan.contains("corpus_docs"),
      s"incremental closure re-scanned corpus text:\n$labelPlan")
    // the O(corpus) label store is SCANNED (broadcast relabel), never
    // shuffled: everything delta-sized broadcasts, so no sort-merge join
    // may appear anywhere in the incremental label plan
    assert(!labelPlan.contains("SortMergeJoin"),
      s"label store was shuffled:\n$labelPlan")
    // and the labels are the full-recompute answer: doc 1 duplicates
    // corpus doc 0 (already grouped with 4), doc 3 is fresh
    val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(0L -> 0L, 4L -> 0L, 1L -> 0L, 3L -> 3L), s"$got")
  }

  test("feature encoders broadcast their stats — the fact table never sort-merge-joins") {
    val te = graft.ext.Features.targetEncodeLoo(t.orders,
      "o_orderkey", "o_orderpriority", "o_totalprice")
    assert(physical(te).contains("BroadcastHashJoin") &&
      !physical(te).contains("SortMergeJoin"), physical(te))
    val st = graft.ext.Features.standardize(t.lineitem,
      Seq("l_orderkey", "l_linenumber"), "l_returnflag", "l_extendedprice")
    assert(physical(st).contains("BroadcastHashJoin") &&
      !physical(st).contains("SortMergeJoin"), physical(st))
    val qb = graft.ext.Features.quantileBin(t.lineitem, "l_extendedprice",
      "l_returnflag", Seq("l_orderkey", "l_linenumber"), 4)
    assert(physical(qb).contains("BroadcastHashJoin") &&
      !physical(qb).contains("SortMergeJoin"), physical(qb))
    val tr = graft.ext.Funnel.transitions(t.events,
      "user_id", "ts", Seq("event_id"), "event_type")
    assert(physical(tr).contains("BroadcastHashJoin"), physical(tr))
  }

  test("TPC-H Q5 six-way join: dims broadcast, no cartesian, filters pushed") {
    val q5 = graft.SparkEntry.queries("tpch_q5")(spark, "/root/testdata/sf0.001")
    val plan = physical(q5)
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    val scans = q5.queryExecution.executedPlan.collectLeaves().map(_.toString)
    assert(scans.exists(s => s.contains("o_orderdate") &&
      s.contains("GreaterThanOrEqual(o_orderdate")),
      s"date range not pushed to the orders scan:\n${scans.mkString("\n")}")
    assert(scans.exists(_.contains("EqualTo(r_name,ASIA)")),
      s"region filter not pushed:\n${scans.mkString("\n")}")
  }

  test("dynamic partition pruning fires on a partitioned fact × filtered dim join") {
    // the 100 TB lever for star joins over partitioned lakes: the dim
    // filter must reach the FACT SCAN as a runtime partition filter, so
    // only matching partitions are listed/read — not post-scan filtered
    val dir = java.nio.file.Files.createTempDirectory("graft_dpp").toString
    t.lineitem.select(col("l_orderkey"), col("l_quantity"), col("l_returnflag"))
      .write.mode("overwrite").partitionBy("l_returnflag")
      .parquet(s"$dir/fact")
    spark.createDataFrame(Seq(("R", "keep"), ("A", "drop")))
      .toDF("flag", "tag")
      .write.mode("overwrite").parquet(s"$dir/dim")
    val q = spark.read.parquet(s"$dir/fact")
      .join(spark.read.parquet(s"$dir/dim").where(col("tag") === "keep"),
        col("l_returnflag") === col("flag"))
    val plan = physical(q)
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"no dynamic partition pruning in:\n$plan")
  }

  test("persisted postings scan prunes to the queried terms (IN-list pushed)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_idx").toString
    graft.io.Sinks.parquet(
      graft.ext.TextOps.invertedIndex(t.documents),
      s"$dir/postings.parquet")
    val q = graft.ext.TextOps.searchAnd(
      spark.read.parquet(s"$dir/postings.parquet"),
      Seq("spark", "merge"), k = 5)
    val scan = q.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("In(token"),
      s"term IN-list not pushed to the postings scan:\n$scan")
  }

  test("CMS estimate broadcasts the constant-size sketch — never a shuffle of keys, never a cartesian") {
    val df = graft.ext.CountMin.estimateVsTruth(t.events, "user_id",
      width = 512, depth = 4)
    val plan = physical(df)
    // the sketch side is depth*width counters — it must arrive broadcast
    assert(plan.contains("BroadcastHashJoin"),
      s"sketch lookup not broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"), plan)
    // estimates are one partial-aggregable min per key — no window
    assert(!plan.contains("WindowExec") && !plan.contains("Window "), plan)
  }

  test("Fellegi-Sunter candidate pairs come from a block-key EQUALITY join, never all-pairs") {
    val p = t.part.select(col("p_partkey"), col("p_brand"), col("p_size"),
      col("p_type"),
      element_at(split(col("p_name"), " "), 1).as("tok1"),
      element_at(split(col("p_name"), " "), 2).as("tok2"))
    val pairs = graft.ext.Linkage.selfLinkPairs(p, "p_partkey",
      concat(col("p_brand"), lit("|"), col("p_size").cast("string")),
      Seq(graft.ext.Linkage.FieldSpec("p_type", 0.95, 0.02),
        graft.ext.Linkage.FieldSpec("tok1", 0.90, 0.05)),
      threshold = 5.0)
    val plan = physical(pairs)
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"blocking degraded to an all-pairs join:\n$plan")
    // part scan is pruned to the fields the linkage reads (no p_comment,
    // no p_retailprice)
    val scans = pairs.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).filter(_.contains("part.parquet"))
    assert(scans.nonEmpty && scans.forall(s =>
      !s.contains("p_comment") && !s.contains("p_retailprice")),
      s"part scan not pruned:\n${scans.mkString("\n")}")
  }

  test("mountBucketed re-registers existing bucketed files — scan is still Bucketed, rows intact, no rewrite") {
    import graft.io.Sinks
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_mount").toString
    val df = (1 to 300).map(i => (i.toLong % 40, i.toLong)).toDF("k", "v")
    Sinks.writeBucketed(df, "bkt_mount_src", "k", 8, sortCol = Some("k"),
      path = Some(s"$dir/files"))
    spark.sql("DROP TABLE IF EXISTS bkt_mount_src") // external: files stay
    try {
      val before = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
        .filter(p => p.toString.endsWith(".parquet")).count()
      Sinks.mountBucketed(spark, "bkt_mounted",
        spark.read.parquet(s"$dir/files").schema,
        "k", 8, Some("k"), s"$dir/files")
      val after = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
        .filter(p => p.toString.endsWith(".parquet")).count()
      assert(before == after, "mount rewrote data files")
      val mounted = spark.table("bkt_mounted")
      assert(mounted.count() == 300)
      // the mounted catalog entry restores the bucket metadata: a
      // groupBy on the bucket column consumes the layout with no
      // Exchange before the aggregate's final pass
      val plan = physical(mounted.groupBy("k").agg(sum("v")))
      assert(plan.contains("Bucketed: true"),
        s"mounted table not read as bucketed:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning"),
        s"mounted bucketed agg still shuffles:\n$plan")
    } finally spark.sql("DROP TABLE IF EXISTS bkt_mounted")
  }

  test("staged bucketed purchase edges feed a pagerank round with NO Exchange on the edge input") {
    // the rank-family twin of the LPA staged-layout pin (round 13): an
    // outdeg-annotated bidirected edge table bucketed by src satisfies
    // the power-iteration src-join with no shuffle on the O(E) side
    import graft.io.Sinks
    import spark.implicits._
    val und = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L)).toDF("a", "b")
    val e0 = und.select(col("a").as("src"), col("b").as("dst"))
      .unionAll(und.select(col("b").as("src"), col("a").as("dst")))
    val withDeg = e0.join(
      e0.groupBy("src").agg(count(lit(1)).cast("double").as("outdeg")),
      Seq("src"))
    Sinks.writeBucketed(withDeg, "bkt_rank_edges_plan", "src", 8,
      sortCol = Some("src"))
    try {
      def round(e: org.apache.spark.sql.DataFrame): String = {
        val ranks = e.select(col("src").as("node")).distinct()
          .select(col("node"), lit(0.25).as("rank"))
        physical(e.join(ranks, e("src") === ranks("node"))
          .groupBy(e("dst").as("node"))
          .agg(sum(col("rank") / col("outdeg")).as("cin")))
      }
      val bucketed = round(spark.table("bkt_rank_edges_plan"))
      val plain = round(withDeg)
      assert(bucketed.contains("Bucketed: true"),
        s"edge scan not reading the bucket layout:\n$bucketed")
      def nEx(p: String): Int = p.sliding("Exchange hashpartitioning".length)
        .count(_ == "Exchange hashpartitioning")
      assert(nEx(bucketed) < nEx(plain),
        s"bucketed rank round did not remove the edge-side Exchange:" +
          s"\nbucketed ${nEx(bucketed)} vs plain ${nEx(plain)}\n$bucketed")
    } finally spark.sql("DROP TABLE IF EXISTS bkt_rank_edges_plan")
  }

  test("staged twin-orientation HITS edges feed BOTH half-rounds with NO Exchange on the edge input") {
    // HITS alternates an authority half-round joining edges on src with
    // a hub half-round joining on dst — one bucket layout cannot serve
    // both, the staged twin layouts (by src AND by dst) must (round-14
    // demand: graph_hits was the last per-run edge derivation)
    import graft.io.Sinks
    import spark.implicits._
    val e = Seq((1L, 10L), (1L, 11L), (2L, 10L), (3L, 12L))
      .toDF("src", "dst")
    Sinks.writeBucketed(e, "bkt_hits_src_plan", "src", 8,
      sortCol = Some("src"))
    Sinks.writeBucketed(e, "bkt_hits_dst_plan", "dst", 8,
      sortCol = Some("dst"))
    // force the sort-merge regime (the O(V)-score-frame shape at real
    // scale) — with a broadcastable score side the edge layout is moot
    val bcThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val scores = e.select(col("src").as("node")).distinct()
        .select(col("node"), lit(1.0).as("h"))
      def aRound(ed: org.apache.spark.sql.DataFrame): String =
        physical(ed.join(scores, ed("src") === scores("node"))
          .groupBy(ed("dst").as("node")).agg(sum(col("h")).as("a")))
      def hRound(ed: org.apache.spark.sql.DataFrame): String = {
        val a = ed.select(col("dst").as("node")).distinct()
          .select(col("node"), lit(1.0).as("a"))
        physical(ed.join(a, ed("dst") === a("node"))
          .groupBy(ed("src").as("node")).agg(sum(col("a")).as("h")))
      }
      // the edge-side shuffle is the one keyed on the edge JOIN column
      // (src for the authority round, dst for the hub round) — the score
      // side and the post-join aggregate legitimately keep theirs
      val aB = aRound(spark.table("bkt_hits_src_plan"))
      val hB = hRound(spark.table("bkt_hits_dst_plan"))
      assert(aB.contains("Bucketed: true") && hB.contains("Bucketed: true"),
        s"HITS edge scans not reading the bucket layouts:\n$aB\n$hB")
      assert(aRound(e).contains("Exchange hashpartitioning(src#"),
        "fixture drift: plain authority round no longer shuffles edges")
      assert(!aB.contains("Exchange hashpartitioning(src#"),
        s"authority round kept an edge-side Exchange:\n$aB")
      assert(hRound(e).contains("Exchange hashpartitioning(dst#"),
        "fixture drift: plain hub round no longer shuffles edges")
      assert(!hB.contains("Exchange hashpartitioning(dst#"),
        s"hub round kept an edge-side Exchange:\n$hB")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcThresh)
      spark.sql("DROP TABLE IF EXISTS bkt_hits_src_plan")
      spark.sql("DROP TABLE IF EXISTS bkt_hits_dst_plan")
    }
  }

  test("er_fs_em derives its blocked candidates ONCE — scoring reads the checkpoint, never a re-join of part") {
    // round-13 demand: the EM fit and the final scoring share one
    // candidate pass; the returned (scored) plan must read the
    // checkpointed pair frame, with NO part.parquet scan left anywhere
    val df = SparkEntry.queries("er_fs_em")(spark, "/root/testdata/sf0.001")
    val leaves = df.queryExecution.executedPlan.collectLeaves().map(_.toString)
    assert(!leaves.exists(_.contains("part.parquet")),
      s"scored plan re-derives the blocked join from part:\n" +
        leaves.mkString("\n"))
    assert(leaves.exists(l => l.contains("ExistingRDD") || l.contains("LogicalRDD")),
      s"scored plan does not read a checkpointed candidate frame:\n" +
        leaves.mkString("\n"))
  }

  test("persisted ANN search reads the staged index — embeddings are never re-clustered or re-encoded") {
    // IVF read path: corpus side AND query side come from the staged cell
    // table, centroids from the staged k-row table — embeddings.parquet
    // must appear NOWHERE in the plan (re-reading it means the index was
    // re-derived, the per-run training cost the artifact exists to remove)
    val ivf = SparkEntry.queries("topk_sim_ivf_persisted")(
      spark, "/root/testdata/sf0.001")
    // leaf paths truncate in the InMemoryFileIndex display — match the
    // stage-dir name and the read schema, not the full file path
    val ivfLeaves = ivf.queryExecution.executedPlan.collectLeaves()
      .map(_.toString)
    assert(ivfLeaves.exists(l => l.contains("graft_stagefam_annidx") &&
      l.contains("cell:int")),
      s"IVF search not reading the staged cells:\n${ivfLeaves.mkString("\n")}")
    assert(!ivfLeaves.exists(_.contains("embeddings.parquet")),
      s"persisted IVF re-scanned the embeddings table:\n${ivfLeaves.mkString("\n")}")
    // PQ read path: the corpus-sized side is the staged codes table only;
    // embeddings.parquet may appear ONLY as the bounded query side, with
    // the vec_id < 20 filter pushed to its scan
    val pq = SparkEntry.queries("topk_sim_pq_persisted")(
      spark, "/root/testdata/sf0.001")
    val pqLeaves = pq.queryExecution.executedPlan.collectLeaves()
      .map(_.toString)
    assert(pqLeaves.exists(l => l.contains("graft_stagefam_annidx") &&
      l.contains("codes:array<int>")),
      s"PQ search not reading the staged codes:\n${pqLeaves.mkString("\n")}")
    val embScans = pqLeaves.filter(_.contains("embeddings.parquet"))
    assert(embScans.forall(_.contains("LessThan(vec_id,20)")),
      s"embeddings scan without the pushed query filter:\n${embScans.mkString("\n")}")
  }

  test("personalized pagerank evaluates from the checkpointed O(V) frame — no corpus re-scan, 1-row stat broadcast") {
    val e0 = t.orders
      .join(t.lineitem, col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("src"),
        (col("l_suppkey") * 2 + 1).as("dst"))
      .distinct().localCheckpoint()
    val seeds = t.customer.where(col("c_nationkey") === 0)
      .select((col("c_custkey") * 2).as("node"))
    val pr = graft.ext.Graph.personalizedPagerank(
      e0.union(e0.select(col("dst").as("src"), col("src").as("dst"))),
      seeds, iters = 2)
    val nv = pr.agg(count(lit(1)).cast("double").as("nv"))
    val out = pr.crossJoin(broadcast(nv))
      .select(col("node"), round(col("rank") * col("nv"), 6).as("rank_rel"))
    val plan = physical(out)
    // the rank frame is interval-checkpointed: the consumer plan reads
    // the truncated RDD, never re-joining orders x lineitem per consumer
    assert(!plan.contains("orders.parquet") &&
      !plan.contains("lineitem.parquet"),
      s"rank consumer re-derives the corpus:\n$plan")
    // the 1-row normalization stat arrives broadcast (the only nested-loop)
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastExchange"), plan)
  }
}
