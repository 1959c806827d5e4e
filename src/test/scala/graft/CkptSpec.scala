package graft

import org.apache.spark.sql.functions._

class CkptSpec extends SparkSpec {
  import spark.implicits._
  import graft.Ckpt.CkptOps

  test("default mode truncates via localCheckpoint: same rows, checkpointed plan") {
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "k")
    assert(spark.conf.getOption("graft.checkpoint.reliable").isEmpty)
    val out = df.ckpt()
    assert(out.collect().map(r => (r.getLong(0), r.getString(1))).toSet ==
      Set((1L, "a"), (2L, "b")))
    assert(out.queryExecution.optimizedPlan.toString.contains("LogicalRDD"))
  }

  test("reliable mode writes through the checkpoint dir and returns identical rows") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt_spec")
    spark.conf.set("graft.checkpoint.reliable", "true")
    spark.conf.set("graft.checkpoint.dir", dir.toString)
    try {
      val df = spark.range(100).select(col("id"), (col("id") % 7).as("m"))
      val out = df.ckpt()
      // same result either mode — the switch is a storage decision only
      assert(out.agg(sum("m")).head.getLong(0) ==
        df.agg(sum("m")).head.getLong(0))
      // and the reliable path actually landed blocks in the dir
      // (getCheckpointDir returns a file: URI, not a bare path)
      assert(spark.sparkContext.getCheckpointDir.isDefined)
      val wrote = java.nio.file.Files.walk(java.nio.file.Paths.get(
          java.net.URI.create(spark.sparkContext.getCheckpointDir.get)))
        .count() > 1
      assert(wrote, "reliable checkpoint wrote nothing")
    } finally {
      spark.conf.unset("graft.checkpoint.reliable")
      spark.conf.unset("graft.checkpoint.dir")
    }
  }

  test("releasing scope drops the blocks its truncations pinned; outer work survives") {
    // Assert on the scope's OWN tracked RDDs, never on a global
    // getPersistentRDDs.size delta — the async ContextCleaner can drop
    // *earlier tests'* RDDs between two global reads (the round-12 flake).
    import org.apache.spark.storage.StorageLevel
    // outside any scope: ckpt blocks stay (library behavior unchanged)
    val keep = spark.range(50).toDF("x").ckpt()
    var pinnedInside = Seq.empty[org.apache.spark.storage.StorageLevel]
    val (res, tracked) = Ckpt.releasingTracked {
      val a = spark.range(1000).select(col("id"), (col("id") % 3).as("m")).ckpt()
      val b = a.groupBy("m").count().ckpt()
      pinnedInside =
        Seq(a, b).flatMap(_.queryExecution.analyzed.collect {
          case lr: org.apache.spark.sql.execution.LogicalRDD =>
            lr.rdd.getStorageLevel
        })
      b.count() // fully materialized before the scope closes
    }
    assert(res == 3L)
    assert(tracked.size >= 2, s"scope tracked ${tracked.size} truncations")
    assert(pinnedInside.size >= 2 &&
      pinnedInside.forall(_ != StorageLevel.NONE),
      s"ckpts not pinned in scope: $pinnedInside")
    assert(tracked.forall(_.getStorageLevel == StorageLevel.NONE),
      s"scope did not release its blocks: " +
        tracked.map(r => r.id -> r.getStorageLevel).mkString(", "))
    // the pre-scope checkpoint is untouched and still readable
    assert(keep.count() == 50L)
    // an iterative consumer inside a scope stays green end-to-end and
    // releases everything it truncated
    val (comp, tracked2) = Ckpt.releasingTracked {
      graft.ext.Dedup.connectedComponents(
          Seq((1L, 2L), (2L, 3L)).toDF("a_id", "b_id"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    assert(comp == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
    assert(tracked2.forall(_.getStorageLevel == StorageLevel.NONE),
      "iterative scope leaked blocks")
  }

  test("scope removal is by identity: closing one scope cannot pop a sibling's") {
    // two interleaved empty scopes are structurally == but not eq; a
    // structural remove would pop the wrong one (the ADVICE latent bug)
    val outerBuf = Ckpt.releasingTracked {
      val (_, inner) = Ckpt.releasingTracked { 42 }
      assert(inner.isEmpty)
      // after the inner (empty) scope closed, a truncation here must
      // still be attributed to THIS scope — i.e. the inner close removed
      // its own buffer, not ours
      spark.range(10).toDF("y").ckpt().count()
    }._2
    assert(outerBuf.size == 1,
      s"outer scope lost its buffer to a structural remove: $outerBuf")
  }

  test("an iterative consumer (connectedComponents) is green in reliable mode") {
    spark.conf.set("graft.checkpoint.reliable", "true")
    try {
      val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("a_id", "b_id")
      val comp = graft.ext.Dedup.connectedComponents(pairs)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(comp == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
    } finally spark.conf.unset("graft.checkpoint.reliable")
  }
}
