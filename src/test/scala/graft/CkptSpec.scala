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
    def pinned: Int = spark.sparkContext.getPersistentRDDs.size
    // outside any scope: ckpt blocks stay (library behavior unchanged)
    val keep = spark.range(50).toDF("x").ckpt()
    val base = pinned
    var inside = -1
    val res = Ckpt.releasing {
      val a = spark.range(1000).select(col("id"), (col("id") % 3).as("m")).ckpt()
      val b = a.groupBy("m").count().ckpt()
      inside = pinned
      b.count() // fully materialized before the scope closes
    }
    assert(res == 3L)
    assert(inside >= base + 2, s"ckpts not pinned in scope: $inside vs $base")
    assert(pinned == base,
      s"scope did not release its blocks: $pinned vs $base")
    // the pre-scope checkpoint is untouched and still readable
    assert(keep.count() == 50L)
    // an iterative consumer inside a scope stays green end-to-end
    val comp = Ckpt.releasing {
      graft.ext.Dedup.connectedComponents(
          Seq((1L, 2L), (2L, 3L)).toDF("a_id", "b_id"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    assert(comp == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
    assert(pinned == base, "iterative scope leaked blocks")
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
