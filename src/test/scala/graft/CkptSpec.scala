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
