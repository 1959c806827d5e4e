package graft.io

import java.nio.file.{Files, Paths}
import java.nio.file.attribute.FileTime

import graft.SparkSpec

class CorpusSigSpec extends SparkSpec {
  import spark.implicits._

  test("summary @mtime suffix is the NUMERICALLY latest table mtime, not the lexicographic max") {
    val dir = Files.createTempDirectory("graft_corpussig").toString
    Seq((0L, "a")).toDF("r_regionkey", "r_name")
      .coalesce(1).write.parquet(s"$dir/region.parquet")
    Seq((0L, "n", 0L)).toDF("n_nationkey", "n_name", "n_regionkey")
      .coalesce(1).write.parquet(s"$dir/nation.parquet")
    // region at an exact second (renders "…00Z"), nation 500 ms later
    // (renders "…00.500Z"): nation is NEWER numerically but sorts BEFORE
    // region as a string ('.' < 'Z') — the ordering bug this spec pins
    val base = java.time.Instant.parse("2026-01-01T00:00:00Z").toEpochMilli
    Files.setLastModifiedTime(Paths.get(s"$dir/region.parquet"),
      FileTime.fromMillis(base))
    Files.setLastModifiedTime(Paths.get(s"$dir/nation.parquet"),
      FileTime.fromMillis(base + 500))
    val newest = java.time.Instant.ofEpochMilli(base + 500).toString
    assert(newest.endsWith(".500Z"), s"fixture rendering drifted: $newest")
    val sig = CorpusSig.summary(spark, dir)
    assert(sig.endsWith(s"@$newest"),
      s"summary '$sig' must carry the numerically-latest mtime $newest")
  }
}
