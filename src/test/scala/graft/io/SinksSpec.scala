package graft.io

import graft.SparkSpec

class SinksSpec extends SparkSpec {
  import spark.implicits._

  test("parquet sink round-trips data exactly") {
    val df = Seq((1L, "a", 1.5), (2L, "b", 2.5)).toDF("id", "k", "v")
    val path = java.nio.file.Files.createTempDirectory("graft_sinks")
      .resolve("t.parquet").toString
    Sinks.parquet(df, path)
    val back = spark.read.parquet(path)
    assert(back.orderBy("id").collect().sameElements(df.orderBy("id").collect()))
  }

  test("partitioned parquet sink prunes by partition column") {
    val df = Seq((1L, "x", 1.0), (2L, "y", 2.0), (3L, "x", 3.0)).toDF("id", "part", "v")
    val path = java.nio.file.Files.createTempDirectory("graft_sinks")
      .resolve("p.parquet").toString
    Sinks.parquet(df, path, partitionCols = Seq("part"))
    assert(new java.io.File(s"$path/part=x").exists())
    val pruned = spark.read.parquet(path).where($"part" === "x")
    assert(pruned.count() == 2)
  }

  test("copyAll copies every catalog table (sf0.001 → temp)") {
    val dest = java.nio.file.Files.createTempDirectory("graft_copy").toString
    val copied = Sinks.copyAll(spark, "/root/testdata/sf0.001", dest)
    assert(copied.nonEmpty)
    val back = spark.read.parquet(s"$dest/region.parquet")
    assert(back.count() == Sources.table(spark, "/root/testdata/sf0.001", "region").count())
  }
}
