package graft.api

import graft.SparkSpec

class RosettaSpec extends SparkSpec {
  import spark.implicits._

  private val data = Seq((1, "d1"), (2, "d2"), (3, "d3")).toDF("code", "payload")

  test("translate joins data through a deduped crosswalk (etl_io.py:936)") {
    val stone = Seq((1, "X"), (1, "X"), (2, "Y")).toDF("code", "out") // dup mapping row
    val out = Rosetta.translate(data, stone, "code", "out")
    assert(out.count() == 2) // dup stone row must NOT fan out
    assert(out.columns.contains("out"))
  }

  test("translate how=left keeps unmatched data rows") {
    val stone = Seq((1, "X")).toDF("code", "out")
    val out = Rosetta.translate(data, stone, "code", "out", how = "left")
    assert(out.count() == 3)
    assert(out.where(out("out").isNull).count() == 2)
  }

  test("translate fans out on genuinely multi-valued mappings") {
    val stone = Seq((1, "X"), (1, "Y")).toDF("code", "out")
    val out = Rosetta.translate(data, stone, "code", "out")
    assert(out.count() == 2) // one data row → two mapping rows
  }

  test("translate explodes list-valued crosswalk cells (etl_io.py:924-934)") {
    val stone = Seq((1, "['X', 'Y']"), (2, "['Z']")).toDF("code", "outs")
    val out = Rosetta.translate(data, stone, "code", "outs", listCols = Set("outs"))
    assert(out.count() == 3)
    assert(out.select("outs").collect().map(_.getString(0)).sorted.toSeq == Seq("X", "Y", "Z"))
  }

  test("translate bridge join reaches a second dataset (etl_io.py:938-939)") {
    val stone = Seq((1, 10), (2, 20)).toDF("code", "target")
    val data2 = Seq((10, "t10"), (20, "t20")).toDF("target", "tname")
    val out = Rosetta.translate(data, stone, "code", "target", data2 = Some(data2))
    assert(out.count() == 2)
    assert(out.columns.contains("tname"))
  }

  test("translate rejects unknown join modes") {
    val stone = Seq((1, "X")).toDF("code", "out")
    intercept[IllegalArgumentException] {
      Rosetta.translate(data, stone, "code", "out", how = "cross")
    }
  }
}
