package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.ops.Recode._

class RecodeSpec extends SparkSpec {
  import spark.implicits._

  private def pad(s: String): String =
    Seq(s).toDF("c").select(zeroPadCode(col("c")).as("p"))
      .collect().head.getString(0)

  test("zeroPadCode pads single-digit front: 1 -> 01") {
    assert(pad("1") == "01")
  }
  test("zeroPadCode pads dotted code: 1.01 -> 01.01") {
    assert(pad("1.01") == "01.01")
  }
  test("zeroPadCode leaves two-digit front alone: 99 -> 99") {
    assert(pad("99") == "99")
  }
  test("zeroPadCode never truncates wide fronts: 123.4 -> 123.4") {
    assert(pad("123.4") == "123.4")
  }
  test("zeroPadCode keeps multi-dot suffix: 1.2.3 -> 01.2.3") {
    assert(pad("1.2.3") == "01.2.3")
  }
  test("zeroPadCodeStr mirrors the column function") {
    for (s <- Seq("1", "1.01", "99", "123.4", "1.2.3", "A.7"))
      assert(zeroPadCodeStr(s) == pad(s), s"mismatch for '$s'")
  }

  test("recode maps known codes and passes unmapped + null through (pandas replace semantics, etl_io.py:151)") {
    val df = Seq(Some("a"), Some("z"), None).toDF("c")
      .select(recode(col("c"), Map("a" -> "Alpha")).as("r"))
    assert(df.collect().map(_.getString(0)).toSeq == Seq("Alpha", "z", null))
  }

  test("recode with empty map is identity") {
    val df = Seq("a", "b").toDF("c").select(recode(col("c"), Map.empty).as("r"))
    assert(df.collect().map(_.getString(0)).toSeq == Seq("a", "b"))
  }

  test("recodeJoin keeps unmapped codes via left join + coalesce") {
    val data = Seq("a", "z").toDF("c")
    val book = Seq(("a", "Alpha")).toDF("code", "label")
    val out = recodeJoin(data, "c", book, "code", "label")
    assert(out.collect().map(_.getString(0)).sorted.toSeq == Seq("Alpha", "z"))
  }

  test("renameAll renames only present columns") {
    val df = Seq((1, "x")).toDF("a", "b")
    val out = renameAll(df, Map("a" -> "A", "missing" -> "M"))
    assert(out.columns.toSeq == Seq("A", "b"))
  }

  test("label2 concatenates with separator (etl_io.py:273-274)") {
    val out = Seq(("Kenya", "AFRICA")).toDF("n", "r")
      .select(label2(col("n"), col("r")).as("l"))
    assert(out.collect().head.getString(0) == "Kenya, AFRICA")
  }

  test("recodeJoin does not fan out rows on a duplicate-code book (max label wins)") {
    val df = Seq((1, "A"), (2, "B")).toDF("id", "c")
    val book = Seq(("A", "old"), ("A", "revised")).toDF("code", "label")
    val out = recodeJoin(df, "c", book, "code", "label")
      .orderBy("id").collect().map(r => (r.getInt(0), r.getString(1)))
    assert(out.toSeq == Seq((1, "revised"), (2, "B")))
  }
}
