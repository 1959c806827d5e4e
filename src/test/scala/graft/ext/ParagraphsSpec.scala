package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ParagraphsSpec extends SparkSpec {
  import spark.implicits._

  test("explodeParagraphs splits on blank lines, drops empties, keeps order") {
    val df = Seq((1L, "alpha beta\n\ngamma\n\n\n\ndelta")).toDF("doc_id", "text")
    val p = Paragraphs.explodeParagraphs(df, "doc_id", "text")
      .orderBy("para_idx").collect()
    assert(p.map(_.getString(2)).toSeq == Seq("alpha beta", "gamma", "delta"))
    // indices preserve original positions (gaps where empties were dropped
    // are fine — reassembly sorts, it does not require contiguity)
    assert(p.map(_.getInt(1)).toSeq.sorted sameElements p.map(_.getInt(1)).toSeq)
  }

  test("tokenWindowParagraphs windows tokens in order, last window short") {
    val df = Seq((7L, "a b c d e")).toDF("doc_id", "text")
    val p = Paragraphs.tokenWindowParagraphs(df, "doc_id", "text", tokensPerPara = 2)
      .orderBy("para_idx").collect()
    assert(p.map(r => (r.getLong(1), r.getString(2))).toSeq ==
      Seq((0L, "a b"), (1L, "c d"), (2L, "e")))
  }

  test("dropRepeatedParagraphs keeps exactly the first corpus-order occurrence") {
    val paras = Seq(
      (2L, 0L, "dup"), (1L, 5L, "dup"), (1L, 1L, "dup"),
      (3L, 0L, "unique")).toDF("id", "para_idx", "para")
    val kept = Paragraphs.dropRepeatedParagraphs(paras)
      .select("id", "para_idx", "para").as[(Long, Long, String)].collect().toSet
    // first occurrence of "dup" in (id, para_idx) order is (1, 1)
    assert(kept == Set((1L, 1L, "dup"), (3L, 0L, "unique")))
  }

  test("dropBoilerplate removes every occurrence above the doc-frequency cap") {
    val paras = Seq(
      (1L, 0L, "header"), (2L, 0L, "header"), (3L, 0L, "header"),
      (1L, 1L, "body1"), (2L, 1L, "body2")).toDF("id", "para_idx", "para")
    val kept = Paragraphs.dropBoilerplate(paras, maxDocFreq = 2)
      .select("para").as[String].collect().toSet
    assert(kept == Set("body1", "body2"))
  }

  test("boilerplateReport counts distinct docs and total occurrences") {
    val paras = Seq(
      (1L, 0L, "header"), (1L, 3L, "header"), (2L, 0L, "header"),
      (1L, 1L, "solo")).toDF("id", "para_idx", "para")
    val r = Paragraphs.boilerplateReport(paras, minDocs = 2).collect()
    assert(r.length == 1)
    assert(r(0).getString(0) == "header")
    assert(r(0).getLong(1) == 2L) // distinct docs
    assert(r(0).getLong(2) == 3L) // occurrences
  }

  test("reassemble restores paragraph order and drops fully-deduped docs") {
    val paras = Seq(
      (1L, 2L, "third"), (1L, 0L, "first"), (1L, 1L, "second"))
      .toDF("id", "para_idx", "para")
    val r = Paragraphs.reassemble(paras).collect()
    assert(r.length == 1)
    assert(r(0).getString(1) == "first second third")
    assert(r(0).getLong(2) == 3L)
  }

  test("end-to-end: repeated window dropped once, docs reassembled deterministically") {
    val df = Seq(
      (1L, "shared shared boiler plate unique one"),
      (2L, "shared shared boiler plate unique two"),
      (3L, "totally different words here now yes")).toDF("doc_id", "text")
    val cleaned = Paragraphs.reassemble(
      Paragraphs.dropRepeatedParagraphs(
        Paragraphs.tokenWindowParagraphs(df, "doc_id", "text", tokensPerPara = 4)))
      .orderBy("id").collect()
    // doc 1 keeps both windows; doc 2 loses its first window ("shared shared
    // boiler plate", already seen in doc 1) and keeps "unique two"
    assert(cleaned.map(r => (r.getLong(0), r.getString(1))).toSeq == Seq(
      (1L, "shared shared boiler plate unique one"),
      (2L, "unique two"),
      (3L, "totally different words here now yes")))
  }
}
