package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.ext.TextOps._

class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  test("shingles produces distinct word 3-grams") {
    val out = Seq("a b c d").toDF("t")
      .select(shingles(col("t")).as("s")).head.getSeq[String](0)
    assert(out.toSet == Set("a b c", "b c d"))
  }

  test("shingles of short docs collapses to one shingle") {
    val out = Seq("a b").toDF("t")
      .select(shingles(col("t")).as("s")).head.getSeq[String](0)
    assert(out.toSeq == Seq("a b"))
  }

  test("jaccard is 1 for identical sets, 0 for disjoint") {
    val df = Seq(("a b c d", "a b c d"), ("a b c d", "x y z w")).toDF("t1", "t2")
      .select(jaccard(shingles(col("t1")), shingles(col("t2"))).as("j"))
    val r = df.collect().map(_.getDouble(0))
    assert(r(0) == 1.0 && r(1) == 0.0)
  }

  test("langId picks the language with most marker hits; und when none") {
    val out = Seq(
      "the cat is one of the best and the rest",
      "der hund und die katze ist das beste und der rest",
      "xxx yyy zzz").toDF("t")
      .select(langId(col("t")).as("l")).collect().map(_.getString(0))
    assert(out.toSeq == Seq("en", "de", "und"))
  }

  test("fingerprint is invariant to case and whitespace runs") {
    val out = Seq("Hello  World", "hello world").toDF("t")
      .select(fingerprint(col("t")).as("f")).collect().map(_.getLong(0))
    assert(out(0) == out(1))
  }

  test("qualityColumns computes bounded scores") {
    val out = qualityColumns(Seq("the quick brown fox jumps").toDF("text"), "text")
    val r = out.select("n_tokens", "q_score").head
    assert(r.getLong(0) == 5L)
    assert(r.getDouble(1) >= 0.0 && r.getDouble(1) <= 1.0)
  }

  test("bpeTokenCount splits contractions, words, digits, punctuation") {
    val out = Seq("I'll pay 100 dollars, obviously!").toDF("t")
      .select(bpeTokenCount(col("t")).as("n")).head.getLong(0)
    // I |'ll| pay| 100| dollars|,| obviously|! → 8
    assert(out == 8L)
  }

  test("termFrequencies counts tokens per lang with a min-count floor") {
    val docs = Seq(("en", "a a b"), ("en", "a c")).toDF("lang", "text")
    val tf = termFrequencies(docs, minCount = 2).collect()
      .map(r => (r.getString(1), r.getLong(2))).toMap
    assert(tf == Map("a" -> 3L))
  }
}
