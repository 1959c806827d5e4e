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

  test("winnowFingerprints: shared substrings >= k+w-1 guarantee a shared fp; disjoint texts share none") {
    val df = Seq(
      (1L, "the common payload segment is right here inside this document"),
      (2L, "totally other text but the common payload segment is right here too"),
      (3L, "zzz qqq xxx vvv www uuu yyy ttt rrr")).toDF("doc_id", "text")
    val fps = winnowFingerprints(df, "doc_id", "text", k = 5, w = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert((fps(1L) & fps(2L)).nonEmpty, "long shared substring must share a fingerprint")
    assert((fps(1L) & fps(3L)).isEmpty, "unrelated texts should not collide")
    // identical inputs -> identical fingerprint sets (deterministic)
    val again = winnowFingerprints(df, "doc_id", "text", k = 5, w = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(again == fps.toSeq.flatMap { case (id, s) => s.map(id -> _) }.toSet)
    // far fewer fingerprints than grams (the point of winnowing)
    assert(fps(1L).size < 62 - 4)
  }

  test("winnowOverlapPairs: property — docs planted with a >= k+w-1 shared substring are ALWAYS paired") {
    val k = 5; val w = 4
    val rnd = new scala.util.Random(11)
    def randText(n: Int) = Seq.fill(n)(('a' + rnd.nextInt(26)).toChar).mkString
    for (trial <- 1 to 3) {
      val shared = randText(k + w - 1) // minimum guaranteed-detectable overlap
      val docs = Seq(
        (1L, randText(40) + shared + randText(40)),
        (2L, randText(35) + shared + randText(45)),
        (3L, randText(90))).toDF("doc_id", "text")
      val pairs = winnowOverlapPairs(docs, "doc_id", "text", k, w,
          minShared = 1, maxDf = 100)
        .select("a_id", "b_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairs.contains((1L, 2L)), s"trial $trial: guarantee violated")
    }
    // and overlap counts rank a full duplicate above a partial overlap
    val base = randText(120)
    val docs2 = Seq((1L, base), (2L, base),
      (3L, base.take(30) + randText(90))).toDF("doc_id", "text")
    val n = winnowOverlapPairs(docs2, "doc_id", "text", k, w,
        minShared = 1, maxDf = 100)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(n((1L, 2L)) > n.getOrElse((1L, 3L), 0L))
  }

  test("ngramTokens keeps multiplicity and order; short docs yield none") {
    val out = Seq("a b a b c", "x").toDF("t")
      .select(ngramTokens(col("t"), 2).as("g"))
      .collect().map(_.getSeq[String](0))
    assert(out(0) == Seq("a b", "b a", "a b", "b c")) // "a b" twice — no dedup
    assert(out(1) == Seq.empty)
  }

  test("hashBucket is stable, in-range, and content-determined") {
    val df = Seq("alpha", "beta", "alpha").toDF("t")
      .select(col("t"), hashBucket(col("t"), 10).as("b"))
    val rows = df.collect().map(r => (r.getString(0), r.getLong(1)))
    assert(rows.forall { case (_, b) => b >= 0 && b < 10 })
    assert(rows(0)._2 == rows(2)._2) // same content, same bucket
    // repartitioning cannot move a bucket (pure content function)
    val again = Seq("alpha").toDF("t").repartition(3)
      .select(hashBucket(col("t"), 10)).head.getLong(0)
    assert(again == rows(0)._2)
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

  test("crossEntropyScores: common transitions score lower than rare ones; short docs drop") {
    val docs = Seq(
      (1L, "en", "a b a b a b"),
      (2L, "en", "a b a b"),
      (3L, "en", "x q"),   // transition seen once in the corpus
      (4L, "en", "solo")   // no bigrams → absent from output
    ).toDF("doc_id", "lang", "text")
    val out = crossEntropyScores(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(out.keySet == Set(1L, 2L, 3L))
    assert(out(1L)._1 == 5 && out(2L)._1 == 3 && out(3L)._1 == 1)
    // docs made of the corpus's dominant transitions beat the one-off
    assert(out(1L)._2 < out(3L)._2 && out(2L)._2 < out(3L)._2)
  }

  test("chunkDocs: sliding windows step by stride; redundant tails drop; short docs emit one chunk") {
    val docs = Seq(
      (1L, (1 to 10).map(i => s"t$i").mkString(" ")), // 10 tokens
      (2L, "a b c")                                   // shorter than a chunk
    ).toDF("doc_id", "text")
    val out = chunkDocs(docs, chunkTokens = 6, stride = 4).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getString(4)))
    // doc 1: starts 0 and 4; start 8 would cover tokens 9..10, already
    // inside the start-4 window (5..10) -> dropped
    val d1 = out.filter(_._1 == 1L).sortBy(_._2)
    assert(d1.map(_._2).toSeq == Seq(0L, 4L))
    assert(d1.map(_._3).toSeq == Seq(6L, 6L))
    assert(d1.head._4 == "t1 t2 t3 t4 t5 t6" && d1.last._4 == "t5 t6 t7 t8 t9 t10")
    val d2 = out.filter(_._1 == 2L)
    assert(d2.toSeq == Seq((2L, 0L, 3L, "a b c")))
  }

  test("normalizeText lowercases, strips punctuation, collapses whitespace, trims") {
    val out = Seq("  Hello,  WORLD!! 42  ", "already clean", "")
      .toDF("t").select(normalizeText(col("t")).as("n"))
      .collect().map(_.getString(0))
    assert(out.toSeq == Seq("hello world 42", "already clean", ""))
  }

  test("searchPhrase finds consecutive tokens only, counts occurrences, ranks by count") {
    val docs = Seq(
      (1L, "x table hash y table hash z"), // 2 hits
      (2L, "table y hash"),                // tokens present, not adjacent
      (3L, "table hash"),                  // 1 hit
      (4L, "hash table")                   // reversed — no hit
    ).toDF("doc_id", "text")
    val out = searchPhrase(docs, Seq("table", "hash"), k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq((1L, 2L), (3L, 1L)))
  }

  test("searchPhrase handles repeated tokens in the phrase") {
    val docs = Seq(
      (1L, "a b a c"),  // contains "a b a"
      (2L, "a b c a"),  // a and b present, pattern absent
      (3L, "b a b a")   // contains "a b a" at pos 1
    ).toDF("doc_id", "text")
    val out = searchPhrase(docs, Seq("a", "b", "a"), k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq((1L, 1L), (3L, 1L)))
  }

  test("piiSpanCounts counts the same spans redact scrubs") {
    val docs = Seq(
      (1L, "mail me at a.b@x.co and c@y.org ref 1234567"),
      (2L, "short num 12345 is not pii"),
      (3L, "clean text")).toDF("doc_id", "text")
    val out = piiSpanCounts(docs, "doc_id")
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(out.toSeq == Seq((2L, 1L, true), (0L, 0L, false), (0L, 0L, false)))
  }

  test("keywordInContext clamps windows at both document edges") {
    val docs = Seq((1L, "spark a b c spark"), (2L, "x spark y")).toDF("doc_id", "text")
    val out = keywordInContext(docs, "spark", window = 2)
      .orderBy("doc_id", "pos")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(out.toSeq == Seq(
      (1L, 0L, "spark a b"),      // left-clamped
      (1L, 4L, "b c spark"),      // right-clamped
      (2L, 1L, "x spark y")))     // both sides short
  }

  test("searchPhrase: absent tokens and single-token phrases behave") {
    val docs = Seq((1L, "x y z x")).toDF("doc_id", "text")
    assert(searchPhrase(docs, Seq("nope", "y"), k = 5).count() == 0)
    val single = searchPhrase(docs, Seq("x"), k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(single.toSeq == Seq((1L, 2L)))
  }

  test("foldConfusables maps Cyrillic/Greek/fullwidth lookalikes and strips zero-width chars") {
    // "соffее dаy" with Cyrillic с о е а, a ZWSP inside "daтa"-style text,
    // and fullwidth ｏ — all fold to plain ASCII; genuinely different
    // chars (q, digits) pass through untouched
    val rows = Seq(
      (1L, "соffee dаy"),           // Cyrillic с о а
      (2L, "zero​width﻿ gap"),           // ZWSP + BOM deleted
      (3L, "grαph οmicron"),             // Greek α ο
      (4L, "fullｗidth? nｏ"),             // ｗ NOT in map, ｏ is
      (5L, "plain q 42")).toDF("id", "s")
    val got = rows.select(col("id"), foldConfusables(col("s")).as("f"))
      .orderBy("id").collect().map(_.getString(1)).toSeq
    assert(got == Seq(
      "coffee day",
      "zerowidth gap",
      "graph omicron",
      "fullｗidth? no",
      "plain q 42"))
    // idempotent: folding folded text is a no-op
    val twice = rows.select(foldConfusables(foldConfusables(col("s"))).as("f"))
      .collect().map(_.getString(0)).toSeq
    assert(twice == got.sorted || twice.sorted == got.sorted)
  }

  test("duplicatedSpans finds a planted shared span with exact offsets and length") {
    import spark.implicits._
    val shared = "abcdefghijklmnopqrstuvwxyz0123456789ABCDEFGH" // 44 chars
    val docs = Seq(
      (1L, "XX" + shared + "YYYYYYYY"),            // span starts at 3
      (2L, "QQQQQ" + shared + "ZZ"),               // span starts at 6
      (3L, "totally unrelated text with no overlap whatsoever here")
    ).toDF("doc_id", "text")
    val out = TextOps.duplicatedSpans(docs, "doc_id", "text",
        k = 10, minLen = 40, maxDf = 5)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq((1L, 2L, 3L, 6L, 44L)), s"got $out")
  }

  test("duplicatedSpans: sub-minLen runs drop; over-maxDf boilerplate grams never join") {
    import spark.implicits._
    val boiler = "THIS-BOILERPLATE-IS-EVERYWHERE-IN-THE-CORPUS" // 44 chars
    val docs = (1L to 6L).map(i => (i, s"doc$i " + boiler + s" tail$i"))
      .toDF("doc_id", "text")
    // the 44-char shared block appears in 6 docs > maxDf=5: every one of
    // its grams is dropped before the join, so NO spans emerge
    val out = TextOps.duplicatedSpans(docs, "doc_id", "text",
      k = 10, minLen = 20, maxDf = 5)
    assert(out.isEmpty)
    // short overlap below minLen: 15 shared chars with k=10 is a 15-char
    // span — filtered by minLen=20
    val short = Seq(
      (1L, "aaaa SHARED-PIECE-XY bbbb"),
      (2L, "cccc SHARED-PIECE-XY dddd")).toDF("doc_id", "text")
    val o2 = TextOps.duplicatedSpans(short, "doc_id", "text",
      k = 10, minLen = 20, maxDf = 5)
    assert(o2.isEmpty)
  }

  test("removeDuplicatedSpans keeps the min-id occurrence, cuts every other, merges overlaps, passes untouched docs through") {
    import spark.implicits._
    val shared = "abcdefghijklmnopqrstuvwxyz0123456789ABCDEFGH" // 44 chars
    val docs = Seq(
      (1L, "XX" + shared + "YYYYYYYY"),  // min-id: keeps the span
      (2L, "QQQQQ" + shared + "ZZ"),     // cut: prefix + suffix survive
      (3L, shared + " tail3"),           // cut at position 1 (edge: doc start)
      (4L, "totally unrelated text with no overlap whatsoever here"),
      (5L, "pre " + shared)              // cut at doc end (edge: no tail)
    ).toDF("doc_id", "text")
    val out = TextOps.removeDuplicatedSpans(docs, "doc_id", "text",
        k = 10, minLen = 40, maxDf = 5)
      .as[(Long, String)].collect().toMap
    assert(out(1L) == "XX" + shared + "YYYYYYYY") // a-side of every pair
    assert(out(2L) == "QQQQQ" + "ZZ")
    assert(out(3L) == " tail3")
    assert(out(4L) == "totally unrelated text with no overlap whatsoever here")
    assert(out(5L) == "pre ")
    // overlapping removal intervals merge: doc 12 shares its head with 10
    // and an overlapping longer stretch with 11 — one contiguous cut
    val s2 = "0123456789abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUV" // 59
    val docs2 = Seq(
      (10L, s2.substring(0, 45) + " filler-ten-xxxx"),  // head 45 chars
      (11L, "eleven! " + s2),                           // whole 59
      (12L, s2 + " tail12")
    ).toDF("doc_id", "text")
    val out2 = TextOps.removeDuplicatedSpans(docs2, "doc_id", "text",
        k = 10, minLen = 40, maxDf = 5)
      .as[(Long, String)].collect().toMap
    assert(out2(10L) == s2.substring(0, 45) + " filler-ten-xxxx")
    // doc 11 loses only s2[0,45) — the stretch doc 10 (min id) holds;
    // its s2 tail s2[45,59) has no lower-id twin and survives
    assert(out2(11L) == "eleven! " + s2.substring(45), s"got ${out2(11L)}")
    // doc 12's cuts [1,46) from (10,12) and [1,60) from (11,12) MERGE
    // into one contiguous [1,60) — all of s2 goes
    assert(out2(12L) == " tail12", s"got ${out2(12L)}")
  }

  test("keyness: Dunning G² hand-checked on a two-cell contingency") {
    // target "x x y", rest "x y y": a(x)=2 b(x)=1, N1=N2=3, N=6
    // G²(x) = 2·(2·ln(12/9) + 1·ln(6/9)) = 0.3397980… → 0.3398 at 5 dp;
    // x over-represented (+1), y the mirror image (−1)
    val docs = Seq(("g1", "x x y"), ("g2", "x y y")).toDF("source", "text")
    val got = TextOps.keyness(docs, "source", "g1", minCount = 3)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4))).toMap
    assert(got.keySet == Set("x", "y"))
    assert(got("x") == ((2L, 1L, 0.3398, 1L)))
    assert(got("y") == ((1L, 2L, 0.3398, -1L)))
    // below minCount nothing is scored
    assert(TextOps.keyness(docs, "source", "g1", minCount = 4)
      .collect().isEmpty)
  }

  test("rrfFuse: reciprocal ranks summed across lists, hand-checked") {
    // list 1 ranks d1=1, d2=2; list 2 ranks d2=1, d3=2 (by score desc)
    // d2 = 1/62 + 1/61 = 0.0325224… → 0.032522; d1 = 1/61 → 0.016393
    val r1 = Seq((1L, 3.0), (2L, 2.0)).toDF("doc_id", "score")
    val r2 = Seq((2L, 9.0), (3L, 1.0)).toDF("doc_id", "score")
    val got = TextOps.rrfFuse(Seq(r1, r2))
      .as[(Long, Double, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(got(1L) == ((0.016393, 1L)))
    assert(got(2L) == ((0.032522, 2L)))
    assert(got(3L) == ((0.016129, 1L)))
  }
}
