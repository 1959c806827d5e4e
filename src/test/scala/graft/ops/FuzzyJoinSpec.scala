package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  test("fuzzySelfPairs finds substitution, insertion, deletion and exact pairs; excludes dist 2") {
    val df = Seq(
      (1L, "kitten"), (2L, "mitten"),   // substitution
      (3L, "cat"), (4L, "cats"),        // insertion at end
      (5L, "split"), (6L, "slit"),      // deletion mid-word
      (7L, "same"), (8L, "same"),       // identical → dist 0
      (9L, "abc"), (10L, "xyz")         // far apart
    ).toDF("id", "s")
    val pairs = Relational.fuzzySelfPairs(df, "id", "s")
      .select("a_id", "b_id", "dist").as[(Long, Long, Int)].collect().toSet
    assert(pairs == Set((1L, 2L, 1), (3L, 4L, 1), (5L, 6L, 1), (7L, 8L, 0)))
  }

  test("deletion-neighborhood candidates are COMPLETE vs brute force on random short strings") {
    // deterministic pseudo-random corpus over a 3-letter alphabet: dense
    // enough that every edit relationship (sub/ins/del, first/last char)
    // occurs many times
    val rnd = new scala.util.Random(42)
    val strs = (0 until 120).map { i =>
      (i.toLong, (0 until 1 + rnd.nextInt(5)).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString)
    }
    val df = strs.toDF("id", "s")
    val fast = Relational.fuzzySelfPairs(df, "id", "s")
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val a = df.select(col("id").as("a_id"), col("s").as("a_s"))
    val b = df.select(col("id").as("b_id"), col("s").as("b_s"))
    val brute = a.crossJoin(b)
      .where(col("a_id") < col("b_id") &&
        levenshtein(col("a_s"), col("b_s")) <= 1)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(fast == brute, s"missing=${brute -- fast} extra=${fast -- brute}")
    assert(brute.nonEmpty)
  }

  test("maxBlock star-collapse: bounded pairs, representative connectivity, no false positives") {
    // a clustered corpus: one shared variant block of size 12 ("x1".."x9",
    // "x" — all share the deletion variant "x") plus an unrelated pair
    val cluster = (0 until 10).map(i => (i.toLong, s"x$i")) :+ (100L, "x")
    val df = (cluster ++ Seq((200L, "cat"), (201L, "cats"))).toDF("id", "s")
    val capped = Relational.fuzzySelfPairs(df, "id", "s", maxBlock = 3)
      .select("a_id", "b_id", "dist").as[(Long, Long, Int)].collect().toSet
    val full = Relational.fuzzySelfPairs(df, "id", "s")
      .select("a_id", "b_id", "dist").as[(Long, Long, Int)].collect().toSet
    // capped output is a subset of the uncapped (levenshtein still gates)
    assert(capped.subsetOf(full), s"extra=${capped -- full}")
    // the un-clustered pair is untouched by the cap
    assert(capped.contains((200L, 201L, 1)))
    // every over-cap cluster member within dist 1 of the representative
    // (id 0, the block minimum) is still found — connectivity survives
    assert(capped.exists { case (a, b, _) => a == 0L && b == 100L })
    // and the pair count in the cluster is linear, not quadratic: the
    // uncapped run pairs "x" with all ten "xN" (plus rep pairs); capped
    // must be strictly smaller
    assert(capped.size < full.size)
  }
}
