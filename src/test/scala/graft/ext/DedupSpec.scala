package graft.ext

import graft.SparkSpec

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog again and again today"
  private val near = "the quick brown fox jumps over the lazy dog again and again tonight"
  private val far  = "completely different words about spark catalyst expressions and shuffles"

  test("exactDedupGroups keeps min id and counts copies") {
    val df = Seq((1L, "x x x"), (2L, "x x x"), (3L, "y y y")).toDF("doc_id", "text")
    val out = Dedup.exactDedupGroups(df, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out == Map(1L -> 2L, 3L -> 1L))
  }

  test("dropExactDups is idempotent and keeps one row per content") {
    val df = Seq((1L, "x"), (2L, "x"), (3L, "y")).toDF("doc_id", "text")
    val once = Dedup.dropExactDups(df, "text")
    val twice = Dedup.dropExactDups(once, "text")
    assert(once.count() == 2 && twice.count() == 2)
  }

  test("nearDupPairs finds near-duplicates and not unrelated docs") {
    val df = Seq((1L, base), (2L, near), (3L, far)).toDF("doc_id", "text")
    val pairs = Dedup.nearDupPairs(df, "doc_id", "text", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq == Seq((1L, 2L)))
  }

  test("nearDupPairs jaccard matches a hand-computed value") {
    val df = Seq((1L, base), (2L, base)).toDF("doc_id", "text")
    val j = Dedup.nearDupPairs(df, "doc_id", "text", threshold = 0.5)
      .head.getDouble(2)
    assert(j == 1.0) // identical docs
  }

  test("ngramJaccardPairs: near pair found within a block, cross-block pairs never compared") {
    val df = Seq(
      (1L, base, "en"), (2L, near, "en"),  // near-dups, same block
      (3L, far, "en"),                     // same block, unrelated
      (4L, base, "de")                     // identical to 1 but other block
    ).toDF("doc_id", "text", "lang")
    val pairs = Dedup.ngramJaccardPairs(df, "doc_id", "text", "lang",
        k = 5, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq == Seq((1L, 2L))) // (1,4) blocked away; (x,3) below threshold
  }

  test("charGrams: short text collapses to one whole-text gram; tails are suffixes") {
    import org.apache.spark.sql.functions.col
    val out = Seq(("abc"), ("abcdefg")).toDF("t")
      .select(TextOps.charGrams(col("t"), 5).as("g"))
      .collect().map(_.getSeq[String](0))
    assert(out(0) == Seq("abc"))
    assert(out(1) == Seq("abcde", "bcdef", "cdefg"))
  }

  test("simhash of identical texts is identical; simhashPairs reports hamming 0") {
    val df = Seq((1L, base), (2L, base), (3L, far)).toDF("doc_id", "text")
    val pairs = Dedup.simhashPairs(df, "doc_id", "text", maxDist = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.toSeq == Seq((1L, 2L, 0)))
  }

  test("connectedComponents: chain a~b, b~c (no a~c edge) is ONE group; clean keeps one doc") {
    // texts built so J(a,b)>=0.7, J(b,c)>=0.7 but J(a,c)<0.7 — the case
    // single-pass keep-first cannot canonicalize
    val words = (1 to 20).map(i => s"w$i")
    val a = words.take(16).mkString(" ")                 // w1..w16
    val b = words.slice(2, 18).mkString(" ")             // w3..w18
    val c = words.slice(4, 20).mkString(" ")             // w5..w20
    val df = Seq((1L, a), (2L, b), (3L, c), (4L, "unrelated totally different"))
      .toDF("doc_id", "text")
    val pairs = Dedup.nearDupPairs(df, "doc_id", "text", threshold = 0.7)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L), (2L, 3L)), s"fixture broke: $pairs")
    val comp = Dedup.connectedComponents(pairs.toSeq.toDF("a_id", "b_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
    val kept = Dedup.dropNearDupGroups(df, pairs.toSeq.toDF("a_id", "b_id"), "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 4L))
  }

  test("dropNearDupGroupsKeepBest keeps the best-scoring member per group, ties to smaller id, singletons kept") {
    val df = Seq(
      (1L, "short", 5),        // group A (pairs below): score 5
      (2L, "longest text", 12),// group A: best -> kept
      (3L, "medium tx", 9),    // group A
      (4L, "tie", 7),          // group B: tie with 5 -> smaller id kept
      (5L, "tie", 7),          // group B
      (6L, "singleton", 3)     // no pairs -> kept
    ).toDF("doc_id", "text", "sc")
    val pairs = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("a_id", "b_id")
    val kept = Dedup.dropNearDupGroupsKeepBest(df, pairs, "doc_id", org.apache.spark.sql.functions.col("sc"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L, 4L, 6L), s"got $kept")
    // min-id policy on the same inputs differs — proves the policy matters
    val minKept = Dedup.dropNearDupGroups(df, pairs, "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(minKept == Set(1L, 4L, 6L))
  }

  test("connectedComponents: multi-parent 2-level state does NOT stop early (r10 convergence bug)") {
    // pairs whose first large/small-star round yields edges
    // {(5,1),(5,2),(6,1),(7,2)} — no child is a root, but child 5 has
    // TWO parents of the same true component. The r10 star-forest check
    // stopped here and labeled {2,7} component 2; the fix requires
    // single-parent too, so one more round collapses everything to 1.
    val pairs = Seq((1L, 6L), (5L, 6L), (5L, 7L), (2L, 7L)).toDF("a_id", "b_id")
    val comp = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp == Map(1L -> 1L, 2L -> 1L, 5L -> 1L, 6L -> 1L, 7L -> 1L),
      s"got $comp")
  }

  test("connectedComponents matches union-find on random graphs (chains, stars, isolates)") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 3) {
      val n = 60
      val edges = Seq.fill(50)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (u, v) => u != v }
        .map { case (u, v) => (math.min(u, v), math.max(u, v)) }.distinct
      // reference: driver-side union-find
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (u, v) =>
        val (ru, rv) = (find(u), find(v))
        if (ru != rv) parent(math.max(ru, rv)) = math.min(ru, rv)
      }
      val want = edges.flatMap(e => Seq(e._1, e._2)).distinct
        .map(x => x -> find(x)).toMap
      val got = Dedup.connectedComponents(edges.toDF("a_id", "b_id"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == want, s"trial $trial")
    }
  }

  test("incrementalComponents equals a full recompute (merge, rebase, batch-only, untouched)") {
    // base graph (even ids): {2,4} comp 2, {6,8} comp 6
    val basePairs = Seq((2L, 4L), (6L, 8L)).toDF("a_id", "b_id")
    val base = Dedup.connectedComponents(basePairs)
    // delta (odd batch ids): 3 bridges comps 2 and 6 (merge of two
    // existing components through a batch node); 1 pairs with 4 and is
    // SMALLER than every base member (the whole merged component must
    // rebase to 1); 5~7 is a batch-only chain; 10 is a corpus SINGLETON
    // (absent from base labels) first connected by the delta pair (10,11)
    val delta = Seq((4L, 1L), (2L, 3L), (6L, 3L), (5L, 7L), (10L, 11L))
      .toDF("a_id", "b_id")
    val batchIds = Seq(1L, 3L, 5L, 7L, 9L, 11L).toDF("id")
    val got = Dedup.incrementalComponents(base, batchIds, delta)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // reference: full CC over base ∪ delta pairs, plus isolates = self
    val full = Dedup.connectedComponents(basePairs.unionAll(
        delta.select("a_id", "b_id")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = full + (9L -> 9L)
    assert(got == want, s"got $got want $want")
    // the merge-through-batch-node case really collapsed to the global min
    assert(got(8L) == 1L && got(3L) == 1L && got(2L) == 1L)
    // batch-only chain got its own component, untouched singleton kept
    assert(got(5L) == 5L && got(7L) == 5L && got(9L) == 9L)
    // corpus singleton connected only by the delta gets its merged label
    assert(got(10L) == 10L && got(11L) == 10L)
  }

  test("incrementalComponents equals full CC on random graphs and random batch splits") {
    val rnd = new scala.util.Random(29)
    for (trial <- 1 to 3) {
      // corpus ids 0..19, batch ids 100..107 (disjoint, per contract)
      val basePairs = Seq.fill(12)(
          (rnd.nextInt(20).toLong, rnd.nextInt(20).toLong))
        .filter(e => e._1 != e._2).distinct
      val batchIds = (100L to 107L)
      val deltaPairs = Seq.fill(10) {
        val b = 100L + rnd.nextInt(8)
        if (rnd.nextBoolean()) (rnd.nextInt(20).toLong, b)
        else (100L + rnd.nextInt(8), b)
      }.filter(e => e._1 != e._2).distinct
      val base = Dedup.connectedComponents(basePairs.toDF("a_id", "b_id"))
      val got = Dedup.incrementalComponents(base, batchIds.toDF("id"),
          deltaPairs.toDF("a_id", "b_id"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val full = Dedup.connectedComponents(
          (basePairs ++ deltaPairs).toDF("a_id", "b_id"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // incremental output covers base ids + batch ids + delta-connected
      // corpus singletons — exactly full CC's node set plus isolated
      // batch ids, which label themselves
      val want = full ++ batchIds.filterNot(full.contains).map(b => b -> b)
      assert(got == want, s"trial $trial: got $got want $want")
    }
  }

  test("minhash candidate generation is bucketed, not all-pairs") {
    // 4 mutually-unrelated docs must produce zero candidates (no bands collide)
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "one two three four five six seven eight"),
      (3L, "red green blue yellow purple orange pink white"),
      (4L, "spark flink trino duck presto hive impala drill")).toDF("doc_id", "text")
    assert(Dedup.nearDupCandidates(df, "doc_id", "text").count() == 0)
  }

  test("nearDupCandidates: over-cap bucket collapses to a star; small buckets stay all-pairs") {
    // planted boilerplate cluster: 8 identical docs share EVERY band bucket
    val boiler = (1L to 8L).map(i =>
      (i, "copyright footer all rights reserved terms of service apply here"))
    val normalPair = Seq((100L, base), (101L, near)) // small-bucket near-dups
    val df = (boiler ++ normalPair).toDF("doc_id", "text")
    // uncapped: the boilerplate bucket emits C(8,2)=28 pairs + the near pair
    val uncapped = Dedup.nearDupCandidates(df, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(uncapped.count(p => p._1 <= 8 && p._2 <= 8) == 28)
    assert(uncapped.contains((100L, 101L)))
    // capped at 4: the over-full bucket collapses to a STAR around doc 1 —
    // k-1 = 7 pairs, every member still connected — while the small bucket
    // keeps its all-pairs path untouched
    val capped = Dedup.nearDupCandidates(df, "doc_id", "text", maxBucket = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped.filter(p => p._1 <= 8 && p._2 <= 8) ==
      (2L to 8L).map(i => (1L, i)).toSet, s"got $capped")
    assert(capped.contains((100L, 101L)))
    // connectivity survives the cap: the whole cluster is still ONE group
    val comp = Dedup.connectedComponents(
        Dedup.nearDupPairs(df, "doc_id", "text", threshold = 0.7, maxBucket = 4))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((1L to 8L).forall(comp(_) == 1L))
  }

  test("signaturePairs: over-cap bucket stars around the representative, hamming still gates") {
    // 6 identical texts -> identical simhash -> every band bucket has 6 ids
    val df = ((1L to 6L).map(i => (i, base)) :+ (9L, far)).toDF("doc_id", "text")
    val capped = Dedup.simhashPairs(df, "doc_id", "text",
        maxDist = 0, bits = 64, bands = 4, maxBucket = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(capped == (2L to 6L).map(i => (1L, i, 0)).toSet, s"got $capped")
    val uncapped = Dedup.simhashPairs(df, "doc_id", "text",
      maxDist = 0, bits = 64, bands = 4).count()
    assert(uncapped == 15) // C(6,2)
  }

  test("incrementalDedup drops within-batch copies (keep-first) and corpus resubmissions") {
    val corpus = Seq((1L, "old doc"), (2L, "other old doc")).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "fresh doc"),   // genuinely new -> kept
      (11L, "fresh doc"),   // within-batch dup -> folded into 10
      (12L, "old doc")      // corpus resubmission -> dropped
    ).toDF("doc_id", "text")
    val kept = Dedup.incrementalDedup(corpus, batch, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSeq
    assert(kept == Seq(10L))
  }

  test("incrementalNearDedup: corpus paraphrases drop, fresh docs keep, batch keeps first") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again today"),
      (2L, "completely unrelated corpus text about databases and storage")
    ).toDF("doc_id", "text")
    val batch = Seq(
      // near-dup of corpus doc 1 (last word changed: 8 of 9 shingles
      // shared, J = 8/10 = 0.8) -> dropped
      (10L, "the quick brown fox jumps over the lazy dog again tonight"),
      // genuinely new -> kept
      (11L, "a fresh document with entirely new content and words here"),
      // within-batch near-dup pair -> keep-first (12 kept, 13 dropped)
      (12L, "novel batch text mentioning graphs and components at scale"),
      (13L, "novel batch text mentioning graphs and components at range")
    ).toDF("doc_id", "text")
    val kept = Dedup.incrementalNearDedup(corpus, batch, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSeq.sorted
    assert(kept == Seq(11L, 12L))
  }

  test("incrementalNearDedup: over-cap corpus bucket still drops via its representative") {
    // three identical corpus docs share every band -> bucket size 3 > cap 1;
    // only the min-id member joins, and the batch clone must still drop.
    val boiler = "standard boilerplate footer text repeated on every page here"
    val corpus = Seq((1L, boiler), (2L, boiler), (3L, boiler)).toDF("doc_id", "text")
    val batch = Seq(
      (10L, boiler),
      (11L, "unique new article body with real information content inside")
    ).toDF("doc_id", "text")
    val kept = Dedup.incrementalNearDedup(corpus, batch, "doc_id", "text",
        maxBucket = 1)
      .select("doc_id").as[Long].collect().toSeq
    assert(kept == Seq(11L))
  }

  test("setSimJoinPrefix is exact: matches driver-side brute force, incl. the float-ceil boundary") {
    // shingleK=1 → token set = word set, so expectations are hand-checkable.
    // (1,2) sits EXACTLY at J = 3/5 = 0.6 with |x|=5: 0.6·5 is
    // 3.0000000000000004 in doubles — a naive ceil/length filter drops it.
    val docs = Seq(
      (1L, "a b c d e"),
      (2L, "a b c"),            // J(1,2) = 3/5 = 0.6
      (3L, "f g h i j"),
      (4L, "f g h i k"),        // J(3,4) = 4/6 ≈ 0.667
      (5L, "a z"),              // below threshold with everything
      (6L, "f g h i k")         // exact dup of 4 → J = 1 with 4, 4/6 with 3
    ).toDF("doc_id", "text")
    val got = Dedup.setSimJoinPrefix(docs, "doc_id", "text",
        threshold = 0.6, shingleK = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        math.round(r.getDouble(2) * 1e6) / 1e6)).toSet
    val expected = {
      val sets = Map(1L -> "a b c d e", 2L -> "a b c", 3L -> "f g h i j",
        4L -> "f g h i k", 5L -> "a z", 6L -> "f g h i k")
        .view.mapValues(_.split(' ').toSet).toMap
      (for {
        a <- sets.keys; b <- sets.keys if a < b
        i = (sets(a) & sets(b)).size
        j = i.toDouble / (sets(a) | sets(b)).size if j >= 0.6
      } yield (a, b, math.round(j * 1e6) / 1e6)).toSet
    }
    assert(got == expected, s"got $got, brute force says $expected")
    assert(got.contains((1L, 2L, 0.6)),
      "the J=0.6 boundary pair must survive the float ceil")
  }

  test("containmentJoinPrefix finds the wrapped copy Jaccard misses") {
    // doc 2 = doc 1 pasted inside heavy boilerplate. shingleK=1 → word
    // sets: containment(1,2) = 4/4 = 1.0, Jaccard = 4/16 = 0.25.
    val inner = "alpha beta gamma delta"
    val docs = Seq(
      (1L, inner),
      (2L, (1 to 12).map(i => s"b$i").mkString(" ") + " " + inner),
      (3L, "x y z")
    ).toDF("doc_id", "text")
    val cont = Dedup.containmentJoinPrefix(docs, "doc_id", "text",
        threshold = 0.9, shingleK = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(cont == Set((1L, 2L, 1.0)),
      s"containment must see the wrapped copy: $cont")
    // the symmetric exact join at the same bar must NOT pair them
    val jac = Dedup.setSimJoinPrefix(docs, "doc_id", "text",
        threshold = 0.9, shingleK = 1)
      .collect()
    assert(jac.isEmpty, "Jaccard 0.25 must stay invisible at τ=0.9")
  }

  test("sortedNeighborPairs: window-adjacent ranks only, threshold verified") {
    // three docs sharing a sort-key prefix, every pair at Jaccard 0.5
    // (shingles {r g b, g b y, b y X}: 2 shared of 4); sort order is
    // key-ascending aaa < bbb < ccc, plus one far-away dissimilar doc.
    val docs = Seq(
      (1L, "red green blue yellow aaa"),
      (2L, "red green blue yellow bbb"),
      (3L, "red green blue yellow ccc"),
      (9L, "zzz totally unrelated words here")
    ).toDF("doc_id", "text")
    def pairs(w: Int) =
      Dedup.sortedNeighborPairs(docs, "doc_id", "text", window = w,
          threshold = 0.5)
        .select("a_id", "b_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    // window 2: rank-adjacent only — (1,3) at rank distance 2 is invisible
    assert(pairs(2) == Set((1L, 2L), (2L, 3L)))
    // window 3 widens the neighborhood to include it
    assert(pairs(3) == Set((1L, 2L), (2L, 3L), (1L, 3L)))
    assertThrows[IllegalArgumentException](
      Dedup.sortedNeighborPairs(docs, "doc_id", "text", window = 1))
  }

  test("dedupeByPriority: highest-priority source wins, id breaks ties") {
    import org.apache.spark.sql.functions.col
    val rows = Seq((1L, "x", 2), (2L, "x", 1), (3L, "x", 1), (4L, "y", 5))
      .toDF("id", "t", "pr")
    val got = Dedup.dedupeByPriority(rows, "t", "id", col("pr"))
      .as[(Long, Long, Long)].collect().toSet
    // "x": (pr 1, id 2) beats (1,3) and (2,1); 3 copies over 2 priorities
    assert(got == Set((2L, 3L, 2L), (4L, 1L, 1L)))
  }

  test("goldenRecords: per-attribute survivorship, not one winner row") {
    // group 1 fuses across rows: longest text ties at len 5 → min id (2)
    // wins "bbbbb"; modal lang "de" (2 of 3); max n = 9 comes from the
    // SHORT-text row — no single row holds all surviving values
    val rows = Seq(
      (1L, 10L, "aaaa", "en", 9L),
      (2L, 10L, "bbbbb", "de", 5L),
      (3L, 10L, "ccccc", "de", 4L),
      (7L, 20L, "solo", "fr", 1L)
    ).toDF("id", "grp", "text", "lang", "n")
    val got = Dedup.goldenRecords(rows, "id", "grp",
        longestCols = Seq("text"), modalCols = Seq("lang"),
        maxCols = Seq("n"))
      .select("grp", "n_members", "keep_id", "n", "text", "lang")
      .as[(Long, Long, Long, Long, String, String)].collect().toSet
    assert(got == Set(
      (10L, 3L, 1L, 9L, "bbbbb", "de"),
      (20L, 1L, 7L, 1L, "solo", "fr")))
  }

  test("sortedNeighborPairs is deterministic across partition layouts") {
    val docs = Seq(
      (1L, "alpha beta gamma delta egg"),
      (2L, "alpha beta gamma delta fig"),
      (3L, "!!!"), // normalizes to an empty key — must not crash
      (4L, "other words entirely distinct")
    ).toDF("doc_id", "text")
    def run(parts: Int) =
      Dedup.sortedNeighborPairs(docs.repartition(parts), "doc_id", "text",
          window = 3, threshold = 0.5)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSet
    val one = run(1)
    assert(one == run(7))
    assert(one.contains((1L, 2L, 0.5)))
  }
}
