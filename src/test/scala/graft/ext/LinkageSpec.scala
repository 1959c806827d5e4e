package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class LinkageSpec extends SparkSpec {
  import spark.implicits._

  private val fields = Seq(
    Linkage.FieldSpec("ty", 0.95, 0.02),
    Linkage.FieldSpec("tk", 0.90, 0.05))

  private val rows = Seq(
    (1L, "B1", "steel", "red"),    // 1-2: same block, both fields agree
    (2L, "B1", "steel", "red"),
    (3L, "B1", "steel", "blue"),   // agrees with 1/2 on ty only
    (4L, "B2", "steel", "red"),    // other block: never paired with 1-3
    (5L, "B1", null, "red")        // null field: never agrees
  ).toDF("id", "blk", "ty", "tk")

  private def score(agree: Seq[Boolean]): Double =
    fields.zip(agree).map { case (f, a) =>
      if (a) f.agreeWeight else f.disagreeWeight
    }.sum

  test("blocked pairs score as the literal log-likelihood sum") {
    val out = Linkage.selfLinkPairs(rows, "id", col("blk"), fields,
        threshold = -100.0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).sortBy(p => (p._1, p._2))
    // block B1 has ids {1,2,3,5} -> 6 pairs; id 4 pairs with nobody
    assert(out.length == 6)
    assert(!out.exists(p => p._1 == 4L || p._2 == 4L))
    val full = out.find(p => (p._1, p._2) == (1L, 2L)).get
    assert(full._3 == 2L)
    assert(math.abs(full._4 - score(Seq(true, true))) < 1e-5)
    val half = out.find(p => (p._1, p._2) == (1L, 3L)).get
    assert(half._3 == 1L)
    assert(math.abs(half._4 - score(Seq(true, false))) < 1e-5)
  }

  test("null fields never agree (null == null is a disagreement)") {
    val p15 = Linkage.selfLinkPairs(rows, "id", col("blk"), fields,
        threshold = -100.0)
      .where(col("a_id") === 1 && col("b_id") === 5).head()
    assert(p15.getLong(2) == 1L) // tk agrees, null ty does not
  }

  test("threshold keeps only above-score pairs; priors validate") {
    // the emitted score is r5-rounded, so threshold against the rounded
    // value (can sit up to 5e-6 below the exact sum)
    val linked = Linkage.selfLinkPairs(rows, "id", col("blk"), fields,
      threshold = score(Seq(true, true)) - 1e-4)
    assert(linked.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((1L, 2L)))
    intercept[IllegalArgumentException](Linkage.FieldSpec("x", 0.1, 0.5))
  }

  test("emFit recovers planted (p, m, u) from model-expected pattern counts") {
    // exact expected counts under the two-class conditional-independence
    // model at N = 1e6: the ML optimum IS the planted parameter vector,
    // so a converged EM must land on it
    val p0 = 0.2
    val m0 = Seq(0.95, 0.9, 0.8)
    val u0 = Seq(0.15, 0.1, 0.05)
    val pats = for (g0 <- 0 to 1; g1 <- 0 to 1; g2 <- 0 to 1) yield {
      val g = Seq(g0, g1, g2)
      def pr(t: Seq[Double]) = g.zip(t)
        .map { case (gi, ti) => if (gi == 1) ti else 1 - ti }.product
      (g, math.round((p0 * pr(m0) + (1 - p0) * pr(u0)) * 1e6))
    }
    val (p, m, u) = Linkage.emFit(pats.toSeq, 3, iters = 200)
    assert(math.abs(p - p0) < 0.02, s"p=$p")
    m0.zip(m).foreach { case (want, got) =>
      assert(math.abs(want - got) < 0.02, s"m: want $want got $got") }
    u0.zip(u).foreach { case (want, got) =>
      assert(math.abs(want - got) < 0.02, s"u: want $want got $got") }
  }

  test("emFitFields fits discriminating specs on a planted-duplicate frame") {
    // one block, 10 originals + a noisy copy of each: ty always agrees on
    // match pairs, tk agrees on 8 of 10 — fitted m must dominate u and
    // scoring with the fitted specs must link every (i, i+100) pair
    val rows = (1L to 10L).flatMap { i =>
      Seq((i, "B", s"t$i", s"k$i"),
        (i + 100L, "B", s"t$i", if (i <= 8) s"k$i" else "zz"))
    }.toDF("id", "blk", "ty", "tk")
    val fitted = Linkage.emFitFields(rows, "id", col("blk"),
      Seq("ty", "tk"), iters = 50)
    fitted.foreach(f => assert(f.m > f.u, f.toString))
    val linked = Linkage.selfLinkPairs(rows, "id", col("blk"), fitted,
        threshold = 0.0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    (1L to 10L).foreach(i => assert(linked.contains((i, i + 100L)),
      s"match pair ($i, ${i + 100}) not linked: $linked"))
  }

  test("selfLinkPairsEmFitted: one candidate pass, same links as the two-pass composition") {
    // the shared-candidate path (fit + score off one checkpointed blocked
    // join) must select exactly the pairs the two-pass composition
    // (emFitFields then selfLinkPairs) selects: lr >= 1 ⟺ log-score >= 0
    // for the same fitted priors (exp is monotone), and n_agree is the
    // same integer either way
    val rows = (1L to 10L).flatMap { i =>
      Seq((i, "B", s"t$i", s"k$i"),
        (i + 100L, "B", s"t$i", if (i <= 8) s"k$i" else "zz"))
    }.toDF("id", "blk", "ty", "tk")
    val fitted = Linkage.emFitFields(rows, "id", col("blk"),
      Seq("ty", "tk"), iters = 50)
    val two = Linkage.selfLinkPairs(rows, "id", col("blk"), fitted,
        threshold = 0.0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val one = Linkage.selfLinkPairsEmFitted(rows, "id", col("blk"),
      Seq("ty", "tk"), iters = 50, threshold = 1.0)
    assert(one.columns.toSeq == Seq("a_id", "b_id", "n_agree", "lr"))
    val oneSet = one
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(oneSet == two, s"one-pass $oneSet vs two-pass $two")
    // every reported ratio clears the threshold in ratio space
    assert(one.collect().forall(_.getDouble(3) >= 1.0))
    // and the scored plan reads the shared checkpointed O(N) sized
    // frame (LogicalRDD), never a re-derivation of the source table
    assert(one.queryExecution.analyzed.collect {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr }.nonEmpty,
      "scored plan does not read the shared checkpointed sized frame")
  }

  test("agreementPatternCounts (subset-lattice) equals brute-force pair enumeration — nulls, caps, star path") {
    // the analytic counter must be BIT-identical to enumerating pairs:
    // nulls never agree (not even with nulls), within-cap blocks are
    // all-pairs, over-cap blocks are member-vs-min-id-representative
    val rows = (
      // HOT block: 30 rows > maxBlock 20 → star path; planted repeats
      (1L to 30L).map(i => (i, "HOT",
        if (i % 3 == 0) null else s"t${i % 4}",
        if (i % 5 == 0) null else s"k${i % 2}")) ++
      // COLD block: 8 rows ≤ cap → exact all-pairs, with nulls
      (100L to 107L).map(i => (i, "COLD",
        if (i % 4 == 0) null else s"t${i % 3}", s"k${i % 2}"))
    ).toDF("id", "blk", "ty", "tk")
    val analytic = Linkage.agreementPatternCounts(rows, "id", col("blk"),
        Seq("ty", "tk"), maxBlock = 20)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    // brute force on the driver (tiny frame): same pairing rules
    val data = rows.collect().map(r => (r.getLong(0), r.getString(1),
      Option(r.getString(2)), Option(r.getString(3))))
    def agree(a: Option[String], b: Option[String]): Int =
      if (a.isDefined && a == b) 1 else 0
    val brute = scala.collection.mutable.Map.empty[(Int, Int), Long]
    data.groupBy(_._2).foreach { case (_, members) =>
      val ms = members.sortBy(_._1)
      val pairs =
        if (ms.length <= 20)
          for (i <- ms.indices; j <- (i + 1) until ms.length)
            yield (ms(i), ms(j))
        else ms.tail.map(m => (ms.head, m)).toIndexedSeq
      pairs.foreach { case (x, y) =>
        val key = (agree(x._3, y._3), agree(x._4, y._4))
        brute(key) = brute.getOrElse(key, 0L) + 1L
      }
    }
    assert(analytic == brute.toMap,
      s"analytic $analytic != brute ${brute.toMap}")
  }

  test("over-cap blocks star-collapse around the min-id representative") {
    // skew-planted block: one degenerate key holds 50 of 60 records (the
    // empty-field-in-the-block-key failure), plus a small exact block
    val skew = ((1L to 50L).map(i => (i, "HOT", "steel", s"c$i")) ++
      (100L to 109L).map(i => (i, "COLD", "steel", "red")))
      .toDF("id", "blk", "ty", "tk")
    val out = Linkage.selfLinkPairs(skew, "id", col("blk"), fields,
        threshold = -100.0, maxBlock = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // HOT (size 50 > 20): 49 star pairs anchored at id 1, not 1225
    val hot = out.filter(_._2 <= 50L)
    assert(hot.size == 49 && hot.forall(_._1 == 1L))
    // COLD (size 10 <= 20): exact all-pairs, 45
    assert(out.count(_._1 >= 100L) == 45)
    // under the cap the output is IDENTICAL to the uncapped exact path —
    // the er_fs oracle contract
    val exact = Linkage.selfLinkPairs(rows, "id", col("blk"), fields,
      threshold = -100.0, maxBlock = 10000)
    val tiny = Linkage.selfLinkPairs(rows, "id", col("blk"), fields,
      threshold = -100.0, maxBlock = 4)
    assert(exact.collect().map(_.toString).sorted
      .sameElements(tiny.collect().map(_.toString).sorted))
  }
}
