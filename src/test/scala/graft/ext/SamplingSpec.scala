package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  test("hashFrac is in [0,1), content-determined, and partition-independent") {
    val df = (1 to 500).map(i => s"doc $i").toDF("t")
    val fracs = df.select(Sampling.hashFrac(col("t")).as("f")).collect().map(_.getDouble(0))
    assert(fracs.forall(f => f >= 0.0 && f < 1.0))
    // repartitioning cannot move a decision (pure content function)
    val a = df.where(Sampling.hashFrac(col("t")) < 0.3).orderBy("t").collect()
    val b = df.repartition(13).where(Sampling.hashFrac(col("t")) < 0.3)
      .orderBy("t").collect()
    assert(a.sameElements(b))
    // and the keep rate lands near the target on uniform-ish hashes
    assert(math.abs(a.length / 500.0 - 0.3) < 0.08)
  }

  test("weightedBy keeps weight-1 rows always and weight-0 rows never") {
    val df = Seq(("keep me", 1.0), ("drop me", 0.0)).toDF("t", "w")
    val kept = Sampling.weightedBy(df, col("t"), col("w")).select("t")
      .as[String].collect().toSeq
    assert(kept == Seq("keep me"))
  }

  test("mixSources applies per-source rates with a default") {
    val df = (1 to 300).map(i => (s"doc $i", if (i % 3 == 0) "a" else "b"))
      .toDF("t", "src")
    val out = Sampling.mixSources(df, col("t"), col("src"),
      Map("a" -> 1.0), default = 0.0)
    val srcs = out.select("src").distinct().as[String].collect().toSeq
    assert(srcs == Seq("a") && out.count() == 100)
  }

  test("temperatureMix keeps the smallest source whole and flattens the head") {
    val df = ((1 to 800).map(i => (s"head doc $i", "big")) ++
      (1 to 100).map(i => (s"tail doc $i", "small"))).toDF("t", "src")
    val kept = Sampling.temperatureMix(df, col("t"), col("src"), tau = 0.5)
      .groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept("small") == 100) // rate 1: nothing dropped from the tail
    // head rate = (800/100)^-0.5 ~ 0.354 -> expect ~283 of 800
    assert(kept("big") > 200 && kept("big") < 370, s"got ${kept("big")}")
    // flattened: head share shrinks from 8:1 toward sqrt(8):1
    assert(kept("big").toDouble / kept("small") < 4.0)
  }

  test("trainOrder: dense 1..n positions equal to the global md5 order") {
    val df = (1L to 300L).toDF("id")
    val out = Sampling.trainOrder(df, "id")
      .orderBy("pos").as[(Long, Long)].collect()
    assert(out.map(_._2).toSeq == (1L to 300L).toSeq)
    val expect = df.orderBy(md5(col("id").cast("string")), col("id"))
      .as[Long].collect().toSeq
    assert(out.map(_._1).toSeq == expect)
  }

  test("splitByGroup: whole chains share one split; unpaired docs self-hash") {
    // 30 chain groups of 4 (pairs a-b, b-c, c-d: closure, NOT direct pairs)
    // + 80 singletons. Every group must emerge with exactly one label, the
    // label of its minimum id, and singletons must match text_split-style
    // per-id hashing.
    val docs = (1L to 200L).toDF("doc_id")
    val pairs = (0 until 30).flatMap { g =>
      val base = g * 4 + 1L
      Seq((base, base + 1), (base + 1, base + 2), (base + 2, base + 3))
    }.toDF("a_id", "b_id")
    val out = Sampling.splitByGroup(docs, pairs, "doc_id")
    val perGroup = out.groupBy("component")
      .agg(countDistinct("split").as("k"), count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(perGroup.forall(_._2 == 1L), "a group straddles splits")
    assert(perGroup.count(_._3 == 4L) == 30 && perGroup.count(_._3 == 1L) == 80)
    // the group label IS the representative's own-id label
    val lbl = out.where(col("doc_id") === col("component"))
      .select("component", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val all = out.select("component", "split").collect()
    assert(all.forall(r => lbl(r.getLong(0)) == r.getString(1)))
    // fractions land near 80/10/10 on the 110 groups
    val shares = out.select("component", "split").distinct()
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(shares.getOrElse("train", 0L) / 110.0 - 0.8) < 0.12)
  }

  test("weightedTopK draws exactly k per stratum, favors heavy weights, excludes w<=0") {
    import org.apache.spark.sql.functions.{col, when}
    // 100 docs per stratum; ids 1-5 (and 101-105) carry weight 1000 vs 1
    val rows = for (s <- Seq("a", "b"); i <- 1 to 100) yield
      (s, (if (s == "a") 0 else 100) + i.toLong, s"doc $s $i content")
    val df = rows.toDF("src", "id", "text")
      .withColumn("w",
        when(col("id") % 100 <= 5 && col("id") % 100 >= 1, 1000.0)
          .otherwise(1.0))
    val got = Sampling.weightedTopK(df, "id", col("text"), col("w"), "src", 10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toList
    assert(got.size == 20 && got.count(_._1 == "a") == 10)
    // P(a specific heavy row beats a light one) ~ 1; all 5 heavies of each
    // stratum should make the top 10 for any reasonable hash draw
    val heavies = got.count { case (_, id) => id % 100 >= 1 && id % 100 <= 5 }
    assert(heavies >= 8, s"expected ~10 heavy rows in the sample, got $heavies")
    // determinism: a second invocation returns the identical sample
    val again = Sampling.weightedTopK(df, "id", col("text"), col("w"), "src", 10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toList
    assert(got.toSet == again.toSet)
    // w <= 0 rows can never be drawn
    val none = Sampling.weightedTopK(
        df.withColumn("w", lit(0.0)), "id", col("text"), col("w"), "src", 10)
      .count()
    assert(none == 0L)
  }

  test("balancedSample: exactly min-class-size rows per class, deterministic") {
    val rows = Seq(
      (1L, "t1", "A"), (2L, "t2", "A"), (3L, "t3", "A"),
      (4L, "t4", "B"), (5L, "t5", "B"),
      (6L, null.asInstanceOf[String], "A") // null content never sampled
    ).toDF("id", "text", "cls")
    def run(parts: Int) = Sampling.balancedSample(
        rows.repartition(parts), col("text"), col("cls"), "id")
      .select("id", "cls").as[(Long, String)].collect().toSet
    val got = run(1)
    // minority class B has 2 rows → exactly 2 per class survive
    assert(got.count(_._2 == "A") == 2 && got.count(_._2 == "B") == 2)
    assert(!got.exists(_._1 == 6L), "null-content row must be dropped")
    assert(got == run(5), "partitioning must not change the kept set")
  }

  test("negativeSample: k ring negatives per anchor, no self-pairs, deterministic") {
    val docs = (1L to 7L).map(i => (i, s"doc body $i")).toDF("id", "text")
    def run(parts: Int) = Sampling.negativeSample(
        docs.repartition(parts), "id", col("text"), k = 2)
      .as[(Long, Long, Long)].collect().toSet
    val got = run(1)
    assert(got == run(4), "pairing must survive repartitioning")
    assert(got.size == 14, "every anchor gets exactly k=2 negatives")
    assert(got.forall { case (a, j, n) => a != n && (j == 1L || j == 2L) })
    // ring structure: each anchor's two negatives are distinct rows
    got.groupBy(_._1).foreach { case (a, rows) =>
      assert(rows.map(_._3).size == 2, s"anchor $a negatives not distinct")
    }
    // tiny corpus where the ring wraps onto the anchor: self-pair dropped
    val two = Seq((1L, "x"), (2L, "y")).toDF("id", "text")
    val wrapped = Sampling.negativeSample(two, "id", col("text"), k = 2)
      .as[(Long, Long, Long)].collect()
    assert(wrapped.forall(r => r._1 != r._3))
    assert(wrapped.length == 2, "k=2 on N=2 wraps one j onto the anchor")
  }
}
