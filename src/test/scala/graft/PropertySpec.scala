package graft

import org.apache.spark.sql.functions._
import graft.ops.Relational._
import graft.ops.Reshape._
import graft.ext.Dedup

/** Algebraic-invariant checks (SURVEY.md §5.3) over seeded random data —
  * deterministic property-style tests (plain ScalaTest; the
  * scalatest↔scalacheck bridge isn't in the offline dependency set). */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(42)

  test("property: grouped dsum equals ungrouped dsum for 2-decimal doubles") {
    for (trial <- 1 to 5) {
      val rows = Seq.fill(200)((rnd.nextInt(5), rnd.nextInt(100000) / 100.0))
      val df = rows.toDF("k", "v").repartition(1 + trial)
      val total = df.agg(dsum(col("v"))).head.getDouble(0)
      val grouped = df.groupBy("k").agg(dsum(col("v")).as("s"))
        .agg(dsum(col("s"))).head.getDouble(0)
      assert(total == grouped, s"trial $trial")
    }
  }

  test("property: explodePyList emits exactly sum(list sizes) rows") {
    for (trial <- 1 to 5) {
      val rows = Seq.tabulate(50) { i =>
        val n = 1 + rnd.nextInt(4)
        val elems = Seq.fill(n)(s"${rnd.nextInt(90) + 10}.${rnd.nextInt(90) + 10}")
        (i, elems.mkString("['", "', '", "']"), n)
      }
      val df = rows.map { case (i, s, n) => (i, s, n) }.toDF("id", "lst", "n")
      val expected = rows.map(_._3).sum
      assert(explodePyList(df, "lst").count() == expected, s"trial $trial")
    }
  }

  test("property: dropExactDups is idempotent and bounded by distinct content") {
    for (trial <- 1 to 3) {
      val texts = Seq.fill(100)(s"doc ${rnd.nextInt(30)}")
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val once = Dedup.dropExactDups(df, "text")
      assert(once.count() == texts.distinct.size, s"trial $trial")
      assert(Dedup.dropExactDups(once, "text").count() == once.count())
    }
  }

  test("property: semiJoin row count is bounded by facts; join keys preserved") {
    for (trial <- 1 to 3) {
      val facts = Seq.fill(100)((rnd.nextInt(20), rnd.nextInt())).toDF("k", "v")
      val dims = Seq.fill(10)(rnd.nextInt(20)).toDF("k")
      val out = semiJoin(facts, dims, "k")
      assert(out.count() <= facts.count())
      val dimKeys = dims.collect().map(_.getInt(0)).toSet
      assert(out.collect().forall(r => dimKeys.contains(r.getInt(0))))
    }
  }

  test("property: pivot∘melt round-trips for complete matrices") {
    val long = (for { s <- 1 to 4; e <- Seq("x", "y", "z") }
      yield (s"s$s", e, rnd.nextInt(100).toDouble)).toDF("soc", "elem", "v")
    val wide = pivotWide(long, Seq("soc"), "elem", Seq("x", "y", "z"), "v")
    val back = meltView(wide, Seq("soc"), Seq("x", "y", "z"), "elem", "v")
    assert(back.count() == long.count())
    val a = long.orderBy("soc", "elem").collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
    val b = back.orderBy("soc", "elem").collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
    assert(a.sameElements(b))
  }
}
