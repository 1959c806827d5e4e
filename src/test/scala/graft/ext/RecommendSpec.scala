package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RecommendSpec extends SparkSpec {
  import spark.implicits._

  private val baskets = Seq(
    (1L, "A"), (1L, "B"), (1L, "C"),
    (2L, "A"), (2L, "B"),
    (3L, "A"), (3L, "D"),
    (3L, "A") // duplicate row: distinct'd away
  ).toDF("b", "i")

  test("itemCooccur: cosine ranking with id tiebreak, hand-checked") {
    // n: A=3 B=2 C=1 D=1; pairs: AB=2 AC=1 BC=1 AD=1
    // A's list: B 2/√6≈0.816497, then C and D tie at 1/√3≈0.57735 → C first
    val got = Recommend.itemCooccur(baskets, "b", "i", topK = 2)
      .collect().map(r => (r.getString(0), r.getLong(3)) ->
        (r.getString(1), r.getDouble(2))).toMap
    assert(got(("A", 1L)) == ("B", 0.816497))
    assert(got(("A", 2L)) == ("C", 0.57735), "tie at 1/√3 breaks on rec id")
    assert(got(("B", 1L)) == ("A", 0.816497))
    // C sees A (1/√3) and B (1/√2≈0.707107): B ranks first
    assert(got(("C", 1L)) == ("B", 0.707107))
    assert(got(("C", 2L)) == ("A", 0.57735))
  }

  test("itemCooccur: maxBasket drops whole baskets and renormalizes n_i") {
    // cap 2 removes basket 1 entirely: C vanishes, n(A)=2, AB=1 from b2
    val got = Recommend.itemCooccur(baskets, "b", "i",
        topK = 5, maxBasket = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
      .toSet
    // sim(A,B) = 1/√(2·1) ≈ 0.707107; sim(A,D) likewise
    assert(got == Set(("A", "B", 0.707107), ("A", "D", 0.707107),
      ("B", "A", 0.707107), ("D", "A", 0.707107)))
    assertThrows[IllegalArgumentException](
      Recommend.itemCooccur(baskets, "b", "i", topK = 0))
    assertThrows[IllegalArgumentException](
      Recommend.itemCooccur(baskets, "b", "i", maxBasket = 1))
  }
}
