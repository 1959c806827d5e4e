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

  test("associationRules: support/confidence/lift hand-checked") {
    // baskets: b1={A,B,C} b2={A,B} b3={A,D}; N=3, n(A)=3 n(B)=2;
    // only AB reaches minCount=2 (n_AB=2):
    //   A→B: supp 2/3, conf 2/3, lift 3·2/(3·2)=1
    //   B→A: supp 2/3, conf 2/2=1, lift 1
    val got = Recommend.associationRules(baskets, "b", "i", minCount = 2)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))
      .toMap
    assert(got.keySet == Set(("A", "B"), ("B", "A")))
    assert(got(("A", "B")) == ((2L, 0.666667, 0.666667, 1.0)))
    assert(got(("B", "A")) == ((2L, 0.666667, 1.0, 1.0)))
  }

  test("associationRules: maxBasket drops whole baskets before counting") {
    // cap 2 removes b1: bi = {b2:{A,B}, b3:{A,D}}; N=2, n(A)=2 n(B)=n(D)=1
    //   A→B: supp 1/2, conf 1/2, lift 2·1/(2·1)=1; B→A: conf 1, lift 1
    val got = Recommend.associationRules(baskets, "b", "i",
        minCount = 1, maxBasket = 2)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    assert(got.keySet ==
      Set(("A", "B"), ("B", "A"), ("A", "D"), ("D", "A")))
    assert(got(("A", "B")) == ((0.5, 0.5, 1.0)))
    assert(got(("B", "A")) == ((0.5, 1.0, 1.0)))
  }
}
