package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class StatsSpec extends SparkSpec {
  import spark.implicits._

  test("chiSquare: independence gives 0, perfect association gives n") {
    // balanced independent 2x2: every (a, b) cell = 5 -> chi2 = 0
    val ind = (for { a <- Seq("x", "y"); b <- Seq("p", "q"); _ <- 1 to 5 }
      yield (a, b)).toDF("a", "b")
    val r0 = Stats.chiSquare(ind, col("a"), col("b")).head()
    assert(r0.getDouble(0) == 0.0 && r0.getLong(1) == 1L && r0.getLong(2) == 20L)
    // perfect association (a determines b): chi2 = n for a 2x2
    val dep = (Seq.fill(6)(("x", "p")) ++ Seq.fill(4)(("y", "q")))
      .toDF("a", "b")
    val r1 = Stats.chiSquare(dep, col("a"), col("b")).head()
    assert(math.abs(r1.getDouble(0) - 10.0) < 1e-6)
    // Cramér's V: 0 under independence, 1 under perfect association
    assert(r0.getDouble(3) == 0.0)
    assert(math.abs(r1.getDouble(3) - 1.0) < 1e-6)
  }

  test("ksTest: identical samples D=0, disjoint supports D=1, hand case exact") {
    val same = (Seq.fill(4)(("g1", 1.0)) ++ Seq.fill(4)(("g2", 1.0)) ++
      Seq.fill(2)(("g1", 2.0)) ++ Seq.fill(2)(("g2", 2.0))).toDF("g", "v")
    val r0 = Stats.ksTest(same, "v", "g", "g1", "g2").head()
    assert(r0.getLong(2) == 0L && r0.getDouble(3) == 0.0)
    val disjoint = (Seq(("g1", 1.0), ("g1", 2.0)) ++
      Seq(("g2", 5.0), ("g2", 6.0), ("g2", 7.0))).toDF("g", "v")
    val r1 = Stats.ksTest(disjoint, "v", "g", "g1", "g2").head()
    assert(r1.getDouble(3) == 1.0 && r1.getLong(2) == 6L) // 2*3
    // hand case: g1 = {1,2,3}, g2 = {2,3,3} -> max gap at v=1: |1*3-0*3|=3
    // v=2: |2*3-1*3|=3; v=3: 0 -> D = 3/9 = 1/3
    val hand = (Seq(("g1", 1.0), ("g1", 2.0), ("g1", 3.0)) ++
      Seq(("g2", 2.0), ("g2", 3.0), ("g2", 3.0))).toDF("g", "v")
    val r2 = Stats.ksTest(hand, "v", "g", "g1", "g2").head()
    assert(r2.getLong(2) == 3L)
    assert(math.abs(r2.getDouble(3) - 1.0 / 3) < 1e-6)
    // values outside either group are ignored entirely
    val extra = hand.union(Seq(("g3", 100.0)).toDF("g", "v"))
    assert(Stats.ksTest(extra, "v", "g", "g1", "g2").head().getLong(2) == 3L)
  }

  test("mannWhitney: hand case with midrank ties, symmetry, extremes") {
    // g1 = {1, 2}, g2 = {2, 3}: ranks 1, 2.5, 2.5, 4 -> R1 = 3.5,
    // U1 = 3.5 - 3 = 0.5 (one tie pair), auc = 0.5 / 4 = 0.125
    val hand = (Seq(("g1", 1.0), ("g1", 2.0)) ++
      Seq(("g2", 2.0), ("g2", 3.0))).toDF("g", "v")
    val r = Stats.mannWhitney(hand, "v", "g", "g1", "g2").head()
    assert(r.getLong(0) == 2L && r.getLong(1) == 2L)
    assert(r.getLong(2) == 1L) // 2*U1
    assert(math.abs(r.getDouble(3) - 0.125) < 1e-9)
    // swapped groups: auc' = 1 - auc (tie half splits symmetrically)
    val rs = Stats.mannWhitney(hand, "v", "g", "g2", "g1").head()
    assert(math.abs(rs.getDouble(3) - 0.875) < 1e-9)
    // complete separation: every g1 above g2 -> auc 1; identical -> 0.5
    val sep = (Seq(("g1", 10.0), ("g1", 11.0)) ++
      Seq(("g2", 1.0), ("g2", 2.0))).toDF("g", "v")
    assert(Stats.mannWhitney(sep, "v", "g", "g1", "g2").head().getDouble(3) == 1.0)
    val eq = (Seq(("g1", 5.0), ("g2", 5.0))).toDF("g", "v")
    assert(Stats.mannWhitney(eq, "v", "g", "g1", "g2").head().getDouble(3) == 0.5)
  }
}
