package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class QualitySpec extends SparkSpec {
  import spark.implicits._

  test("checkPredicates: one row per check, violations counted, null predicate = not bad") {
    val df = Seq(
      (1L, Some(10.0)), (2L, Some(-1.0)), (3L, None)
    ).toDF("id", "price")
    val r = Quality.checkPredicates(df, Seq(
      "price.positive" -> (col("price") <= 0), // null price -> null pred -> not counted
      "id.small" -> (col("id") > 100)))
      .collect().map(x => (x.getString(0), x.getLong(1), x.getLong(2), x.getBoolean(3)))
    assert(r.toSet == Set(
      ("price.positive", 3L, 1L, false),
      ("id.small", 3L, 0L, true)))
  }

  test("checkUnique counts rows in excess of one per key tuple") {
    val df = Seq((1, "a"), (1, "a"), (1, "b"), (2, "a")).toDF("k", "s")
    val r1 = Quality.checkUnique(df, "pair", Seq("k", "s")).head()
    assert((r1.getLong(1), r1.getLong(2), r1.getBoolean(3)) == (4L, 1L, false))
    val r2 = Quality.checkUnique(df.dropDuplicates(), "pair", Seq("k", "s")).head()
    assert((r2.getLong(2), r2.getBoolean(3)) == (0L, true))
  }

  test("checkRef: orphans counted, null FKs are not RI violations") {
    val child = Seq(Some(1), Some(2), Some(9), None).toDF("fk")
    val parent = Seq(1, 2, 3).toDF("pk")
    val r = Quality.checkRef(child, parent, "fk", "pk", "ri").head()
    assert((r.getString(0), r.getLong(1), r.getLong(2), r.getBoolean(3)) ==
      ("ri", 4L, 1L, false))
  }

  test("empty table: every check passes with n_bad = 0, not NULL") {
    val df = Seq((1L, 1.0)).toDF("id", "price").where(lit(false))
    val r = Quality.checkPredicates(df,
      Seq("price.positive" -> (col("price") <= 0)),
      uniques = Seq("id.unique" -> Seq("id")))
      .collect().map(x => (x.getString(0), x.getLong(1), x.getLong(2), x.getBoolean(3)))
    assert(r.toSet == Set(
      ("price.positive", 0L, 0L, true), ("id.unique", 0L, 0L, true)))
  }

  test("check names with quotes/backslashes pass through literally") {
    val df = Seq(1).toDF("x")
    val names = Quality.checkPredicates(df, Seq(
      "it's a 'test'" -> (col("x") < 0),
      """back\slash""" -> (col("x") < 0)))
      .select("check").as[String].collect().toSet
    assert(names == Set("it's a 'test'", """back\slash"""))
  }

  test("uniques fused into checkPredicates: one scan, correct counts") {
    val df = Seq((1, "a"), (1, "a"), (2, "b")).toDF("k", "s")
    val r = Quality.checkPredicates(df,
      Seq("s.not_null" -> col("s").isNull),
      uniques = Seq("k.unique" -> Seq("k"), "pair.unique" -> Seq("k", "s")))
      .collect().map(x => (x.getString(0), x.getLong(2), x.getBoolean(3)))
    assert(r.toSet == Set(
      ("k.unique", 1L, false), ("pair.unique", 1L, false),
      ("s.not_null", 0L, true)))
    // single scan: exactly one Aggregate over the table in the plan
    val scans = Quality.checkPredicates(df,
      Seq("s.not_null" -> col("s").isNull),
      uniques = Seq("k.unique" -> Seq("k")))
      .queryExecution.optimizedPlan.collect {
        case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => l
      }
    assert(scans.size == 1)
  }

  test("checkRef: duplicate parent keys do not inflate n_rows") {
    val child = Seq(Some(1), Some(2), None).toDF("fk")
    val parent = Seq(1, 1, 1, 2).toDF("pk")
    val r = Quality.checkRef(child, parent, "fk", "pk", "ri").head()
    assert((r.getLong(1), r.getLong(2), r.getBoolean(3)) == (3L, 0L, true))
  }

  test("report unions parts with the uniform schema") {
    val df = Seq(1).toDF("x")
    val r = Quality.report(Seq(
      Quality.checkUnique(df, "u", Seq("x")),
      Quality.checkPredicates(df, Seq("p" -> (col("x") < 0)))))
    assert(r.columns.toSeq == Seq("check", "n_rows", "n_bad", "pass"))
    assert(r.count() == 2)
  }

  test("kAnonymity reports only under-k combos; nulls group as matchable values") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = (Seq.fill(5)(("NY", "1980")) ++ Seq(("NY", "1990")) ++
      Seq(("SF", null), ("SF", null), ("LA", "1970")))
      .toDF("city", "yob")
    val got = Quality.kAnonymity(df, Seq("city", "yob"), 3L)
      .collect().map(r => (r.getString(0), Option(r.getString(1)),
        r.getAs[Long]("n"))).toSet
    // (NY,1980)x5 passes; the three small groups are the risk surface
    assert(got == Set(("NY", Some("1990"), 1L), ("SF", None, 2L),
      ("LA", Some("1970"), 1L)))
    assertThrows[IllegalArgumentException](
      Quality.kAnonymity(df, Seq("city"), 1L))
  }

  test("lDiversity flags homogeneous-sensitive groups even when k-anonymous") {
    import spark.implicits._
    val df = (Seq.fill(5)(("NY", "flu")) ++            // 5 rows, 1 diagnosis: leaks
      Seq(("SF", "flu"), ("SF", "cold"), ("SF", "cold")))  // diverse: passes
      .toDF("city", "dx")
    val got = Quality.lDiversity(df, Seq("city"), "dx", 2L)
      .collect().map(r => (r.getString(0), r.getAs[Long]("n"),
        r.getAs[Long]("n_distinct"))).toSet
    assert(got == Set(("NY", 5L, 1L)),
      "k-anonymous but homogeneous NY must flag; diverse SF must not")
  }

  test("tCloseness flags distribution skew; hand-checked ordinal EMD") {
    import spark.implicits._
    // global: a=5, b=1 (N=6, m=2, cum a=5 b=6)
    // G1 (4×a):   |4·6−5·4| + |4·6−6·4| = 4 → emd = 4/(4·6·1) = 1/6
    // G2 (a, b):  |1·6−5·2| + |2·6−6·2| = 4 → emd = 4/(2·6·1) = 1/3
    val df = (Seq.fill(4)(("g1", "a")) ++ Seq(("g2", "a"), ("g2", "b")))
      .toDF("grp", "dx")
    val got = Quality.tCloseness(df, Seq("grp"), "dx", t = 0.25)
      .collect().map(r => (r.getString(0), r.getAs[Long]("n"),
        r.getAs[Double]("emd"))).toSet
    assert(got == Set(("g2", 2L, 0.333333)),
      "G2's 50/50 vs the 83/17 global exceeds t=0.25; G1's 1/6 does not")
    // a group distributed exactly like the global has EMD 0 at every t
    val uniform = Seq(("x", "a"), ("x", "b"), ("y", "a"), ("y", "b"))
      .toDF("grp", "dx")
    assert(Quality.tCloseness(uniform, Seq("grp"), "dx", t = 0.001)
      .isEmpty, "group distribution == global must never flag")
    assertThrows[IllegalArgumentException](
      Quality.tCloseness(df, Seq("grp"), "dx", t = 1.5))
  }

  test("benford: cents-string digits, zero/negative excluded, hand-checked expectation") {
    import spark.implicits._
    val df = Seq(1.00, 1.50, 2.00, 9.99, 0.0, -3.0, 0.004).toDF("v")
    val got = Quality.benford(df, "v")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(got.keySet == Set(1L, 2L, 9L),
      "0, negative and sub-cent rows carry no first digit")
    assert(got(1L)._1 == 2L && got(2L)._1 == 1L && got(9L)._1 == 1L)
    // expected(1) = 4·log10(2) = 1.20412 → 1.2041 at 4 dp
    assert(got(1L)._2 == 1.2041, s"got ${got(1L)._2}")
    assert(got(9L)._3 > 5.0, "digit 9 at 25% observed vs 4.6% expected")
  }

  test("volumeAnomalies: element-pick median/MAD, spike flagged") {
    import org.apache.spark.sql.functions.col
    // day counts [10, 10, 11, 50, 10]: median 10, deviations
    // [0,0,1,40,0] → MAD 0, so ANY deviation flags (the integer-data
    // semantics of k·MAD with MAD = 0)
    def day(d: Int, n: Int) = (1 to n).map(_ => s"2024-02-0$d 08:00:00")
    val ev = (day(1, 10) ++ day(2, 10) ++ day(3, 11) ++ day(4, 50) ++
      day(5, 10)).toDF("t")
      .select(col("t").cast("timestamp").as("ts"))
    val got = Quality.volumeAnomalies(ev, "ts")
      .as[(String, Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got("2024-02-04") == ((50L, 10L, 0L, true)))
    assert(got("2024-02-03") == ((11L, 10L, 0L, true)))
    assert(got("2024-02-01") == ((10L, 10L, 0L, false)))
    assert(got.size == 5)
  }

  test("fdViolations: only determinants with conflicting dependents surface") {
    val df = Seq((1L, "a"), (1L, "b"), (2L, "c"), (2L, "c"))
      .toDF("k", "y")
    val got = Quality.fdViolations(df, Seq("k"), "y")
      .as[(Long, Long, Long, String, String)].collect()
    assert(got.toSeq == Seq((1L, 2L, 2L, "a", "b")),
      s"key 2 holds the FD and must not appear: ${got.toSeq}")
    assertThrows[IllegalArgumentException](
      Quality.fdViolations(df, Nil, "y"))
  }

  test("completeness: null/empty/blank counted once each, non-strings null-only") {
    val df = Seq(
      (Some(1L), "ok"), (Some(2L), ""), (Some(3L), "  "),
      (None: Option[Long], null.asInstanceOf[String]))
      .toDF("id", "s")
    val got = Quality.completeness(df, Seq("id", "s"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(5)))).toMap
    assert(got("id") == ((4L, 1L, 0L, 0L, 0.75)))
    assert(got("s") == ((4L, 1L, 1L, 1L, 0.25)))
    assertThrows[IllegalArgumentException](Quality.completeness(df, Nil))
  }
}
