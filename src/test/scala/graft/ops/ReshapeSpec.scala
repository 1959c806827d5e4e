package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.ops.Reshape._

class ReshapeSpec extends SparkSpec {
  import spark.implicits._

  test("pivotWide turns long rows into one row per index with value columns") {
    val long = Seq(("s1", "e1", 1.0), ("s1", "e2", 2.0), ("s2", "e1", 3.0))
      .toDF("soc", "elem", "v")
    val wide = pivotWide(long, Seq("soc"), "elem", Seq("e1", "e2"), "v")
    val r = wide.orderBy("soc").collect()
    assert(wide.columns.toSeq == Seq("soc", "e1", "e2"))
    assert(r(0).getDouble(1) == 1.0 && r(0).getDouble(2) == 2.0)
    assert(r(1).getDouble(1) == 3.0 && r(1).isNullAt(2))
  }

  test("assertNoDuplicatePairs raises on duplicate (index, pivot) pairs — pandas pivot contract (etl_io.py:823)") {
    val dup = Seq(("s1", "e1", 1.0), ("s1", "e1", 2.0)).toDF("soc", "elem", "v")
    intercept[IllegalArgumentException] {
      assertNoDuplicatePairs(dup, Seq("soc"), "elem")
    }
  }

  test("assertNoDuplicatePairs passes on unique pairs") {
    val ok = Seq(("s1", "e1", 1.0), ("s1", "e2", 2.0)).toDF("soc", "elem", "v")
    assertNoDuplicatePairs(ok, Seq("soc"), "elem") // must not throw
  }

  test("oneHot handles pivot values containing dots (O*NET element ids like 1.A.1.a)") {
    val long = Seq(("s1", "1.A.1.a"), ("s2", "2.B.2.b")).toDF("soc", "elem")
    val out = oneHot(long, Seq("soc"), "elem", Seq("1.A.1.a", "2.B.2.b"))
      .orderBy("soc").collect()
    assert(out(0).getBoolean(1) && !out(0).getBoolean(2))
    assert(!out(1).getBoolean(1) && out(1).getBoolean(2))
  }

  test("pivotCount fills absent cells with 0, including dotted column names") {
    val long = Seq(("s1", "x.y"), ("s1", "x.y")).toDF("soc", "elem")
    val out = pivotCount(long, Seq("soc"), "elem", Seq("x.y", "z.w")).collect()
    assert(out.head.getLong(1) == 2L && out.head.getLong(2) == 0L)
  }

  test("explodePyList expands python-repr list cells (etl_io.py:927-934)") {
    val df = Seq((1, "['11.0101', '11.02']"), (2, "['22.03']")).toDF("id", "cips")
    val out = explodePyList(df, "cips").orderBy("id", "cips")
      .collect().map(r => (r.getInt(0), r.getString(1)))
    assert(out.toSeq == Seq((1, "11.0101"), (1, "11.02"), (2, "22.03")))
  }

  test("explodePyList FAILS LOUDLY on unparseable and NULL cells (reference raises too)") {
    // apostrophes inside elements corrupt the quote-normalization rewrite;
    // the cell becomes unparseable and must raise, not silently drop the row
    val bad = Seq((1, "['o'brien', 'x']")).toDF("id", "vals")
    intercept[Exception] { explodePyList(bad, "vals").collect() }
    val nul = Seq((1, null.asInstanceOf[String])).toDF("id", "vals")
    intercept[Exception] { explodePyList(nul, "vals").collect() }
  }

  test("pivotCount survives pivot values containing backticks") {
    val df = Seq(("a", "x`y"), ("a", "x`y"), ("b", "plain")).toDF("k", "v")
    val out = pivotCount(df, Seq("k"), "v", Seq("x`y", "plain"))
      .orderBy("k").collect()
    assert(out.map(_.getLong(1)).toSeq == Seq(2L, 0L)) // x`y column
  }

  test("meltView unpivots wide back to long (inverse of pivotWide)") {
    val wide = Seq(("s1", 1.0, 2.0)).toDF("soc", "e1", "e2")
    val long = meltView(wide, Seq("soc"), Seq("e1", "e2"), "elem", "v")
    assert(long.count() == 2)
    val back = pivotWide(long, Seq("soc"), "elem", Seq("e1", "e2"), "v")
    assert(back.collect().head == wide.collect().head)
  }
}
