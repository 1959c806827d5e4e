package graft.api

import org.apache.spark.sql.functions._
import graft.SparkSpec

class OnetSpec extends SparkSpec {
  import spark.implicits._

  private val c = OnetCols("soc", "elem", "scale", "v")
  private lazy val long = Seq(
    ("s1", "e1", "IM", 2.0), ("s1", "e1", "LV", 3.0),
    ("s1", "e2", "IM", 4.0), ("s2", "e1", "IM", 5.0),
    ("s2", "e1", "LV", 0.5)).toDF("soc", "elem", "scale", "v")

  test("quantLong filters one scale and normalizes the projection (etl_io.py:814,821)") {
    val out = Onet.quantLong(long, c, Nil, "IM")
    assert(out.columns.toSeq == Seq("soc", "elem", "scale", "v"))
    assert(out.count() == 3)
    assert(out.where(col("scale") =!= "IM").count() == 0)
  }

  test("quantLong restricts to the SOC in-list") {
    assert(Onet.quantLong(long, c, Seq("s2"), "IM").count() == 1)
  }

  test("quantWide pivots elements to columns (etl_io.py:823-825)") {
    val out = Onet.quantWide(long, c, Nil, "IM", Seq("e1", "e2"))
      .orderBy("soc").collect()
    assert(out(0).getDouble(1) == 2.0 && out(0).getDouble(2) == 4.0)
    assert(out(1).getDouble(1) == 5.0 && out(1).isNullAt(2))
  }

  test("quantProduct multiplies scale rows per (soc, element) (etl_io.py:816-818)") {
    val out = Onet.quantProduct(long, c, Nil)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getDouble(2))).toMap
    assert(out(("s1", "e1")) == 6.0)  // 2.0 * 3.0
    assert(out(("s2", "e1")) == 2.5)  // 5.0 * 0.5
    assert(out(("s1", "e2")) == 4.0)  // single row
  }

  test("qualOneHot emits a boolean membership matrix (etl_io.py:870-871)") {
    val out = Onet.qualOneHot(long, c, Nil, Seq("e1", "e2"))
      .orderBy("soc").collect()
    assert(out(0).getBoolean(1) && out(0).getBoolean(2))
    assert(out(1).getBoolean(1) && !out(1).getBoolean(2))
  }
}
