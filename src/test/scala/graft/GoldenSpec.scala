package graft

import org.apache.spark.sql.functions.col
import graft.SparkSpec

/** Golden-output regression: committed snapshots of oracle-verified results
  * at sf0.001 (SURVEY §5.4). These catch semantic drift in the composite
  * pipelines without needing the DuckDB oracle in the loop. */
class GoldenSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def normalized(name: String): Array[String] = {
    val df = SparkEntry.queries(name)(spark, dir)
    val cols = df.columns.sorted
    df.select(cols.map(col): _*)
      .orderBy(cols.map(col): _*)
      .collect()
      .map(_.toSeq.map {
        case d: Double => f"$d%.6f"
        case l: Long   => f"${l.toDouble}%.6f"
        case i: Int    => f"${i.toDouble}%.6f"
        case v => String.valueOf(v)
      }.mkString("|"))
  }

  private def golden(name: String): Array[String] = {
    val src = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream(s"/golden/$name.csv"), "UTF-8")
    try {
      src.getLines().drop(1).map { line =>
        line.split(",", -1).map { cell =>
          // re-format numerics the same way as `normalized`
          try f"${cell.toDouble}%.6f"
          catch { case _: NumberFormatException => cell }
        }.mkString("|")
      }.toArray.sorted
    } finally src.close()
  }

  for (q <- Seq("a1_groupsum", "q3_awards", "q8_translate", "dedup_near"))
    test(s"$q matches its committed sf0.001 golden snapshot") {
      val actual = normalized(q).sorted
      val expected = golden(q)
      assert(actual.length == expected.length,
        s"row count ${actual.length} != golden ${expected.length}")
      actual.zip(expected).zipWithIndex.foreach { case ((a, e), i) =>
        assert(a == e, s"row $i differs:\n  actual: $a\n  golden: $e")
      }
    }
}
