package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

class RankSpec extends SparkSpec {
  import spark.implicits._

  private val rows = Seq(
    ("cherry", 3L), ("apple", 1L), ("apple", 2L), ("banana", 9L),
    ("", 4L), ("zebra", 5L), ("cider", 6L), ("aardvark", 7L), ("app", 8L)
  ).toDF("k", "id")

  test("globalRank equals the single-partition row_number ranking") {
    val naive = rows
      .withColumn("rank", row_number().over(
        Window.orderBy(col("k"), col("id"))).cast("long"))
      .select("k", "id", "rank").collect().map(r => (r.getString(0),
        r.getLong(1)) -> r.getLong(2)).toMap
    val got = Rank.globalRank(rows.repartition(7), col("k"), col("id"),
        substring(col("k"), 1, 1))
      .select("k", "id", "rank").collect().map(r => (r.getString(0),
        r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == naive)
  }

  test("globalRank is deterministic across partition layouts") {
    val a = Rank.globalRank(rows.repartition(1), col("k"), col("id"),
      substring(col("k"), 1, 2)).select("id", "rank").as[(Long, Long)]
      .collect().toSet
    val b = Rank.globalRank(rows.repartition(8), col("k"), col("id"),
      substring(col("k"), 1, 2)).select("id", "rank").as[(Long, Long)]
      .collect().toSet
    assert(a == b)
  }

  test("surrogateIds: dense 1..N in key order, nulls dropped, dups collapsed") {
    val df = Seq(Some("b"), Some("a"), None, Some("c"), Some("a"))
      .toDF("k")
    val got = Rank.surrogateIds(df, "k").as[(String, Long)].collect().toSet
    assert(got == Set(("a", 1L), ("b", 2L), ("c", 3L)))
  }

  test("globalRank single-partition window touches bucket counts, not rows") {
    // the only unpartitioned window in the plan must sit above the
    // per-bucket aggregate (tiny frame), never above the input rows
    val plan = Rank.globalRank(rows, col("k"), col("id"),
      substring(col("k"), 1, 1)).queryExecution.optimizedPlan.toString
    val windows = plan.linesIterator.filter(_.contains("windowspecdefinition()"))
    assert(!windows.exists(_.contains("id#")),
      s"global window ranges over input rows:\n$plan")
  }
}
