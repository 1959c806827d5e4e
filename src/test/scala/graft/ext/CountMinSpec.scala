package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CountMinSpec extends SparkSpec {
  import spark.implicits._

  private val df = (Seq.fill(30)("a") ++ Seq.fill(7)("b") ++
    Seq.fill(1)("c") ++ Seq.fill(12)("d")).toDF("k")

  test("estimates never undercount and are exact without collisions") {
    val out = CountMin.estimateVsTruth(df, "k", width = 1024, depth = 4)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.length == 4)
    // the defining guarantee: est >= true for EVERY key
    assert(out.forall { case (_, t, e) => e >= t })
    // 4 keys into 1024 buckets x 4 rows: a collision in all 4 rows is
    // (4/1024)^4-improbable and deterministic — with these keys there is
    // none, so every estimate is exact
    assert(out.forall { case (_, t, e) => e == t })
  }

  test("sketch is constant-size and mass-preserving per depth row") {
    val sk = CountMin.build(df, "k", width = 8, depth = 3).collect()
    assert(sk.length <= 8 * 3)
    // every depth row sees every input row exactly once
    val perDepth = sk.groupBy(_.getInt(0)).view.mapValues(_.map(_.getLong(2)).sum)
    assert(perDepth.toMap == Map(0 -> 50L, 1 -> 50L, 2 -> 50L))
  }

  test("unseen keys return est_n = 0 (empty buckets count as zero, keys never vanish)") {
    val sketch = CountMin.build(df, "k", width = 1024, depth = 4)
    // "zzz" was never built in: with 4 keys in 1024 buckets at least one
    // of its 4 depth buckets is empty, so the min must be 0 — and the
    // key must still appear in the output (left join, not inner)
    val probe = Seq("zzz", "a").toDF("k")
    val got = CountMin.estimate(sketch, probe, "k", width = 1024, depth = 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got("zzz") == 0L, s"unseen key should estimate 0: $got")
    assert(got("a") == 30L)
  }

  test("tiny width forces collisions: still an upper bound, never under") {
    val out = CountMin.estimateVsTruth(df, "k", width = 2, depth = 2)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(out.forall { case (t, e) => e >= t })
  }
}
