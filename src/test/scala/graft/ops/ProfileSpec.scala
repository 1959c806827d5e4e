package graft.ops

import graft.SparkSpec

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  test("profile counts rows/nulls/distincts and stringified min/max per column, one pass") {
    val df = Seq((1L, Some("a")), (2L, None), (3L, Some("a"))).toDF("id", "s")
    val out = Profile.profile(df, Seq("id", "s")).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5))))
      .toMap
    assert(out("id") == ((3L, 3L, 3L, "1", "3")))
    // nulls excluded from n_nonnull, n_distinct, and min/max
    assert(out("s") == ((3L, 2L, 1L, "a", "a")))
  }

  test("profile rejects an empty column list") {
    intercept[IllegalArgumentException] {
      Profile.profile(Seq(1).toDF("x"), Seq.empty)
    }
  }
}
