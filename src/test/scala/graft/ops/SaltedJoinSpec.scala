package graft.ops

import graft.SparkSpec
import graft.ops.Relational._

class SaltedJoinSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin equals a plain equi-join (skew spread, same result)") {
    // heavily skewed: 90% of facts share one key
    val facts = ((1 to 900).map(i => (1, i.toLong)) ++
      (1 to 100).map(i => (i % 7 + 2, 1000L + i))).toDF("k", "uid")
    val dims = (1 to 10).map(i => (i, s"d$i")).toDF("k", "dval")
    val plain = facts.join(dims, Seq("k")).select("k", "uid", "dval")
    val salted = saltedJoin(facts, dims, "k", "uid", buckets = 8)
      .select("k", "uid", "dval")
    assert(salted.count() == plain.count())
    assert(salted.except(plain).isEmpty && plain.except(salted).isEmpty)
  }
}
