package graft.ops

import graft.SparkSpec

class SkylineSpec extends SparkSpec {
  import spark.implicits._

  test("front2 matches the NOT-EXISTS dominance definition, incl. ties and duplicates") {
    // (m, x): minimize m, maximize x
    val rows = Seq(
      (1L, 10L, 5L),  // front
      (2L, 10L, 5L),  // exact duplicate of 1: neither dominates → both stay
      (3L, 12L, 7L),  // front (pricier but bigger)
      (4L, 12L, 6L),  // dominated by 3 (equal m, smaller x)
      (5L, 15L, 7L),  // dominated by 3 (pricier, same x)
      (6L, 9L, 1L),   // front (cheapest of all)
      (7L, 20L, 9L),  // front (biggest of all)
      (8L, 16L, 3L)   // dominated by 3
    ).toDF("id", "m", "x")
    val expected = {
      val data = rows.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      data.filter { case (_, m, x) => !data.exists { case (_, m2, x2) =>
        m2 <= m && x2 >= x && (m2 < m || x2 > x) } }.map(_._1).toSet
    }
    // every bucket resolution must give the same exact answer
    for (b <- Seq(1, 2, 64)) {
      val got = Skyline.front2(rows, "m", "x", buckets = b)
        .select("id").as[Long].collect().toSet
      assert(got == expected, s"buckets=$b: got $got expected $expected")
    }
    assert(expected == Set(1L, 2L, 3L, 6L, 7L))
  }

  test("front2 on a degenerate single-value minCol keeps only the max of maxCol") {
    val rows = Seq((1L, 5L, 3L), (2L, 5L, 9L), (3L, 5L, 9L)).toDF("id", "m", "x")
    val got = Skyline.front2(rows, "m", "x").select("id").as[Long].collect().toSet
    assert(got == Set(2L, 3L))
    assertThrows[IllegalArgumentException](Skyline.front2(rows, "m", "x", 0))
  }
}
