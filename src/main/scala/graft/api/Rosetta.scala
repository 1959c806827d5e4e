package graft.api

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.Relational._
import graft.ops.Reshape._

/** Q8 `translate` — the crosswalk ("rosetta stone") join engine
  * (SURVEY.md §2.8; etl_io.py:877-941).
  *
  * Maps user data between coding systems through a crosswalk table:
  * project the (left, right) mapping pair, null-drop + dedup so the join
  * doesn't fan out on duplicate mapping rows (J5, etl_io.py:922), explode
  * any list-valued side (R3 — the reference's per-row `ast.literal_eval`
  * driver loop, etl_io.py:924-934, becomes a distributed generator), join
  * the data through the left code (J2), and optionally bridge-join a second
  * dataset on the right code (J3, etl_io.py:938-939).
  *
  * Scale posture: crosswalks are code books (bounded) → broadcast for
  * `inner`/`left`, so the primary data never shuffles for the mapping join;
  * `right`/`outer` modes cannot broadcast-hash (the crosswalk is a preserved
  * side) and fall back to the planner's choice. The optional bridge join
  * against a second dataset is left to Catalyst/AQE (it may be fact-sized).
  */
object Rosetta {

  def translate(
      data: DataFrame,
      stone: DataFrame,
      left: String,
      right: String,
      how: String = "inner",
      data2: Option[DataFrame] = None,
      listCols: Set[String] = Set.empty): DataFrame = {
    require(Seq("inner", "left", "right", "outer").contains(how),
      s"how must be inner|left|right|outer, got '$how'")
    val pairs0 = dedupPairs(stone, left, right)
    val exploded = Seq(left, right).filter(listCols.contains)
      .foldLeft(pairs0)((d, c) => explodePyList(d, c))
    // overlapping list cells reintroduce duplicate (left, right) pairs
    // AFTER the explode (['a','b'] and ['b','c'] on the same left code both
    // emit 'b') — re-dedup so the J5 no-fan-out guarantee holds for the
    // EXPANDED pairs, not just the raw cells
    val pairs = if (listCols.isEmpty) exploded else exploded.dropDuplicates()
    // Broadcast the (bounded, code-book-sized) crosswalk only for join modes
    // that can actually use a broadcast-hash join: for `right`/`outer` the
    // crosswalk is a preserved side, Spark would silently ignore the hint and
    // shuffle — so don't claim otherwise, just let the planner pick.
    val hinted = if (how == "inner" || how == "left") broadcast(pairs) else pairs
    val joined = data.join(hinted, Seq(left), how)
    // data2 is user data (possibly fact-sized): no broadcast hint — let
    // Catalyst/AQE pick broadcast vs shuffled per actual size.
    data2 match {
      case Some(d2) => joined.join(d2, Seq(right), how)
      case None     => joined
    }
  }
}
