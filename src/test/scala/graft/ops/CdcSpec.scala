package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CdcSpec extends SparkSpec {
  import spark.implicits._

  test("applyChanges: latest seq wins, deletes drop, inserts land, absent-key delete is a no-op") {
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val changes = Seq(
      (1L, "U", 1, "a1"), (1L, "U", 2, "a2"), // two updates: seq 2 wins
      (2L, "D", 1, null),                     // delete an existing key
      (4L, "U", 1, "d"),                      // insert a new key
      (5L, "D", 1, null)                      // delete an absent key: no-op
    ).toDF("k", "op", "seq", "v")
    val out = Cdc.applyChanges(base, changes, "k")
      .as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "a2", 3L -> "c", 4L -> "d"))
  }

  test("applyChanges: a delete at the latest seq beats an earlier update") {
    val base = Seq((1L, "a")).toDF("k", "v")
    val changes = Seq((1L, "U", 1, "a1"), (1L, "D", 2, null)).toDF("k", "op", "seq", "v")
    assert(Cdc.applyChanges(base, changes, "k").count() == 0)
  }

  test("applyChanges ignores malformed ops — the base row survives instead of vanishing") {
    val base = Seq((1L, "a")).toDF("k", "v")
    val bad = Seq((1L, "u", 1, "x"), (1L, null, 2, "y")).toDF("k", "op", "seq", "v")
    assert(Cdc.applyChanges(base, bad, "k")
      .as[(Long, String)].collect().toSeq == Seq((1L, "a")))
  }

  test("applyChanges handles NULL keys: a null-key update replaces, a null-key delete deletes") {
    val base = Seq((Option(1L), "a"), (Option.empty[Long], "n")).toDF("k", "v")
    val upd = Seq((Option.empty[Long], "U", 1, "n2")).toDF("k", "op", "seq", "v")
    val afterU = Cdc.applyChanges(base, upd, "k")
      .as[(Option[Long], String)].collect().toSet
    assert(afterU == Set((Some(1L), "a"), (None, "n2")))
    val del = Seq((Option.empty[Long], "D", 1, null)).toDF("k", "op", "seq", "v")
    assert(Cdc.applyChanges(base, del, "k")
      .as[(Option[Long], String)].collect().toSet == Set((Some(1L), "a")))
  }

  test("scd2: abutting intervals per key, open current row, single-state key") {
    val log = Seq((1L, 10L, "x"), (1L, 20L, "y"), (1L, 30L, "z"), (2L, 5L, "q"))
      .toDF("k", "ts", "state")
    val rows = Cdc.scd2(log, "k", "ts")
      .select("k", "state", "valid_from", "valid_to", "is_current")
      .as[(Long, String, Long, Option[Long], Boolean)].collect().toSet
    assert(rows == Set(
      (1L, "x", 10L, Some(20L), false),
      (1L, "y", 20L, Some(30L), false),
      (1L, "z", 30L, None, true),
      (2L, "q", 5L, None, true)))
  }

  test("applyChangesVersioned is associative AND commutative over random batch splits") {
    val rnd = new scala.util.Random(7)
    val base = ((1L to 10L).map(k => (Option(k), "U", 0L, s"base$k")) :+
      ((Option.empty[Long], "U", 0L, "baseN")))
      .toDF("k", "op", "seq", "v")
    // random log: unique seqs, mixed U/D over 15 keys (5 insert-only) plus
    // a NULL key in the draw — the merge must version null-key rows like
    // any other key (the null-safe join makes them one logical key)
    val log = rnd.shuffle((1L to 60L).toList).map { seq =>
      (if (rnd.nextInt(8) == 0) Option.empty[Long]
       else Option(1L + rnd.nextInt(15)),
        if (rnd.nextInt(4) == 0) "D" else "U", seq, s"v$seq")
    }
    def snap(df: org.apache.spark.sql.DataFrame) =
      df.where(col("op") === "U").select("k", "seq", "v")
        .as[(Option[Long], Long, String)].collect().toSet
    val oneShot = snap(Cdc.applyChangesVersioned(
      base, log.toDF("k", "op", "seq", "v"), "k"))
    for (trial <- 1 to 3) {
      // partition the log into 4 batches, apply in SHUFFLED order —
      // tombstones must prevent older stragglers from resurrecting deletes
      val batches = rnd.shuffle(log.groupBy(_ => rnd.nextInt(4)).values.toList)
      val finalT = batches.foldLeft(base) { (t, b) =>
        Cdc.applyChangesVersioned(t, b.toDF("k", "op", "seq", "v"), "k")
          .localCheckpoint()
      }
      assert(snap(finalT) == oneShot, s"trial $trial")
    }
  }

  test("applyChangesVersioned: an older change never clobbers a newer NULL-key target row") {
    val target = Seq((Option.empty[Long], "U", 10L, "newer"))
      .toDF("k", "op", "seq", "v")
    val change = Seq((Option.empty[Long], "U", 5L, "older"))
      .toDF("k", "op", "seq", "v")
    val out = Cdc.applyChangesVersioned(target, change, "k")
      .select("seq", "v").as[(Long, String)].collect().toSeq
    assert(out == Seq((10L, "newer")))
  }

  test("applyChangesVersioned: a NEWER null-key change replaces the standing null-key row") {
    val target = Seq((Option.empty[Long], "U", 10L, "old"))
      .toDF("k", "op", "seq", "v")
    val change = Seq((Option.empty[Long], "U", 20L, "new"))
      .toDF("k", "op", "seq", "v")
    val out = Cdc.applyChangesVersioned(target, change, "k")
      .select("seq", "v").as[(Long, String)].collect().toSeq
    assert(out == Seq((20L, "new")))
  }

  test("applyChangesVersioned: a null-key INSERT lands (no all-null garbage row)") {
    val target = Seq((Option(1L), "U", 1L, "a")).toDF("k", "op", "seq", "v")
    val change = Seq((Option.empty[Long], "U", 5L, "n"))
      .toDF("k", "op", "seq", "v")
    val out = Cdc.applyChangesVersioned(target, change, "k")
      .select("k", "op", "seq", "v")
      .as[(Option[Long], String, Long, String)].collect().toSet
    assert(out == Set((Some(1L), "U", 1L, "a"), (None, "U", 5L, "n")))
  }

  test("snapshotAsOf: latest change <= T wins; deletes erase; later births absent") {
    val log = Seq(
      (1L, 10L, "U", "v1"), (1L, 20L, "D", "x"), (1L, 30L, "U", "v3"),
      (2L, 40L, "U", "late"), // born after T
      (3L, 5L, "U", "alive")
    ).toDF("k", "t", "op", "v")
    def at(ts: Long) = Cdc.snapshotAsOf(log, "k", "t", lit(ts))
      .as[(Long, Long, String)].collect().toSet
    // T=25: key 1's latest change is the delete — absent; key 2 unborn
    assert(at(25L) == Set((3L, 5L, "alive")))
    // T=35: key 1 re-inserted by the t=30 upsert
    assert(at(35L) == Set((1L, 30L, "v3"), (3L, 5L, "alive")))
    // T=45: everything alive
    assert(at(45L) ==
      Set((1L, 30L, "v3"), (2L, 40L, "late"), (3L, 5L, "alive")))
  }
}
