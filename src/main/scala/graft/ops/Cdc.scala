package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-capture operators: batch MERGE (upsert/delete apply) and
  * type-2 slowly-changing-dimension builds.
  *
  * The reference rebuilds tables wholesale each vintage (`etl_io.py:203-219`
  * copies every table; version bumps replace files). At 100 TB a rebuild is
  * the wrong shape — the lakehouse answer is applying a (much smaller)
  * change log to the standing table. Both operators here are pure
  * DataFrame plans: the MERGE is a window + anti-join + union (two key
  * shuffles, each sized by its own input, no driver materialization), and
  * the SCD2 build is a single window pass.
  */
object Cdc {

  /** Apply a change log to a base table — the deterministic batch core of
    * `MERGE INTO`:
    *
    *  - `changes` carries `key`, `opCol` ∈ {"U","D"}, a monotone `seqCol`,
    *    and the base's payload columns ("U" = insert-or-replace, "D" =
    *    delete; payload on a "D" is ignored).
    *  - Per key, the change with the highest `seqCol` wins (`(key, seq)`
    *    must be unique — standard CDC log contract).
    *  - Base rows with no surviving change pass through; a "D" on an
    *    absent key is a no-op; a "U" on an absent key inserts.
    *
    * Plan shape: one window over `changes` (latest per key), one anti-join
    * of `base` against the changed keys, one union. The window and
    * anti-join shuffle on the same key, and `changes` is typically ≪
    * `base`, so the dominant cost is one pass over `base` — the same
    * asymptotics Delta/Iceberg MERGE targets.
    */
  def applyChanges(base: DataFrame, changes: DataFrame, key: String,
                   opCol: String = "op", seqCol: String = "seq"): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(seqCol).desc)
    // malformed ops are dropped BEFORE latest-per-key: an unknown op (e.g.
    // lowercase 'u', null) must not claim a key — it would suppress the
    // base row via the anti-join while inserting nothing: silent data loss
    val latest = changes.where(col(opCol).isin("U", "D"))
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1).drop("__rn")
    // null-SAFE anti-join: a plain equi-anti never matches a null key, so a
    // "U" on key=null would duplicate instead of replace and a "D" would
    // never delete (the window above already groups nulls as one key)
    val survivors = base.join(latest.select(col(key).as("__ck")),
      base(key) <=> col("__ck"), "left_anti")
    val upserts = latest.where(col(opCol) === "U")
      .select(base.columns.map(col).toIndexedSeq: _*)
    survivors.unionByName(upserts)
  }

  /** Build a type-2 slowly-changing dimension from a change log: one output
    * row per state, valid over [valid_from, valid_to) with an open
    * (`valid_to` NULL, `is_current` true) final interval per key.
    *
    * `(key, tsCol)` must be unique (pre-aggregate colliding timestamps —
    * the registered query shows the shape). Single window pass: one
    * shuffle on `key`, per-key ordered scan; no self-join, no driver
    * state — the shape that holds when the log is 10^11 rows.
    */
  def scd2(changeLog: DataFrame, key: String, tsCol: String): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(tsCol))
    changeLog
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
      .drop(tsCol)
  }

  /** Reconstruct the table state AS OF `asOf` from a full change log —
    * the time-travel read lakehouse formats answer from their version
    * history, here answered from the raw CDC stream: per key, the latest
    * change at or before `asOf` wins; if it is an upsert ("U") the key is
    * alive with that payload, if a delete ("D") the key is absent. A key
    * whose first change postdates `asOf` never existed yet.
    *
    * `(key, tsCol)` must be unique (same contract as [[scd2]]; pre-
    * aggregate colliding timestamps). Plan: the time predicate prunes the
    * log scan (partition-prunable on date-partitioned logs), then ONE
    * partial-aggregable per-key struct-max — no window, no self-join, so
    * the shuffle carries one row per surviving key, not the log. */
  def snapshotAsOf(changeLog: DataFrame, key: String, tsCol: String,
                   asOf: Column, opCol: String = "op"): DataFrame = {
    val payload = changeLog.columns
      .filterNot(c => c == key || c == tsCol || c == opCol)
    val pick = changeLog.where(col(tsCol) <= asOf)
      .groupBy(col(key))
      .agg(max(struct(col(tsCol) +: col(opCol) +: payload.map(col)
        .toIndexedSeq: _*)).as("__last"))
    pick.where(col(s"__last.$opCol") === "U")
      .select(col(key) +: col(s"__last.$tsCol").as(tsCol) +:
        payload.map(c => col(s"__last.$c").as(c)).toIndexedSeq: _*)
  }

  /** Seq-RESPECTING merge with TOMBSTONES: like [[applyChanges]], but the
    * target carries its own `opCol`/`seqCol` and an incoming change only
    * applies when its seq is strictly higher than the standing row's.
    * Deletes are RETAINED as tombstone rows (op = "D", seq kept): without
    * the tombstone, a late-arriving batch holding an OLDER "U" for a
    * deleted key would re-insert it, because the table would have no seq
    * left to compare against. With it, the merge is ASSOCIATIVE AND
    * COMMUTATIVE over arbitrary splits and orderings of the change log —
    * applying microbatches in any order lands on the same table as one
    * big batch, exactly the property a STREAMING CDC sink needs (file and
    * Kafka sources promise neither batch boundaries nor global seq order
    * across batches). Read the live table with `op = 'U'`; production
    * sinks compact tombstones away after a retention window, once no
    * straggler can predate them.
    *
    * `target` schema: key, opCol, seqCol, payload (base rows carry
    * op = "U"). `changes` schema: the same. One window over the batch +
    * one full-outer join on the key — both shuffles sized by their own
    * inputs; the target never rewrites more than (its size + batch). */
  def applyChangesVersioned(target: DataFrame, changes: DataFrame,
                            key: String, opCol: String = "op",
                            seqCol: String = "seq"): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(seqCol).desc)
    val latest = changes.where(col(opCol).isin("U", "D"))
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1).drop("__rn")
    val nonKey = target.columns.filterNot(_ == key)
    val c = latest.select(col(key).as("__ck") +:
      nonKey.map(p => col(p).as(s"__c_$p")): _*)
    val joined = target.join(c, col(key) <=> col("__ck"), "full_outer")
    // presence tests use the OP columns, never the key: `latest` guarantees
    // a change-side op ∈ {U, D} and a real target row always carries one,
    // while the KEY VALUE itself may legitimately be null (and the
    // null-safe join makes null keys match). Key-nullness tests misread a
    // matched null-key pair as "row absent" on both sides — an older
    // change could clobber a newer null-key target row, and a null-key
    // change could never land at all.
    val changePresent = col(s"__c_$opCol").isNotNull
    val newer = col(opCol).isNull || col(s"__c_$seqCol") > col(seqCol)
    val keepT = joined.where(!changePresent || !newer)
      .select(target.columns.map(col).toIndexedSeq: _*)
    val takeC = joined.where(changePresent && newer)
      .select(col("__ck").as(key) +:
        nonKey.map(p => col(s"__c_$p").as(p)): _*)
    keepT.unionByName(takeC)
  }
}
