package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Encoding-robust event-time arithmetic.
  *
  * The corpus has shipped `events.ts` in two physical encodings across
  * regenerations: parquet TIMESTAMP(NANOS) (read as a nanos long under
  * `spark.sql.legacy.parquet.nanosAsLong`) and TIMESTAMP_NTZ(micros).
  * [[graft.io.Sources.normalizeTs]] canonicalizes scans to session-zone
  * TIMESTAMP, but operator code must not silently break if handed a frame
  * that skipped the source layer — `unix_micros` throws DATATYPE_MISMATCH
  * on TIMESTAMP_NTZ, and `ntz.cast("long")` is equally rejected. Every
  * micros/seconds extraction therefore routes through these two helpers,
  * which cast to TIMESTAMP first (a no-op on TIMESTAMP; on NTZ it
  * interprets the wall-clock in the session zone — all graft sessions pin
  * `spark.sql.session.timeZone=UTC`, making the cast exact and the oracle's
  * `CAST(ts AS TIMESTAMP)` its literal DuckDB twin).
  */
object Time {

  /** Microseconds since epoch from TIMESTAMP or TIMESTAMP_NTZ. */
  def tsMicros(c: Column): Column = unix_micros(c.cast(TimestampType))

  /** Whole seconds since epoch (floor, like `CAST(ts AS LONG)` on a
    * TIMESTAMP) from TIMESTAMP or TIMESTAMP_NTZ. */
  def tsSeconds(c: Column): Column = c.cast(TimestampType).cast(LongType)
}
