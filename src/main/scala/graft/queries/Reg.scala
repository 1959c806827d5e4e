package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered query: a Spark pipeline plus (where SQL-expressible) the
  * equivalent ANSI SQL the driver runs in DuckDB over the same parquet
  * tables. Column names/aliases MUST match between the two — the driver's
  * compare sorts columns by name before hashing values.
  *
  * Oracle-parity rules used throughout the registry:
  *  - exact-decimal sums on BOTH sides (`dsum` ↔ `CAST(SUM(CAST(x AS
  *    DECIMAL(25,2))) AS DOUBLE)`) so parallel vs sequential accumulation
  *    cannot differ in the low double bits;
  *  - float-order-dependent aggregates (product, cosine) are rounded to a
  *    tolerance far above accumulation error before comparison;
  *  - every top-k/window ordering carries a unique tiebreak key;
  *  - timestamps leave the result set as formatted strings.
  */
final case class Reg(
    name: String,
    oracle: Option[String])(
    val run: (SparkSession, String) => DataFrame)
