package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered query: a Spark pipeline plus (where SQL-expressible) the
  * equivalent ANSI SQL the driver runs in DuckDB over the same parquet
  * tables. Column names/aliases MUST match between the two — the driver's
  * compare sorts columns by name before hashing values.
  *
  * Oracle-parity rules used throughout the registry:
  *  - exact integer-cents sums on BOTH sides (`dsum` ↔
  *    `CAST(SUM(CAST(ROUND(x*100) AS BIGINT)) AS DOUBLE)/100.0`) so parallel
  *    vs sequential accumulation cannot differ in the low double bits — the
  *    cents total is an integer, identical on 1 or 1000 executors;
  *  - float-order-dependent aggregates (product, cosine) are rounded to a
  *    tolerance far above accumulation error before comparison;
  *  - every top-k/window ordering carries a unique tiebreak key;
  *  - timestamps leave the result set as formatted strings.
  *
  * `kind` partitions the registry for the bench report:
  *  - "headline" — the shipped operator; its plan is the 100 TB posture.
  *  - "arm"     — a deliberately-worse exact sibling that exists to ORACLE a
  *    headline approximation (e.g. `dedup_ngram` prefix-blocking proves
  *    `dedup_ngram_lsh`), or a measurement harness whose cost is dominated
  *    by a labeled brute-force baseline (`ann_recall`); correct, but a named
  *    scale hazard (SCALE.md) whose cost must not be read as engine
  *    throughput.
  *  - "sketch"  — rows-only by nature (HLL/KLL): no cross-engine hash oracle
  *    can exist; gated by a ScalaTest property instead.
  */
final case class Reg(
    name: String,
    oracle: Option[String],
    kind: String = "headline")(
    val run: (SparkSession, String) => DataFrame)
