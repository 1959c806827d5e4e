package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Probabilistic record linkage (Fellegi & Sunter, "A theory for record
  * linkage", JASA 1969) — the classical entity-resolution scorer the
  * dedup family's similarity joins feed into when records carry FIELDS
  * rather than one text blob: each compared field contributes a
  * log-likelihood-ratio weight, ln(m/u) on agreement and
  * ln((1−m)/(1−u)) on disagreement (m = P(agree | same entity),
  * u = P(agree | different entities)), and the pair's match score is the
  * sum. Pairs above a threshold are links; the score is also the right
  * input for [[Dedup.connectedComponents]] grouping + [[Dedup
  * .goldenRecords]] fusion — this file completes that ER pipeline.
  *
  * Engine-parity discipline: m/u are CALLER-SUPPLIED PRIORS, so the four
  * per-field weights are compile-time double literals — the score is a
  * fixed-order sum of literals (IEEE-exact on any engine), never a
  * runtime transcendental. An oracle replays it by embedding the same
  * shortest-round-trip literals.
  *
  * Scale: candidate pairs come from an EQUALITY self-join on `blockKey`
  * (never all-pairs); block sizes bound the quadratic exactly as in
  * [[Dedup.ngramJaccardPairs]] — pick keys whose biggest block is known
  * bounded, or pre-cap with the same star-collapse armor. Agreement
  * tests and the literal sum are one codegen'd projection. */
object Linkage {

  /** One compared field: its column name and the (m, u) priors. */
  final case class FieldSpec(field: String, m: Double, u: Double) {
    require(m > u && m < 1.0 && u > 0.0,
      s"need 0 < u < m < 1 for a discriminating field, got m=$m u=$u")
    def agreeWeight: Double = math.log(m / u)
    def disagreeWeight: Double = math.log((1.0 - m) / (1.0 - u))
  }

  /** Blocked Fellegi–Sunter pair scoring over one frame (self-linkage):
    * candidate pairs share `blockKey` (a_id < b_id), each `fields` entry
    * adds its agreement/disagreement literal, and pairs scoring below
    * `threshold` drop. Returns (a_id, b_id, n_agree, score). Nulls never
    * agree (null ⇔ anything, including null, is a disagreement — the
    * conservative contract; use a sentinel upstream to opt out). */
  def selfLinkPairs(df: DataFrame, idCol: String, blockKey: Column,
                    fields: Seq[FieldSpec],
                    threshold: Double): DataFrame = {
    require(fields.nonEmpty, "at least one compared field")
    val cols = col(idCol).as("__id") +: fields.map(f => col(f.field))
    val base = df.select((blockKey.as("__blk") +: cols): _*)
    val a = base.select(col("__blk") +: col("__id").as("a_id") +:
      fields.map(f => col(f.field).as(s"__a_${f.field}")): _*)
    val b = base.select(col("__blk") +: col("__id").as("b_id") +:
      fields.map(f => col(f.field).as(s"__b_${f.field}")): _*)
    val agreeFlags = fields.map { f =>
      (col(s"__a_${f.field}") === col(s"__b_${f.field}"))
        .and(col(s"__a_${f.field}").isNotNull)
    }
    val nAgree = agreeFlags.map(fl => when(fl, 1L).otherwise(0L))
      .reduce(_ + _)
    val score = fields.zip(agreeFlags).map { case (f, fl) =>
      when(fl, lit(f.agreeWeight)).otherwise(lit(f.disagreeWeight))
    }.reduce(_ + _)
    a.join(b, Seq("__blk"))
      .where(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"), nAgree.as("n_agree"),
        Timeseries.r5(score).as("score"))
      .where(col("score") >= threshold)
  }
}
