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
  * (never all-pairs), and block sizes bound the quadratic ONLY while the
  * cap holds — so blocks above `maxBlock` collapse to a star around the
  * block's min-id representative (the [[Dedup.signaturePairs]] armor):
  * pair count for an over-cap block is k−1 instead of k²/2, so one
  * skewed key (a dominant brand, an empty field in the block key) can
  * no longer turn the job into a runaway quadratic stage. Recall trade,
  * same as the signature path: members of an over-cap block are only
  * scored against the representative. Blocks at or under the cap take
  * the exact all-pairs-in-block path. Agreement tests and the literal
  * sum are one codegen'd projection. */
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
                    threshold: Double,
                    maxBlock: Int = 10000): DataFrame = {
    require(fields.nonEmpty, "at least one compared field")
    require(maxBlock >= 2, s"maxBlock must be >= 2, got $maxBlock")
    val cols = col(idCol).as("__id") +: fields.map(f => col(f.field))
    // a plain pruned projection — unlike signaturePairs' exploded band
    // table there is no row inflation to cache, so the operator stays a
    // single LAZY declarative plan (scan reuse, runtime broadcast of the
    // block stats, and skew handling are AQE's call)
    val base = df.select((blockKey.as("__blk") +: cols): _*)
    // block size + min-id representative (id AND its compared fields via
    // one min-struct) by aggregate + join-back, never a window over the
    // block key: the degenerate block must not serialize through one
    // WindowExec task — same skew armor as [[Dedup.signaturePairs]]
    val stats = base.groupBy("__blk")
      .agg(count(lit(1)).as("__bsz"),
        min(struct(col("__id") +: fields.map(f => col(f.field)): _*))
          .as("__r"))
    val sized = base.join(stats, Seq("__blk"))

    def scored(pairs: DataFrame): DataFrame = {
      val agreeFlags = fields.map { f =>
        (col(s"__a_${f.field}") === col(s"__b_${f.field}"))
          .and(col(s"__a_${f.field}").isNotNull)
      }
      val nAgree = agreeFlags.map(fl => when(fl, 1L).otherwise(0L))
        .reduce(_ + _)
      val score = fields.zip(agreeFlags).map { case (f, fl) =>
        when(fl, lit(f.agreeWeight)).otherwise(lit(f.disagreeWeight))
      }.reduce(_ + _)
      pairs.select(col("a_id"), col("b_id"), nAgree.as("n_agree"),
          Timeseries.r5(score).as("score"))
        .where(col("score") >= threshold)
    }

    // exact path: all pairs within blocks at or under the cap
    val small = sized.where(col("__bsz") <= maxBlock)
    val a = small.select(col("__blk") +: col("__id").as("a_id") +:
      fields.map(f => col(f.field).as(s"__a_${f.field}")): _*)
    val b = small.select(col("__blk") +: col("__id").as("b_id") +:
      fields.map(f => col(f.field).as(s"__b_${f.field}")): _*)
    val exact = scored(a.join(b, Seq("__blk"))
      .where(col("a_id") < col("b_id")))
    // star path: over-cap blocks compare members against the block's
    // min-id representative only — k-1 pairs, not k²/2; a_id < b_id
    // holds by construction (the representative is the block minimum)
    val star = scored(sized
      .where(col("__bsz") > maxBlock && col("__id") =!= col("__r.__id"))
      .select(col("__r.__id").as("a_id") +: col("__id").as("b_id") +:
        fields.flatMap(f => Seq(
          col(s"__r.${f.field}").as(s"__a_${f.field}"),
          col(f.field).as(s"__b_${f.field}"))): _*))
    exact.union(star)
  }
}
