package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Classical hypothesis-test statistics as distributed aggregations — the
  * data-validation layer above [[Quality]]'s rule checks and the drift
  * monitors (`drift_kl`/`drift_psi`): is a categorical association real
  * (chi-square), did a numeric distribution shift between cohorts
  * (Kolmogorov–Smirnov)? Statistics only, no p-values: the incomplete
  * gamma / KS tail functions are engine-specific transcendentals, while
  * the statistics themselves are exact-integer or IEEE-deterministic
  * arithmetic both engines reproduce bit-for-bit.
  */
object Stats {

  /** Pearson chi-square statistic of independence for two categorical
    * columns, one row: (chi2, dof, n). Observed counts, marginals, and N
    * are exact integers; each cell's (o−e)²/e is IEEE double arithmetic
    * (no transcendental), summed over CELLS — the contingency table, not
    * the data — and rounded to 6 (the [[Profile.corrMatrix]] precedent
    * for cross-partition accumulation order).
    *
    * Plan: one partial-aggregable (a, b) count (the only pass over data);
    * marginals reduce FROM the cell table and broadcast back. Cell count
    * is |A|·|B| — if that is not small, independence testing is the wrong
    * tool anyway. */
  def chiSquare(df: DataFrame, aCol: Column, bCol: Column): DataFrame = {
    val o = df.select(aCol.as("__a"), bCol.as("__b"))
      .groupBy("__a", "__b").agg(count(lit(1)).as("__n"))
    val ra = o.groupBy("__a").agg(sum(col("__n")).as("__ra"))
    val rb = o.groupBy("__b").agg(sum(col("__n")).as("__rb"))
    val tot = o.agg(sum(col("__n")).as("__t"),
      countDistinct(col("__a")).as("__ka"),
      countDistinct(col("__b")).as("__kb"))
    val e = col("__ra").cast("double") * col("__rb").cast("double") /
      col("__t").cast("double")
    val obs = coalesce(col("__n"), lit(0L)).cast("double")
    val term = (obs - e) * (obs - e) / e
    // the FULL |A|x|B| grid, not just observed cells: an empty cell still
    // contributes its expectation e to the statistic
    ra.crossJoin(rb)
      .join(o, Seq("__a", "__b"), "left")
      .crossJoin(broadcast(tot))
      .agg(
        graft.ext.Timeseries.r6(sum(term)).as("chi2"),
        ((first(col("__ka")) - 1) * (first(col("__kb")) - 1)).as("dof"),
        first(col("__t")).as("n"),
        // Cramér's V = sqrt(chi2 / (n·min(ka−1, kb−1))) — the [0,1]
        // effect size that makes chi2 comparable across table shapes.
        // sqrt is IEEE-correctly-rounded (unlike ln/log2), so the only
        // cross-engine slack is the chi2 sum itself — same r6 site.
        graft.ext.Timeseries.r6(sqrt(sum(term)
          / (first(col("__t")).cast("double")
            * least(first(col("__ka")) - 1, first(col("__kb")) - 1)
              .cast("double")))).as("cramers_v"))
  }

  /** Mann–Whitney U (Wilcoxon rank-sum) between `valueCol`'s values in
    * groups `g1` and `g2`, one row: (n1, n2, u1_x2, auc). Ranks use
    * midranks for ties; every quantity is kept DOUBLED so tie halves stay
    * integers: a value block starting after `prev` earlier observations
    * with cnt members has 2·midrank = 2·prev + cnt + 1 (exact), so
    * 2·R1 = Σ c1·(2·prev + cnt + 1) and 2·U1 = 2·R1 − n1·(n1+1) are exact
    * 38-digit-decimal integers. `auc` = U1/(n1·n2) =
    * P(x₁ > x₂) + ½·P(tie), the rank-biserial/common-language effect size
    * (the label-free AUC), r6-rounded — ONE division over exact integers.
    *
    * Plan: identical shape to [[ksTest]] — one per-value aggregation
    * holding both groups' counts, exclusive prefix totals via the
    * two-level prefix sum (no global single-partition window), one final
    * reduce. */
  def mannWhitney(df: DataFrame, valueCol: String, groupCol: String,
                  g1: String, g2: String): DataFrame = {
    val f = df.where(col(groupCol).isin(g1, g2))
      .groupBy(col(valueCol).as("__v"))
      .agg(sum(when(col(groupCol) === g1, 1L).otherwise(0L)).as("__c1"),
        sum(when(col(groupCol) === g2, 1L).otherwise(0L)).as("__c2"))
    val d = f.withColumn("__gb", floor(col("__v")))
      .withColumn("__cnt", col("__c1") + col("__c2"))
    val wB = Window.orderBy("__gb")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = d.groupBy("__gb").agg(sum(col("__cnt")).as("__bn"))
      .select(col("__gb"),
        coalesce(sum(col("__bn")).over(wB), lit(0L)).as("__off"))
    val wIn = Window.partitionBy("__gb").orderBy("__v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val dec = (x: Column) => x.cast("decimal(38,0)")
    val prev = sum(col("__cnt")).over(wIn) - col("__cnt") + col("__off")
    val tot = f.agg(sum(col("__c1")).as("__n1"), sum(col("__c2")).as("__n2"))
    d.join(broadcast(offs), Seq("__gb"))
      .select((dec(col("__c1")) *
        dec(lit(2L) * prev + col("__cnt") + 1L)).as("__r1x2"))
      .agg(sum(col("__r1x2")).as("__sr1x2"))
      .crossJoin(broadcast(tot))
      .select(col("__n1").as("n1"), col("__n2").as("n2"),
        (col("__sr1x2") - dec(col("__n1")) * dec(col("__n1") + 1L))
          .cast("decimal(38,0)").as("__u1x2"))
      .select(col("n1"), col("n2"),
        col("__u1x2").cast("long").as("u1_x2"),
        graft.ext.Timeseries.r6(col("__u1x2").cast("double")
          / (lit(2.0) * col("n1").cast("double") * col("n2").cast("double")))
          .as("auc"))
  }

  /** Two-sample Kolmogorov–Smirnov statistic between `valueCol`'s
    * distributions in groups `g1` and `g2` of `groupCol`, one row:
    * (n1, n2, d_num, d). D = max over observed values of
    * |F̂₁(v) − F̂₂(v)| = max |c1(v)·n2 − c2(v)·n1| / (n1·n2): the
    * numerator is EXACT (38-digit decimal products of exact cumulative
    * counts, so a 10¹³-row cohort cannot overflow), emitted as `d_num`
    * alongside the one final division.
    *
    * Plan: one (value) aggregation holding both groups' counts, then
    * cumulative counts via the TWO-LEVEL prefix sum ([[Rank.globalRank]]'s
    * idiom — per-bucket totals broadcast as offsets + an in-bucket
    * window), bucket = floor(value): no single-partition global window
    * at any input size. The final max is one reduce. */
  def ksTest(df: DataFrame, valueCol: String, groupCol: String,
             g1: String, g2: String): DataFrame = {
    val f = df.where(col(groupCol).isin(g1, g2))
      .groupBy(col(valueCol).as("__v"))
      .agg(sum(when(col(groupCol) === g1, 1L).otherwise(0L)).as("__c1"),
        sum(when(col(groupCol) === g2, 1L).otherwise(0L)).as("__c2"))
    val d = f.withColumn("__gb", floor(col("__v")))
    val wB = Window.orderBy("__gb")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = d.groupBy("__gb")
      .agg(sum(col("__c1")).as("__b1"), sum(col("__c2")).as("__b2"))
      .select(col("__gb"),
        coalesce(sum(col("__b1")).over(wB), lit(0L)).as("__o1"),
        coalesce(sum(col("__b2")).over(wB), lit(0L)).as("__o2"))
    val wIn = Window.partitionBy("__gb").orderBy("__v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val dec = (x: Column) => x.cast("decimal(38,0)")
    val cum = d.join(broadcast(offs), Seq("__gb"))
      .select(
        (sum(col("__c1")).over(wIn) + col("__o1")).as("__cc1"),
        (sum(col("__c2")).over(wIn) + col("__o2")).as("__cc2"))
    val tot = f.agg(sum(col("__c1")).as("__n1"), sum(col("__c2")).as("__n2"))
    cum.crossJoin(broadcast(tot))
      .agg(
        first(col("__n1")).as("n1"),
        first(col("__n2")).as("n2"),
        max(abs(dec(col("__cc1")) * dec(col("__n2"))
          - dec(col("__cc2")) * dec(col("__n1")))).cast("decimal(38,0)")
          .as("d_num"))
      .select(col("n1"), col("n2"), col("d_num").cast("long").as("d_num"),
        graft.ext.Timeseries.r6(col("d_num").cast("double")
          / (col("n1").cast("double") * col("n2").cast("double"))).as("d"))
  }
}
