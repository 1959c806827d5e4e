package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{CosineSimilarity, DotProduct, JaroWinkler, VectorNorm}

/** Session extensions: registers the native vector expressions as SQL
  * functions. Enable with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` — the
  * standard plugin mechanism, so user sessions (and spark-sql/pyspark
  * shells) get `vec_dot` / `cosine_sim` without code changes.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  /** Arity-checked builder: without the guard, extra SQL arguments would be
    * SILENTLY dropped (`vec_dot(a, b, c)` computing dot(a, b)) and missing
    * ones would surface as a raw IndexOutOfBoundsException instead of an
    * analysis error. */
  private def arity(name: String, n: Int)(
      build: Seq[Expression] => Expression): Seq[Expression] => Expression =
    children => {
      if (children.size != n) throw new IllegalArgumentException(
        s"$name expects $n argument(s), got ${children.size}")
      build(children)
    }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "vec_dot"),
      arity("vec_dot", 2)(c => DotProduct(c(0), c(1)))))
    ext.injectFunction((
      new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      arity("cosine_sim", 2)(c => CosineSimilarity(c(0), c(1)))))
    ext.injectFunction((
      new FunctionIdentifier("vec_norm"),
      new ExpressionInfo(classOf[VectorNorm].getName, "vec_norm"),
      arity("vec_norm", 1)(c => VectorNorm(c(0)))))
    ext.injectFunction((
      new FunctionIdentifier("jaro_winkler"),
      new ExpressionInfo(classOf[JaroWinkler].getName, "jaro_winkler"),
      arity("jaro_winkler", 2)(c => JaroWinkler(c(0), c(1)))))
    // Spark ships bloom build/probe expressions for its own runtime join
    // filters but does not register them as SQL functions; exposing them
    // makes the pre-shuffle join pruning in Relational.bloomPrunedJoin (and
    // ad-hoc SQL) expressible without UDFs. bloom_agg(xxhash64(k), items,
    // bits) -> binary; bloom_might_contain(filter, xxhash64(k)) -> boolean
    // (no false negatives, so a post-probe equi-join stays exact).
    ext.injectFunction((
      new FunctionIdentifier("bloom_agg"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate].getName,
        "bloom_agg"),
      arity("bloom_agg", 3)(c =>
        new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
          c(0), c(1), c(2)))))
    ext.injectFunction((
      new FunctionIdentifier("bloom_might_contain"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
        "bloom_might_contain"),
      arity("bloom_might_contain", 2)(c =>
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(c(0), c(1)))))
  }
}
