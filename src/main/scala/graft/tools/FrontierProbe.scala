package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Ckpt.CkptOps

/** Diagnostic: per-round active-frontier sizes for the delta-iterating
  * graph operators ([[graft.ext.Graph.labelPropagation]],
  * [[graft.ext.Dedup.connectedComponents]]) on a given corpus — the
  * measurement behind the round-11 PLANS.md entry. Replicates the two
  * loop skeletons with counters added (a dev probe, not a second
  * implementation: the operators themselves stay uninstrumented).
  *
  * Usage: runMain graft.tools.FrontierProbe <sfDir>
  */
object FrontierProbe {

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[32]"))
      .appName("graft-frontier-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val t = graft.io.Tables(spark, dir)
    val op = t.lineitem
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      .distinct()
    val und = op.as("x")
      .join(op.as("y"), col("x.o") === col("y.o") && col("x.p") =!= col("y.p"))
      .select(least(col("x.p"), col("y.p")).as("a"),
        greatest(col("x.p"), col("y.p")).as("b"))
      .where(col("a") =!= col("b")).distinct().ckpt()
    val nEdges = und.count()
    println(s"[probe] canonical co-purchase pairs: $nEdges")

    // ---- LPA frontier (mirrors Graph.labelPropagation round logic) ----
    val e = und.select(col("a").as("src"), col("b").as("dst"))
      .unionAll(und.select(col("b").as("src"), col("a").as("dst")))
      .repartition(col("src")).persist()
    def argmaxLabels(sub: DataFrame, labels: DataFrame): DataFrame =
      sub.join(labels, sub("src") === labels("node"))
        .groupBy(sub("dst").as("node"), col("label"))
        .agg(count(lit(1)).as("n"))
        .groupBy("node")
        .agg(max(struct(col("n"), (-col("label")).as("nl"))).as("m"))
        .select(col("node"), (-col("m.nl")).as("label"))
    val nNodes = e.select("src").distinct().count()
    var labels = argmaxLabels(e,
      e.select(col("src").as("node")).distinct()
        .select(col("node"), col("node").as("label"))).ckpt()
    var changed = labels.where(col("node") =!= col("label"))
      .select(col("node")).ckpt()
    println(s"[probe] lpa round 1: nodes=$nNodes changed=${changed.count()}")
    var i = 2
    while (i <= 5 && !changed.isEmpty) {
      val touched = e
        .join(changed.withColumnRenamed("node", "src"), Seq("src"))
        .select(col("dst").as("node")).distinct()
      val sub = e.join(touched.withColumnRenamed("node", "dst"),
        Seq("dst"), "left_semi")
      val updated = argmaxLabels(sub, labels)
      val next = labels.as("l")
        .join(updated.as("u"), Seq("node"), "left")
        .select(col("node"),
          coalesce(col("u.label"), col("l.label")).as("label"),
          (col("u.label").isNotNull &&
            col("u.label") =!= col("l.label")).as("__chg"))
        .ckpt()
      changed = next.where(col("__chg")).select(col("node"))
      labels = next.select(col("node"), col("label"))
      println(s"[probe] lpa round $i: touched=${touched.count()} " +
        s"sub_edges=${sub.count()} changed=${changed.count()}")
      i += 1
    }
    e.unpersist()

    // ---- CC live-set shrink (mirrors Dedup.connectedComponents) ----
    def largeStar(ed: DataFrame): DataFrame = {
      val u2 = ed.union(ed.select(col("v").as("u"), col("u").as("v")))
      val m = u2.groupBy("u").agg(min(col("v")).as("mv"))
        .select(col("u"), least(col("mv"), col("u")).as("m"))
      u2.join(m, "u").where(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .where(col("u") =!= col("v"))
    }
    def smallStar(ed: DataFrame): DataFrame = {
      val or = ed.select(greatest(col("u"), col("v")).as("u"),
        least(col("u"), col("v")).as("v"))
      val m = or.groupBy("u").agg(min(col("v")).as("m"))
      or.join(m, "u").select(col("v").as("u"), col("m").as("v"))
        .union(m.select(col("u"), col("m").as("v")))
        .where(col("u") =!= col("v")).distinct()
    }
    var live = und.select(col("a").as("u"), col("b").as("v")).ckpt()
    var round = 0
    while (!live.isEmpty && round < 16) {
      val next = smallStar(largeStar(live)).ckpt()
      val badChild = next.groupBy("u")
        .agg(countDistinct(col("v")).as("__np"))
        .where(col("__np") > 1).select("u")
        .union(next.select("u")
          .join(next.select(col("v").as("u")), Seq("u"), "left_semi"))
        .distinct()
      val badRoots = next.select(col("v")).distinct()
        .join(next.select(col("u").as("v")), Seq("v"), "left_semi")
        .union(next.join(badChild, Seq("u"), "left_semi")
          .select(col("v")).distinct())
        .distinct().ckpt()
      val settled = next.join(badRoots, Seq("v"), "left_anti")
        .select(col("u"), col("v")).ckpt()
      live = next.join(badRoots, Seq("v"), "left_semi")
        .select(col("u"), col("v")).ckpt()
      round += 1
      println(s"[probe] cc round $round: out_edges=${next.count()} " +
        s"settled=${settled.count()} live=${live.count()}")
    }
    spark.stop()
  }
}
