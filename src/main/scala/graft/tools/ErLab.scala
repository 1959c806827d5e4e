package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratchpad: er_fs_em cost split — the EM fit side (analytic
  * subset-lattice pattern counts, corpus-LINEAR since round 13) vs the
  * scoring side (the one remaining pairwise join, streamed). Run on the
  * target corpus to attribute the query's wall time. */
object ErLab {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def planted = {
      val base = graft.io.Tables(spark, sfDir).part.select(
        col("p_partkey").as("id"),
        concat(col("p_brand"), lit("|"),
          col("p_size").cast("string")).as("blk"),
        col("p_type").as("f0"),
        element_at(split(col("p_name"), " "), 1).as("f1"),
        element_at(split(col("p_name"), " "), 2).as("f2"))
      val dups = base.where(col("id") % 2 === 0).select(
        (col("id") + 10000000L).as("id"), col("blk"),
        when(col("id") % 20 === 0, "XX").otherwise(col("f0")).as("f0"),
        when(col("id") % 25 === 5, "XX").otherwise(col("f1")).as("f1"),
        when(col("id") % 5 === 1, "XX").otherwise(col("f2")).as("f2"))
      base.unionAll(dups)
    }

    def t(name: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      graft.Ckpt.releasing(body)
      // scalastyle:off println
      println(f"[erlab] $name%-34s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      // scalastyle:on println
    }

    t("fit side: analytic pattern counts") {
      val n = graft.ext.Linkage.agreementPatternCounts(planted, "id",
        col("blk"), Seq("f0", "f1", "f2")).collect()
      // scalastyle:off println
      println(s"[erlab]   patterns=${n.length} pairs=${n.map(_.getLong(3)).sum}")
      // scalastyle:on println
    }
    t("full er_fs_em (fit + scored stream)") {
      graft.ext.Linkage.selfLinkPairsEmFitted(planted, "id", col("blk"),
          Seq("f0", "f1", "f2"), iters = 20, threshold = 1.0)
        .write.mode("overwrite").format("noop").save()
    }
    t("scored stream only, supplied priors") {
      graft.ext.Linkage.selfLinkPairs(planted, "id", col("blk"),
          Seq(graft.ext.Linkage.FieldSpec("f0", 0.9, 0.15),
            graft.ext.Linkage.FieldSpec("f1", 0.97, 0.11),
            graft.ext.Linkage.FieldSpec("f2", 0.73, 0.12)),
          threshold = -100.0)
        .write.mode("overwrite").format("noop").save()
    }
    spark.stop()
  }
}
