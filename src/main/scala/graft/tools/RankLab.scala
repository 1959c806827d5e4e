package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev scratchpad for the rank family's per-round fixed costs on a
  * VOCABULARY-sized graph (text_keywords: 31 nodes / 961 edges at
  * sf0.1 — the 3.5 s is all scheduling, not data): bucket-count and
  * checkpoint-cadence variants over the staged word-edge layout.
  * Not part of the library surface. */
object RankLab {
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

    def t(name: String)(mk: => DataFrame): Unit = {
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        graft.Ckpt.releasing {
          mk.write.mode("overwrite").format("noop").save()
        }
        (System.nanoTime() - t0) / 1e9
      }
      // scalastyle:off println
      println(f"[ranklab] $name%-40s best=${times.min}%.3f  " +
        s"runs=${times.map(x => f"$x%.3f").mkString(",")}")
      // scalastyle:on println
    }

    val docs = graft.io.Tables(spark, sfDir).documents
    val e0 = docs
      .select(explode(graft.ext.TextOps.ngramTokens(col("text"), 2)).as("bigram"))
      .select(substring_index(col("bigram"), " ", 1).as("src"),
        substring_index(col("bigram"), " ", -1).as("dst"))
      .distinct()
    val e = e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
    val stagedDir = java.nio.file.Files
      .createTempDirectory("ranklab_edges").toString
    val withDeg = e.join(
      e.groupBy("src").agg(count(lit(1)).cast("double").as("outdeg")),
      Seq("src"))
    withDeg.write.mode("overwrite").parquet(s"$stagedDir/flat.parquet")
    spark.sql("DROP TABLE IF EXISTS ranklab_b32")
    graft.io.Sinks.writeBucketed(withDeg, "ranklab_b32", "src", 32,
      sortCol = Some("src"), path = Some(s"$stagedDir/b32"))
    spark.sql("DROP TABLE IF EXISTS ranklab_b1")
    graft.io.Sinks.writeBucketed(withDeg, "ranklab_b1", "src", 1,
      sortCol = Some("src"), path = Some(s"$stagedDir/b1"))

    def post(pr: DataFrame): DataFrame = {
      val nv = pr.agg(count(lit(1)).cast("double").as("nv"))
      pr.crossJoin(broadcast(nv))
        .select(col("node").as("word"),
          round(col("rank") * col("nv"), 6).as("rank_rel"))
        .orderBy(col("rank_rel").desc, col("word"))
        .limit(50)
    }

    t("bucketed32 interval=4 (current)") {
      post(graft.ext.Graph.pagerankBucketed(spark.table("ranklab_b32"),
        iters = 10, damping = 0.85))
    }
    t("bucketed1 interval=4") {
      post(graft.ext.Graph.pagerankBucketed(spark.table("ranklab_b1"),
        iters = 10, damping = 0.85))
    }
    t("bucketed32 interval=10") {
      post(graft.ext.Graph.pagerankBucketed(spark.table("ranklab_b32"),
        iters = 10, damping = 0.85, checkpointInterval = 10))
    }
    t("bucketed1 interval=10") {
      post(graft.ext.Graph.pagerankBucketed(spark.table("ranklab_b1"),
        iters = 10, damping = 0.85, checkpointInterval = 10))
    }
    t("flat parquet pagerank (r11 shape)") {
      post(graft.ext.Graph.pagerank(
        spark.read.parquet(s"$stagedDir/flat.parquet").select("src", "dst"),
        iters = 10, damping = 0.85))
    }
    t("bucketed1 interval=10, 1 shuffle part") {
      val one = spark.newSession()
      one.conf.set("spark.sql.shuffle.partitions", "1")
      post(graft.ext.Graph.pagerankBucketed(one.table("ranklab_b1"),
        iters = 10, damping = 0.85, checkpointInterval = 10))
    }
    t("bucketed1 interval=4, 1 shuffle part") {
      val one = spark.newSession()
      one.conf.set("spark.sql.shuffle.partitions", "1")
      post(graft.ext.Graph.pagerankBucketed(one.table("ranklab_b1"),
        iters = 10, damping = 0.85))
    }
    t("bucketed32 interval=4, 4 shuffle parts") {
      val one = spark.newSession()
      one.conf.set("spark.sql.shuffle.partitions", "4")
      post(graft.ext.Graph.pagerankBucketed(one.table("ranklab_b32"),
        iters = 10, damping = 0.85))
    }
    spark.sql("DROP TABLE IF EXISTS ranklab_b32")
    spark.sql("DROP TABLE IF EXISTS ranklab_b1")
    spark.stop()
  }
}
