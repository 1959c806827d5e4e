package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev scratchpad: decompose gate-query cost into scan / agg / join /
  * write components on a chosen corpus. Not part of the library surface. */
object Lab {
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
        mk.write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[lab] $name%-34s best=${times.min}%.3f  runs=${times.map(x => f"$x%.3f").mkString(",")}")
    }

    val tb = graft.io.Tables(spark, sfDir)
    val li = tb.lineitem
    println(s"[lab] lineitem input partitions = ${li.rdd.getNumPartitions}")

    // ---- a3 decomposition ----
    t("a3 current (product+round)") {
      li.groupBy("l_orderkey")
        .agg(round(product(lit(1) + col("l_discount")), 6).as("disc_factor"))
    }
    t("a3 no round") {
      li.groupBy("l_orderkey").agg(product(lit(1) + col("l_discount")).as("p"))
    }
    t("a3 sum instead of product") {
      li.groupBy("l_orderkey").agg(sum(col("l_discount")).as("p"))
    }
    t("a3 count only") {
      li.groupBy("l_orderkey").agg(count(lit(1)).as("p"))
    }
    t("a3 scan 2 cols only") {
      li.select("l_orderkey", "l_discount")
    }
    t("a3 repartition-first") {
      li.select("l_orderkey", "l_discount")
        .repartition(col("l_orderkey"))
        .groupBy("l_orderkey")
        .agg(round(product(lit(1) + col("l_discount")), 6).as("disc_factor"))
    }

    // ---- j1 decomposition ----
    val orders = tb.orders
    val cust = tb.customer
    t("j1 current") {
      li.join(orders, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .select("l_orderkey", "l_linenumber", "c_custkey", "c_mktsegment")
    }
    t("j1 scan lineitem 2 cols") {
      li.select("l_orderkey", "l_linenumber")
    }
    t("j1 orders-cust first then join") {
      val oc = orders.join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .select("o_orderkey", "c_custkey", "c_mktsegment")
      li.join(broadcast(oc), col("l_orderkey") === col("o_orderkey"))
        .select("l_orderkey", "l_linenumber", "c_custkey", "c_mktsegment")
    }
    t("j1 single join only (orders)") {
      li.join(orders, col("l_orderkey") === col("o_orderkey"))
        .select("l_orderkey", "l_linenumber", "o_custkey")
    }


    // ---- empty-corpus constants: stage 0-row mirrors of the tables ----
    val emptyDir = java.nio.file.Files.createTempDirectory("graft_empty").toString
    for (n <- graft.io.Sources.tableNames) {
      val p = s"$sfDir/$n.parquet"
      if (new java.io.File(p).exists) {
        val sch = spark.read.parquet(p).schema
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], sch)
          .write.mode("overwrite").parquet(s"$emptyDir/$n.parquet")
      }
    }
    val te = graft.io.Tables(spark, emptyDir)
    t("EMPTY a3") {
      te.lineitem.groupBy("l_orderkey")
        .agg(round(product(lit(1) + col("l_discount")), 6).as("disc_factor"))
    }
    t("EMPTY j1") {
      te.lineitem.join(te.orders, col("l_orderkey") === col("o_orderkey"))
        .join(te.customer, col("o_custkey") === col("c_custkey"))
        .select("l_orderkey", "l_linenumber", "c_custkey", "c_mktsegment")
    }
    t("EMPTY r1") {
      graft.ops.Reshape.pivotWide(te.events, Seq("user_id"), "event_type", Seq("click", "error", "purchase", "signup", "view"), "value")
    }
    t("EMPTY a1-shape sum") {
      te.lineitem.groupBy("l_returnflag").agg(sum(col("l_quantity")).as("s"))
    }
    spark.stop()
    // ---- r1 ----
    t("r1 current shape") {
      graft.ops.Reshape.pivotWide(tb.events, Seq("user_id"), "event_type", Seq("click", "error", "purchase", "signup", "view"), "value")
    }
  }
}
