package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: synthesize a larger corpus by unioning `copies` re-keyed
  * replicas of a source corpus (sf0.1 × 10 ≈ sf1) so the bench/baseline
  * crossover can be measured when no larger driver corpus exists.
  *
  * Every int64 id/foreign-key column is offset by copy × 100M (all corpus
  * ids are far below 100M), so referential integrity holds WITHIN a copy
  * and keys never collide ACROSS copies. The tiny dims (region, nation —
  * int32 keys referenced by unchanged int32 foreign keys) are written once.
  * `events.ts` passes through in whatever encoding the source corpus
  * carries (legacy TIMESTAMP(NANOS) read as a long under the legacy conf,
  * or TIMESTAMP_NTZ micros since the corpus regeneration):
  * [[graft.io.Sources.normalizeTs]] canonicalizes either on read, and the
  * streaming reader derives its schema from the written footer.
  *
  * Note the replica semantics for content tables: documents/embeddings
  * replicas share text/vectors under new ids, so dedup/similarity queries
  * see `copies`-sized exact-duplicate groups — a legitimate (and harsher)
  * scale stress, called out where sf1 numbers are reported.
  */
object ScaleUp {

  private val keyCols: Map[String, Seq[String]] = Map(
    "region" -> Nil,
    "nation" -> Nil,
    "customer" -> Seq("c_custkey"),
    "supplier" -> Seq("s_suppkey"),
    "part" -> Seq("p_partkey"),
    "orders" -> Seq("o_orderkey", "o_custkey"),
    "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
    "events" -> Seq("event_id", "user_id"),
    "documents" -> Seq("doc_id"),
    "embeddings" -> Seq("vec_id"))

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val dst = if (args.length > 1) args(1) else "/tmp/sf1"
    val copies = if (args.length > 2) args(2).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val off = 100000000L
    keyCols.foreach { case (name, keys) =>
      val raw = spark.read.parquet(s"$src/$name.parquet")
      val out =
        if (keys.isEmpty) raw
        else (0 until copies).map { i =>
          keys.foldLeft(raw)((d, k) => d.withColumn(k, col(k) + lit(i * off)))
        }.reduce(_ unionByName _)
      out.write.mode("overwrite").parquet(s"$dst/$name.parquet")
      println(s"[scaleup] $name x${if (keys.isEmpty) 1 else copies}")
    }
    spark.stop()
  }
}
