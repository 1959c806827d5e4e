package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Soak probe for [[graft.ext.Streaming.nearDedupStream]]'s bounded-state
  * contract (round-13 demand): run N single-doc microbatches
  * (maxFilesPerTrigger=1) with a small compactEvery and report, per
  * compaction window, how many bid partitions and base dirs the state
  * holds — the per-batch union/listing size a long-running ingest pays.
  * Before compaction the count grew with TOTAL batch count forever; with
  * the folding base it must stay ≤ compactEvery bid partitions + 1 base,
  * whatever N is. Also sanity-checks first-seen-wins suppression: every
  * odd batch is a near-copy of an earlier doc, so exactly the even-batch
  * docs survive.
  *
  * Usage: runMain graft.tools.StreamSoak [nBatches] [compactEvery]
  */
object StreamSoak {

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(60)
    val every = args.lift(1).map(_.toInt).getOrElse(8)
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[8]"))
      .appName("graft-stream-soak")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val base = java.nio.file.Files.createTempDirectory("graft_soak").toString
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$base/src"))
    val corpus = Seq((0L, "the standing corpus document about federated " +
      "scan sources")).toDF("doc_id", "text")
    val (cb, cs) = graft.ext.Dedup.corpusNearDupIndex(corpus, "doc_id", "text")

    // even batch i: a novel doc built from i-specific words; odd batch i:
    // an exact copy of batch i-1's doc (must drop against stream state,
    // wherever that contribution now lives — recent partition or base)
    def text(i: Int): String =
      if (i % 2 == 0)
        s"novel document ${i} speaks of topic${i} widget${i} gadget${i} " +
          s"rotor${i} stator${i} plasma${i} quill${i}"
      else text(i - 1)
    (0 until n).foreach { i =>
      val tmp = s"$base/tmp"
      Seq((i.toLong + 1L, text(i))).toDF("doc_id", "text").coalesce(1)
        .write.mode("overwrite").parquet(tmp)
      val pf = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.move(pf.toPath,
        java.nio.file.Paths.get(f"$base/src/b$i%03d.parquet"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }

    val schema = Seq.empty[(Long, String)].toDF("doc_id", "text").schema
    val t0 = System.nanoTime()
    val kept = graft.ext.Streaming.nearDedupStream(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
          .parquet(s"$base/src"), cb, cs,
        s"$base/state", s"$base/out", s"$base/ckpt", "doc_id", "text",
        threshold = 0.7, compactEvery = every)
      .select("doc_id").as[Long].collect().toSeq.sorted
    val sec = (System.nanoTime() - t0) / 1e9

    def bids(kind: String): Seq[Long] =
      Option(new java.io.File(s"$base/state/$kind").listFiles)
        .map(_.toSeq.map(_.getName).filter(_.startsWith("bid="))
          .map(_.stripPrefix("bid=").toLong).sorted).getOrElse(Nil)
    def bases(kind: String): Seq[Long] =
      Option(new java.io.File(s"$base/state/${kind}_base").listFiles)
        .map(_.toSeq.map(_.getName).filter(_.startsWith("upto="))
          .map(_.stripPrefix("upto=").toLong).sorted).getOrElse(Nil)

    val expect = (0 until n).filter(_ % 2 == 0).map(_.toLong + 1L)
    // scalastyle:off println
    println(s"batches=$n compactEvery=$every wall=${f"$sec%.1f"}s")
    println(s"kept=${kept.size} expected=${expect.size} " +
      s"match=${kept == expect}")
    for (k <- Seq("bands", "sets")) {
      val b = bids(k); val ba = bases(k)
      println(s"state/$k: bid_partitions=${b.size} (${b.mkString(",")}) " +
        s"bases=${ba.map("upto=" + _).mkString(",")}")
      println(s"state/$k bounded (≤ $every live partitions + 1 base): " +
        s"${b.size <= every && ba.size == 1}")
    }
    // scalastyle:on println
    spark.stop()
  }
}
