package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev scratchpad for the sf10 scale-decade study: measures the SCALING
  * KNOBS the scaladocs prescribe (SemDeDup cell count growing with the
  * corpus; exact-dup pre-collapse ahead of near-dup banding on clone-heavy
  * corpora) so BASELINE.md reports the defended shape next to the
  * fixed-parameter registered queries. Not part of the library surface. */
object ScaleLab {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sf10")
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
      val t0 = System.nanoTime()
      mk.write.mode("overwrite").format("noop").save()
      println(f"[scalelab] $name%-44s ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }

    val tb = graft.io.Tables(spark, sfDir)
    val docs = tb.documents
    val emb = tb.embeddings
    val which = sys.env.getOrElse("SCALELAB_ONLY", "semdedup,neardup")

    if (which.contains("semdedup")) {
      // SemDeDup's own recipe: k grows with the corpus, holding per-cell
      // population (hence per-cell pair volume) constant. The registered
      // query is k=8 for the unrolled oracle; at 100x vectors the defended
      // operating point multiplies k by ~100.
      for (k <- Seq(200, 800)) {
        t(s"dedup_semantic k=$k (scaled cells)") {
          graft.ext.Similarity.semanticDedup(emb, "vec_id", "embedding",
            k = k, iters = 2,
            orderHash = Some(md5(concat(col("vec_id").cast("string"), lit(":42")))))
        }
      }
    }

    if (which.contains("erfs")) {
      // round 12: the er_fs block quadratic under a SKEW-PLANTED key.
      // Blocking on p_brand ALONE (25 blocks, |block| = parts/25) is the
      // dominant-brand / empty-field-in-the-key failure the maxBlock
      // star-collapse armor exists for: uncapped candidate pairs grow
      // ×100 per decade (|block|²), the capped shape grows ×10 (k−1 star
      // pairs per over-cap block). SCALELAB_ERFS_UNCAP=1 adds the
      // uncapped arm (do NOT run it at sf10: ~8e10 pairs).
      val part = tb.part.select(col("p_partkey"), col("p_brand"),
        col("p_type"),
        element_at(split(col("p_name"), " "), 1).as("tok1"),
        element_at(split(col("p_name"), " "), 2).as("tok2"))
      val fields = Seq(
        graft.ext.Linkage.FieldSpec("p_type", 0.95, 0.02),
        graft.ext.Linkage.FieldSpec("tok1", 0.90, 0.05),
        graft.ext.Linkage.FieldSpec("tok2", 0.90, 0.05))
      t("er_fs skew-block capped (maxBlock=2000)") {
        graft.ext.Linkage.selfLinkPairs(part, "p_partkey",
          col("p_brand"), fields, threshold = 5.0, maxBlock = 2000)
      }
      if (sys.env.get("SCALELAB_ERFS_UNCAP").contains("1"))
        t("er_fs skew-block UNCAPPED") {
          graft.ext.Linkage.selfLinkPairs(part, "p_partkey",
            col("p_brand"), fields, threshold = 5.0,
            maxBlock = Int.MaxValue)
        }
    }

    if (which.contains("neardup")) {
      // clone-heavy corpora put every document in a ~copies-sized identical
      // group, all of it below the over-cap star-collapse threshold — the
      // within-bucket quadratic the cap exists to bound. Two defenses:
      // (a) exact-dup pre-collapse (identical docs are Jaccard-1 pairs by
      //     definition; near-dup banding only needs one representative),
      // (b) a maxBucket sized to the expected duplicate multiplicity.
      t("dedup_near maxBucket=50 (cap-bounded)") {
        graft.ext.Dedup.nearDupPairs(docs, "doc_id", "text",
          threshold = 0.7, maxBucket = 50)
      }
      t("dedup_near exact-pre-collapse then band") {
        val reps = graft.ext.Dedup.dropExactDups(docs, "text")
        graft.ext.Dedup.nearDupPairs(reps, "doc_id", "text", threshold = 0.7)
      }
    }
    spark.stop()
  }
}
