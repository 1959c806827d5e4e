package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative link-graph analytics over edge lists — the authority-scoring
  * layer of a corpus-curation pipeline (web-scale corpora weight documents
  * by the centrality of their source domain in the hyperlink graph; the
  * classic formulation is Page et al., "The PageRank Citation Ranking").
  * The reference has no graph surface; this extends the same per-source
  * quality posture its schools/programs views take to graph-derived
  * quality.
  *
  * Design for scale: rank state is one (node, rank) row per vertex and
  * every iteration is joins + one aggregation over the edge list — the
  * standard Pregel-as-shuffle shape, O(E) per round, no adjacency lists
  * collected anywhere. The edge list (with out-degrees) is persisted once
  * and reused by all rounds; the rank frame is localCheckpoint'ed per
  * round so lineage stays flat instead of growing a 2-joins-per-iteration
  * tree (same idiom as [[Dedup.connectedComponents]]).
  */
object Graph {

  /** PageRank by fixed-iteration power iteration over a DIRECTED edge list
    * with columns (src, dst). Returns (node, rank) for every node that
    * appears as an endpoint.
    *
    * rank'(v) = (1-d)/N + d * Σ_{(u,v)∈E} rank(u)/outdeg(u)
    *
    * Dangling mass (nodes with no out-edges) is dropped, not redistributed
    * — the original simplification; feed a bidirected edge list (as the
    * registered query does) when every node must keep out-degree ≥ 1.
    * Duplicate (src, dst) rows count as parallel edges; pre-distinct the
    * input for simple-graph semantics. All arithmetic is plain doubles —
    * callers comparing across engines round at the end (registry precedent:
    * 6 decimals on O(1)-scaled values).
    *
    * Checkpoint cadence: each iteration references the previous rank frame
    * exactly once and the persisted edge/node frames otherwise, so the
    * un-truncated plan is a LINEAR chain — one action runs all rounds as
    * consecutive shuffle stages in a single job. Checkpointing every round
    * (the first cut of this operator) turned that into iters+1 eagerly
    * scheduled jobs and benched 9.3 s at sf0.1 — 2.6× the single-job
    * shape. `checkpointInterval` only bounds optimizer/plan depth for
    * high-iteration runs; the final frame is checkpointed eagerly so the
    * returned DataFrame is free of the unpersisted lineage. */
  def pagerank(edges: DataFrame, iters: Int = 10,
               damping: Double = 0.85,
               checkpointInterval: Int = 8): DataFrame = {
    require(iters >= 1, s"pagerank needs at least one iteration, got $iters")
    require(checkpointInterval >= 1,
      s"checkpointInterval must be positive, got $checkpointInterval")
    val e = edges.select(col("src"), col("dst"))
    // out-degree rides along each edge so an iteration is ONE join with the
    // rank frame (contribution = rank(src)/outdeg(src)), not two
    val out = e.join(
      e.groupBy("src").agg(count(lit(1)).cast("double").as("outdeg")),
      Seq("src")).persist()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().persist()
    val n = nodes.count().toDouble // also materializes the persisted nodes
    val base = (1.0 - damping) / n

    var ranks = nodes.select(col("node"), lit(1.0 / n).as("rank"))
    for (i <- 1 to iters) {
      val contrib = out.join(ranks, out("src") === ranks("node"))
        .groupBy(out("dst").as("node"))
        .agg(sum(col("rank") / col("outdeg")).as("cin"))
      // left join keeps zero-in-degree nodes alive at the base rank
      ranks = nodes.join(contrib, Seq("node"), "left")
        .select(col("node"),
          (lit(base) + lit(damping) * coalesce(col("cin"), lit(0.0)))
            .as("rank"))
      if (i % checkpointInterval == 0 || i == iters)
        ranks = ranks.localCheckpoint() // eager: materializes rounds so far
    }
    out.unpersist()
    nodes.unpersist()
    ranks
  }
}
