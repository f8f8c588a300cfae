package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/**
 * Iterative graph analytics over edge tables ([[Dedup.dupClusters]] is the
 * connected-components sibling; this adds centrality). The training-data
 * use: rank hosts/documents in a link or citation graph for crawl
 * prioritization and quality weighting.
 *
 * Numeric discipline (what makes a float fixpoint loop hash-comparable
 * across engines AND partitionings): every per-edge contribution is
 * rounded to 12 decimals (a deterministic unary op on a deterministic
 * double), summed as DECIMAL(30,12) — exact, order-free — and the damped
 * update is re-rounded to 12 decimals, so each iteration's ranks are
 * bit-reproducible; the DuckDB oracle replays all iterations with the
 * same arithmetic (the weighted-sample/dsum convention applied to an
 * iterative algorithm).
 *
 * Scale shape: per iteration one equi-join of the rank table against the
 * edge table plus one partial/final aggregate — the canonical distributed
 * PageRank plan; rank lineage is cut every round ([[Dedup.dupClusters]]
 * discipline) so plans stay constant-size. Dangling nodes (no out-edges)
 * keep the standard simplification: their mass is not redistributed.
 */
object Graph {

  /**
   * PageRank over a directed edge list with `iters` damped power
   * iterations. Returns (node, rank); ranks rounded to 12 decimals.
   * Self-loops count like any edge; duplicate edges are collapsed.
   */
  def pageRank(edges: DataFrame, iters: Int, damping: Double = 0.85,
               srcCol: String = "src", dstCol: String = "dst"): DataFrame = {
    require(iters >= 0, s"pageRank: iters must be >= 0, got $iters")
    require(damping > 0.0 && damping < 1.0,
      s"pageRank: damping must be in (0, 1), got $damping")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val nodes = e.select(col("src").as("node"))
        .union(e.select(col("dst").as("node")))
        .distinct().localCheckpoint()
      val n = nodes.count()
      val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
        .localCheckpoint()
      val teleport = (1.0 - damping) / n
      var rank = nodes.withColumn("rank", round(lit(1.0) / n, 12))
        .localCheckpoint()
      var k = 0
      while (k < iters) {
        val contrib = rank.join(e, rank("node") === e("src"))
          .join(outdeg, "src")
          .select(col("dst").as("node"),
            round(col("rank") / col("deg"), 12).as("c"))
          .groupBy(col("node"))
          .agg(sum(col("c").cast(DecimalType(30, 12))).cast("double").as("csum"))
        rank = nodes.join(contrib, Seq("node"), "left")
          .select(col("node"),
            round(lit(teleport) + lit(damping) * coalesce(col("csum"), lit(0.0)), 12)
              .as("rank"))
          .localCheckpoint()
        k += 1
      }
      rank
    } finally e.unpersist()
  }
}
