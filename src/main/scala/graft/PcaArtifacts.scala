package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession

import graft.operators.Pca
import graft.sources.Tables

/**
 * Per-JVM cache of the derived top PCA component per sf dir — the
 * [[AnnArtifacts]] discipline applied to PCA serving: the corpus moment
 * pass + power iteration run at most ONCE per JVM per dataset, and the
 * SERVING entry (`streaming_pca_project`) consumes the cached component so
 * its timed window measures streaming projection, not index construction.
 * The BUILD entries (`pca_moments_append`, `pca_power_component`, …)
 * deliberately do NOT use this cache — construction cost is the number
 * they exist to report.
 *
 * The component is a deterministic function of the corpus (exact integer
 * moments, quantized power iterates), so a cached copy is bit-identical to
 * a fresh derivation — and the save→load round trip through the persisted
 * moment artifact stays INSIDE the builder, so the cached value always
 * comes from the full artifact lifecycle. Driver-side state is d doubles.
 */
private[graft] object PcaArtifacts {
  private val memo = scala.collection.mutable.Map[String, Array[Double]]()

  /** Top component of the embeddings table under `dir`, derived through
    * the persisted-moments lifecycle — built on first touch, cached after. */
  def topComponent(s: SparkSession, dir: String,
                   dim: Int = 64, iters: Int = 3): Array[Double] =
    memo.synchronized {
      memo.getOrElseUpdate(s"$dir|$dim|$iters", {
        val tmp = Files.createTempDirectory("graft_pca_art").toString
        try {
          Pca.saveMoments(Pca.rawMomentTable(Tables.embeddings(s, dir), dim), tmp)
          val (_, _, cov) = Pca.momentsFromTable(Pca.loadMoments(s, tmp), dim)
          Pca.powerIteration(cov, iters)
        } finally Gates.deleteTree(tmp)
      })
    }
}
