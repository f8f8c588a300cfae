package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/**
 * Streaming decontamination flagging — benchmark-overlap admission
 * control at ingest, the streaming serving path of the persisted
 * benchmark index ([[graft.operators.TextAnalysis.saveBenchmarkIndex]]).
 * The batch `decontaminate` pass cleans a corpus that already leaked;
 * this cell keeps contamination from ENTERING: every incoming document
 * is shingled in-flight and probed against the stored eval-suite gram
 * set before it lands in training storage.
 *
 * Exact, not probabilistic (unlike `decontaminateBloom`): the probe is a
 * stream-static EQUI-join against the loaded index, so there are no
 * false positives to audit and no false-negative risk to a benchmark
 * score. Stateless by construction — no state store, no watermark: each
 * (doc, gram) hit is emitted exactly once by arithmetic (grams are
 * `array_distinct`'d in-row and a doc arrives in exactly one
 * micro-batch), the [[StreamingWinnow]] discipline. Per-doc verdicts
 * (`n_shared >= minShared`) are one bounded aggregate over the emitted
 * evidence log, which is itself the audit artifact a curation team
 * wants: WHICH grams collided, not just that something did.
 *
 * Scale shape: per micro-batch O(batch shingles) narrow work + one
 * equi-join whose static side is the benchmark gram set — eval suites
 * are MBs against a 100 TB corpus, broadcast-eligible, rebuilt only when
 * a new suite ships. Pass the static side through
 * [[graft.operators.TextAnalysis.contaminationFromIndex]]'s loader
 * discipline (width-checked) and `localCheckpoint` it: a stream-static
 * join re-executes the static subplan every micro-batch otherwise.
 */
object StreamingDecon {

  /**
   * Emit the contamination evidence log for a document stream: one
   * `(id, g)` row per (incoming doc, shared benchmark gram). `grams` is
   * the loaded index's distinct-gram frame (column `g`), `shingleN` the
   * index's width — both from
   * [[graft.operators.TextAnalysis.loadBenchmarkIndex]].
   */
  def flagHits(docs: DataFrame, grams: DataFrame, shingleN: Int,
               idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs
      .select(col(idCol).as("id"),
        explode(array_distinct(TextFunctions.shingles(col(textCol), shingleN)))
          .as("sh"))
      .join(grams.select(col("g")), col("sh") === col("g"))
      .select(col("id"), col("g"))
}
