package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.plans.NfcNormalizeExpr
import graft.sources.CorpusSink

/** End-to-end corpus curation — the composition a user actually runs:
  *
  *   raw docs → NFC normalize → quality filter → exact dedup → write
  *
  * Every stage is one of the library's oracle-checked operators; this
  * object just fixes the composition order (normalize BEFORE hashing,
  * so `café` in NFC and in decomposed form dedup together — the reason
  * NFC runs first in every serious pipeline) and the retention
  * bookkeeping.
  *
  * Plan shape: normalize + quality predicates are narrow (one codegen
  * span over the scan); dedup is the single md5 shuffle; the writer
  * shuffles once more on the partition key. Three stages, two
  * exchanges, text never shuffles except into the final writer. */
object CurationPipeline {

  /** Curated frame: normalized text, only docs passing the quality
    * rules, one keeper per distinct content (min id). Pass-through
    * columns survive. Quality rules mirror q62's funnel (length band,
    * stopword density, repetition, composite score). */
  def curate(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val norm = docs.withColumn(textCol, NfcNormalizeExpr.nfc(col(textCol)))
    val t = col(textCol)
    val keepRules =
      TextAnalysis.tokenCount(t).between(10, 1000) &&
        TextAnalysis.stopwordRatio(t) >= 0.02 &&
        TextAnalysis.repetitionRatio(t) <= 0.2 &&
        TextAnalysis.qualityScore(t) >= 0.5
    val filtered = norm.filter(keepRules)
    // exact dedup: keeper = min id per content hash; only (hash, id)
    // shuffle — the winning rows come back via a semi join on the id
    val keepers = filtered
      .groupBy(md5(t).as("_h")).agg(min(col(idCol)).as(idCol))
      .select(col(idCol))
    filtered.join(keepers, Seq(idCol), "left_semi")
  }

  /** curate + partitioned write; returns the manifest. */
  def run(docs: DataFrame, idCol: String, textCol: String,
          outDir: String, partitionCols: Seq[String]): DataFrame =
    CorpusSink.write(curate(docs, idCol, textCol), outDir, partitionCols)
}
