package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The canonical training-data curation pipeline, composed from the
  * individual operators into ONE declarative plan: quality scoring →
  * language filter → exact dedup → stats projection. This is the llm
  * counterpart of the reference's `demo_all_features` — it proves the
  * operators compose without materialization barriers between stages.
  *
  * Scale notes: scoring/lang-id are narrow projections fused into the
  * scan; the only shuffle is exact dedup's hash-keyed window (with its
  * map-side WindowGroupLimit). Filters run BEFORE the shuffle, so
  * low-quality and off-language documents never pay network cost —
  * the order of stages is load-bearing at 100 TB.
  */
object Curate {

  def apply(
      docs: DataFrame,
      minQuality: Double = 0.1,
      langs: Seq[String] = Seq("en"),
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame =
    Dedup.exact(scoredKept(docs, minQuality, langs, textCol), textCol, idCol)
      .select(col(idCol), col("lang_pred"),
        round(col("quality_score"), 6).as("quality_score"),
        col("content_hash"))

  /** The shared pre-dedup stage — quality scoring, language-id, and the
    * keep filters — used by BOTH the batch pipeline above and
    * [[graft.streaming.StreamOps.curateStream]], so the two can never
    * drift apart on what "kept" means. */
  private[graft] def scoredKept(
      docs: DataFrame,
      minQuality: Double,
      langs: Seq[String],
      textCol: String): DataFrame =
    TextAnalysis.languageId(
      TextAnalysis.qualityScore(docs, textCol), textCol)
      .filter(col("quality_score") >= minQuality &&
        col("lang_pred").isin(langs: _*))

  /** [[apply]] plus fuzzy near-dup suppression (minhash) — the full
    * at-scale recipe; not SQL-expressible (seeded banding), verified by
    * invariants on the component operators. */
  def withNearDedup(
      docs: DataFrame,
      minQuality: Double = 0.1,
      langs: Seq[String] = Seq("en"),
      minJaccard: Double = 0.8,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val exactStage = apply(docs, minQuality, langs, textCol, idCol)
    val keptDocs = docs.join(exactStage.select(idCol), Seq(idCol), "left_semi")
    Dedup.minhash(keptDocs, textCol, idCol, minJaccard = minJaccard)
  }
}
