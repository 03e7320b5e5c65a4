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

  /** Benchmark-contamination report: for each doc in `docs` sharing at
    * least one word `n`-gram with ANY doc in `benchmark`, the number of
    * distinct shared n-grams — the standard eval-decontamination
    * primitive (n≈8–13 exact-overlap in published training-data
    * pipelines). Docs under n tokens emit their WHOLE token sequence as
    * one gram on both sides, so a short benchmark item only matches an
    * identical short doc — never any doc containing one of its words.
    *
    * Scale: the benchmark side reduces to a DISTINCT gram set that is
    * small by construction (eval suites, not corpora), so the join
    * against the corpus gram stream is broadcast-able and the corpus
    * never shuffles on gram — AQE picks broadcast once the gram set's
    * runtime stats fit, falling back to a hash join for pathologically
    * large suites. One groupBy on `idCol` aggregates the (pre-distinct,
    * so count == count-distinct) per-doc hits. */
  def contamination(
      docs: DataFrame,
      benchmark: DataFrame,
      n: Int = 8,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val trainGrams = Dedup.strictGrams(docs, textCol, idCol, n)
      .select(col(idCol), explode(array_distinct(col("grams"))).as("g"))
    val benchGrams = Dedup.strictGrams(benchmark, textCol, idCol, n)
      .select(explode(col("grams")).as("g"))
      .distinct()
    trainGrams.join(benchGrams, "g")
      .groupBy(idCol)
      .agg(count(lit(1)).as("shared_ngrams"))
  }

  /** The rows of `docs` that survive decontamination: everything with
    * fewer than `minShared` distinct n-grams in common with the
    * benchmark set ([[contamination]]'s anti-join twin). */
  def decontaminate(
      docs: DataFrame,
      benchmark: DataFrame,
      n: Int = 8,
      minShared: Int = 1,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame =
    docs.join(
      contamination(docs, benchmark, n, textCol, idCol)
        .filter(col("shared_ngrams") >= minShared)
        .select(idCol),
      Seq(idCol), "left_anti")

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
