package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoders}
import org.apache.spark.sql.functions._

import graft.functions.{BottomK, BottomKMerge}

/** Query-level compositions of the bottom-k / KMV sketch
  * ([[graft.functions.BottomK]]) — distinct-count artifacts, set
  * overlap, and sample quantiles, all deterministic and
  * merge-order-independent, so every estimate is restated bit-exactly
  * by the DuckDB oracle (unlike the HLL and Misra-Gries siblings,
  * whose approximate regimes gate tolerances instead).
  *
  * The persisted artifact is two plain parquet ARRAY columns (sorted
  * 60-bit md5 hashes + payloads) — engine-neutral, unlike HLL register
  * blobs: any SQL engine can merge or audit stored sketches. */
object Sketches {

  private val hashEnc =
    Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble)

  private def bkAgg(k: Int) = udaf(new BottomK(k), hashEnc)

  private def bkMergeAgg(k: Int) =
    udaf(new BottomKMerge(k), Encoders.product[graft.functions.BkState])

  /** Per-group KMV sketch of `keyCol`'s distinct values plus the exact
    * row count. One bounded state row per group; the Exchange carries
    * ≤ k entries per map task, never the keyed domain. NULL keys are
    * not countable values — filtered here, mirrored by the oracle's
    * hash of non-null keys only. */
  def kmvSketch(df: DataFrame, groupCol: String, keyCol: String,
      k: Int = BottomK.DefaultK): DataFrame =
    df.filter(col(keyCol).isNotNull)
      .groupBy(col(groupCol))
      .agg(bkAgg(k)(BottomK.hash64(col(keyCol)), lit(0.0)).as("sk"),
        count(lit(1)).as("n_rows"))

  /** Merge stored sketch rows (any number of batches, any order) —
    * the `hll_union_agg` analog. The merged state equals the one-shot
    * sketch over the unioned raw inputs (min-k of a set union),
    * which is what lets the oracle restate a split/persist/merge
    * workflow from the raw table. */
  def kmvMerge(sketches: DataFrame, groupCol: String,
      k: Int = BottomK.DefaultK): DataFrame =
    // the product encoder flattens BkState into a two-arg UDF
    // (hashes, values) — same mechanics as the (hash, payload) tuple
    sketches.groupBy(col(groupCol))
      .agg(bkMergeAgg(k)(col("sk.hashes"), col("sk.values")).as("sk"),
        sum(col("n_rows")).as("n_rows"))

  /** Estimate view of a sketch frame: distinct estimate (EXACT when
    * the sketch never filled) alongside the exact row volume. */
  def kmvEstimate(sketches: DataFrame, groupCol: String,
      k: Int = BottomK.DefaultK): DataFrame =
    sketches.select(col(groupCol), col("n_rows"),
      BottomK.estimateDistinct(col("sk"), k).as("n_distinct_est"))

  /** KMV set algebra between two groups' sketches (Beyer et al.,
    * SIGMOD'07): the k smallest hashes of the UNION of two sketches
    * are the union's own sketch, and the fraction of them present in
    * BOTH input sketches estimates the Jaccard — intersection size
    * follows without touching the raw sets. Input: the two-row result
    * of [[kmvSketch]] filtered to `groupA`/`groupB`; output: one row
    * with per-side, union and intersection estimates.
    *
    * Every arithmetic step is spelled operand-for-operand like the
    * oracle SQL (union via sorted-distinct concat truncated to k;
    * estimates via (k−1)·2⁶⁰/h₍ₖ₎ with the sub-k regime exact), so
    * the Doubles are bit-identical across engines. The two sketch
    * rows are bounded (≤ k entries each) — the cross join is a 1×1 of
    * KB-sized rows, not a data join. */
  def kmvOverlap(sketches: DataFrame, groupCol: String,
      groupA: String, groupB: String,
      k: Int = BottomK.DefaultK): DataFrame = {
    // Guard against a typo'd group name (or an all-null key column):
    // a missing side would otherwise collapse the 1×1 cross join to an
    // EMPTY frame — a silent no-answer. The sketch frame is one
    // KB-sized row per group, so checking presence is one cheap pass.
    val present = sketches
      .filter(col(groupCol).isin(groupA, groupB))
      .select(col(groupCol).cast("string")).distinct()
      .collect().map(_.getString(0)).toSet
    require(Seq(groupA, groupB).forall(present),
      s"kmvOverlap: no sketch row for group(s) " +
        s"${Seq(groupA, groupB).filterNot(present).mkString(", ")} " +
        s"in column '$groupCol' (present: ${present.mkString(", ")})")
    val a = sketches.filter(col(groupCol) === groupA)
      .select(col("sk.hashes").as("ha"))
    val b = sketches.filter(col(groupCol) === groupB)
      .select(col("sk.hashes").as("hb"))
    val u = slice(array_sort(array_distinct(concat(col("ha"), col("hb")))),
      1, k)
    // |{h ∈ U : h ∈ A ∧ h ∈ B}| — hashes are distinct within each
    // side, so sizes count matches, not multiplicity
    val m = size(array_intersect(array_intersect(col("u"), col("ha")),
      col("hb")))
    def estOf(h: Column): Column = BottomK.estimateFromHashes(h, k)
    a.crossJoin(b)
      .withColumn("u", u)
      .withColumn("m", m)
      .select(
        lit(groupA).as("group_a"), lit(groupB).as("group_b"),
        estOf(col("ha")).as("n_a_est"),
        estOf(col("hb")).as("n_b_est"),
        estOf(col("u")).as("n_union_est"),
        (col("m").cast("double") / size(col("u")).cast("double"))
          .as("jaccard_est"),
        (col("m").cast("double") / size(col("u")).cast("double") *
          estOf(col("u"))).as("n_inter_est"))
  }

  /** The persistable BATCH artifact behind [[sampleQuantiles]] (r15):
    * per-group bottom-`m` sample sketch of (hash(idCol), valueCol) —
    * two plain parquet array columns plus the exact row count. Batches
    * persist their sketches; [[kmvMerge]] merges them (payloads ride
    * the two-pointer merge), and min-k of a set union makes the merged
    * state EQUAL to a one-shot pass — which is what lets the merged
    * quantile row answer the one-shot DuckDB oracle verbatim. */
  def sampleSketch(df: DataFrame, groupCol: String, idCol: String,
      valueCol: Column, m: Int): DataFrame =
    df.select(col(groupCol), BottomK.hash64(col(idCol)).as("h"),
        valueCol.cast("double").as("v"))
      .filter(col("h").isNotNull && col("v").isNotNull)
      .groupBy(col(groupCol))
      .agg(bkAgg(m)(col("h"), col("v")).as("sk"),
        count(lit(1)).as("n_rows"))

  /** Quantiles from (already-merged) sample sketches, with the exact
    * legs recomputed from the raw frame for the honest-error read —
    * the answer-later half of the [[sampleSketch]] lifecycle. Output
    * columns match [[sampleQuantiles]] exactly. */
  def sampleQuantilesFromSketches(sketches: DataFrame, df: DataFrame,
      groupCol: String, valueCol: Column, probs: Seq[Double]): DataFrame = {
    val tags = probs.map(p => (p * 100).round.toInt)
    require(tags.distinct.size == probs.size,
      s"probs ${probs.mkString(", ")} collide after integer-percent rounding")
    val probsSql = probs.map(p => s"${p}D").mkString("array(", ", ", ")")
    val sampled = sketches
      .select(col(groupCol), col("n_rows"), explode(col("sk.values")).as("v"))
      .groupBy(col(groupCol), col("n_rows"))
      .agg(expr(s"percentile(v, $probsSql)").as("q_sample"),
        count(lit(1)).as("n_sampled"))
    val exact = df
      .select(col(groupCol), valueCol.cast("double").as("v"))
      .filter(col("v").isNotNull)
      .groupBy(col(groupCol))
      .agg(expr(s"percentile(v, $probsSql)").as("q_exact"))
    val qCols = probs.indices.flatMap { i =>
      Seq(round(col("q_sample").getItem(i), 6).as(s"p${tags(i)}_sample"),
        round(col("q_exact").getItem(i), 6).as(s"p${tags(i)}_exact"))
    }
    sampled.join(exact, groupCol)
      .select(col(groupCol) +: col("n_rows") +: col("n_sampled") +:
        qCols: _*)
  }

  /** Per-group quantiles from a bottom-k uniform row sample: hash a
    * row-unique id, carry `valueCol` as payload, take the ≤ m rows
    * with the smallest hashes (a mergeable without-replacement uniform
    * sample), and run the EXACT interpolated percentile over the
    * sample — rank error O(1/√m), zero error when the group fits in m.
    *
    * This is the persisted-quantile answer the HLL/MG artifacts could
    * not give: `approx_percentile`'s GK summary is not exposed as a
    * storable value, but a bottom-k sample IS the artifact — two array
    * columns that merge across batches and re-answer any probability
    * later, with the sample quantile restated bit-exactly by the
    * oracle (the percentile == quantile_cont parity this repo proved
    * for robust_scaling). Output carries the exact quantiles alongside
    * for the honest-error read, both rounded 6dp (the repo-wide
    * float-parity trick for interpolated quantiles). */
  def sampleQuantiles(df: DataFrame, groupCol: String, idCol: String,
      valueCol: Column, m: Int, probs: Seq[Double]): DataFrame = {
    // Output columns are tagged p<round(prob*100)> — probs that round
    // to the same integer percent (0.95 vs 0.951) would silently
    // collide into duplicate column names, so reject them up front.
    val tags = probs.map(p => (p * 100).round.toInt)
    require(tags.distinct.size == probs.size,
      s"sampleQuantiles: probs ${probs.mkString(", ")} collide after " +
        s"integer-percent rounding (tags ${tags.mkString(", ")}); use " +
        "probs at least 0.01 apart")
    val probsSql = probs.map(p => s"${p}D").mkString("array(", ", ", ")")
    val sk = df
      .select(col(groupCol), BottomK.hash64(col(idCol)).as("h"),
        valueCol.cast("double").as("v"))
      // a null id or measure has no hash rank / no quantile mass —
      // drop it here (the aggregator's primitive tuple input cannot
      // carry null; at 100 TB malformed rows are data, not crashes).
      // Mirrors percentile/quantile_cont's own null-skipping, so the
      // oracle needs no counterpart clause on a null-free fixture.
      .filter(col("h").isNotNull && col("v").isNotNull)
      .groupBy(col(groupCol))
      .agg(bkAgg(m)(col("h"), col("v")).as("sk"),
        count(lit(1)).as("n_rows"),
        expr(s"percentile(v, $probsSql)").as("q_exact"))
    // sample quantiles: explode the ≤ m payloads (bounded: groups × m
    // rows) and reuse the exact percentile — parity-proven vs DuckDB
    // quantile_cont
    val sampled = sk
      .select(col(groupCol), explode(col("sk.values")).as("v"))
      .groupBy(col(groupCol))
      .agg(expr(s"percentile(v, $probsSql)").as("q_sample"),
        count(lit(1)).as("n_sampled"))
    val qCols = probs.indices.flatMap { i =>
      val tag = tags(i)
      Seq(round(col("q_sample").getItem(i), 6).as(s"p${tag}_sample"),
        round(col("q_exact").getItem(i), 6).as(s"p${tag}_exact"))
    }
    sk.join(sampled, groupCol)
      .select(col(groupCol) +: col("n_rows") +: col("n_sampled") +:
        qCols: _*)
  }
}
