package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew tools. Spark already partial-aggregates simple aggregates
  * map-side (hot grouping keys rarely hurt a plain groupBy), and AQE
  * splits skewed sort-merge-join partitions at runtime. The remaining
  * gap is EXPENSIVE or size-accumulating aggregates (collect_list,
  * approx sketches with big state) on power-law keys — there the
  * two-phase salted aggregate bounds any single task's share of a hot
  * key at 1/`saltBuckets`.
  */
object Skew {

  /** Two-phase salted aggregation: groupBy (key, salt) with the partial
    * aggregate, then groupBy (key) merging the per-salt partials. The
    * caller supplies both phases, e.g. partial `count` merged by `sum`,
    * or partial `collect_set` merged by `array_distinct(flatten(...))`.
    * Salt comes from `monotonically_increasing_id` — a row-content hash
    * would send IDENTICAL duplicate rows (the worst hot-key case) all
    * to one bucket. The salt only routes rows; the merged result is
    * salt-independent, so the id's run-to-run instability is harmless. */
  def saltedAgg(
      df: DataFrame,
      keyCols: Seq[String],
      partial: Column,
      merge: Column => Column,
      saltBuckets: Int = 16,
      outputCol: String = "agg"): DataFrame = {
    val salted = df.withColumn("_salt",
      pmod(monotonically_increasing_id(), lit(saltBuckets.toLong)))
    val phase1 = salted
      .groupBy((keyCols :+ "_salt").map(col): _*)
      .agg(partial.as("_partial"))
    phase1
      .groupBy(keyCols.map(col): _*)
      .agg(merge(col("_partial")).as(outputCol))
  }

  /** Salted skew join: every fact row gets a random salt in
    * [0, saltBuckets), the dim side is replicated once per salt value,
    * and the join key becomes the composite (keys..., salt) — so a hot
    * fact key's rows land on `saltBuckets` different reducers instead
    * of one, while each still finds its dim match (the replica with its
    * salt). The salt is dropped after the join; results are
    * bit-identical to the unsalted join.
    *
    * When to reach for this instead of letting Spark handle it:
    * - `broadcast(dim)` is the FIRST choice when dim fits in memory —
    *   no shuffle at all, skew irrelevant. Salting matters when the dim
    *   side is too big to broadcast but still much smaller than fact
    *   (replication costs saltBuckets × |dim|).
    * - AQE's OptimizeSkewedJoin splits oversized post-shuffle
    *   partitions at runtime and covers most batch skew transparently.
    *   Explicit salting remains for the cases AQE can't reach: a single
    *   key too hot for partition-splitting to help downstream
    *   aggregation, stream-static joins (no AQE re-plan mid-stream),
    *   and deterministic pre-planned layouts where runtime re-plans are
    *   unwanted.
    *
    * Replication breaks unmatched-DIM-row semantics (each unmatched dim
    * row would surface once per salt), so only join types that never
    * emit unmatched right rows are allowed: inner / left (outer) /
    * left_semi / left_anti. Unmatched FACT rows are safe — each fact
    * row carries exactly one salt. */
  def saltedJoin(
      fact: DataFrame,
      dim: DataFrame,
      keys: Seq[String],
      saltBuckets: Int = 16,
      joinType: String = "inner"): DataFrame = {
    val allowed = Set("inner", "left", "left_outer", "leftouter",
      "left_semi", "leftsemi", "left_anti", "leftanti")
    require(allowed(joinType.toLowerCase),
      s"saltedJoin replicates the dim side; join type '$joinType' would " +
        "multiply unmatched dim rows (use inner/left/left_semi/left_anti)")
    require(saltBuckets > 0, s"saltBuckets must be > 0, got $saltBuckets")
    // monotonically_increasing_id, not a row-content hash: identical
    // duplicate fact rows (the worst hot-key case) must spread across
    // buckets, and a content hash would pin them all to one
    val salted = fact.withColumn("_salt",
      pmod(monotonically_increasing_id(), lit(saltBuckets.toLong))
        .cast("int"))
    val replicated = dim.withColumn("_salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    salted.join(replicated, keys :+ "_salt", joinType).drop("_salt")
  }

  /** Salted distinct-collect: bounds per-task state for collect_set on
    * a hot key (the motivating case — list/set aggregates have no
    * map-side partial cap). */
  def saltedCollectSet(
      df: DataFrame,
      keyCols: Seq[String],
      valueCol: String,
      saltBuckets: Int = 16,
      outputCol: String = "values"): DataFrame =
    saltedAgg(df, keyCols,
      partial = collect_set(col(valueCol)),
      merge = p => array_distinct(flatten(collect_list(p))),
      saltBuckets = saltBuckets,
      outputCol = outputCol)
}
