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
