package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-pass column profiler — the `SUMMARIZE` / `df.describe()` data-
  * quality primitive the reference's notebook users run before every
  * `load_sample_data` (`/root/reference/spark_ml_features_local.py:36-45`
  * eyeballs the loaded frame with `show()`; this is that step made
  * queryable): per column, row count, null count, distinct count and
  * min/max, emitted as one row per column.
  *
  * Two paths, one output shape:
  *  - [[profile]] — EXACT distinct counts. Catalyst plans n distinct
  *    aggregates as ONE Expand (each input row replicated once per
  *    profiled column) feeding a single partial+final aggregate pair,
  *    so the job stays one scan + one shuffle — but that shuffle
  *    carries rows × columns. VALIDATION-SCALE path: it exists to be
  *    oracle-comparable bit-for-bit (DuckDB `count(DISTINCT …)`).
  *  - [[profileApprox]] — the 100 TB default. HyperLogLog++
  *    (`approx_count_distinct`) replaces the exact distincts, which
  *    collapses the plan to a plain partial+final aggregate over the
  *    un-expanded scan: constant state per column per task, no
  *    row-multiplication, one row out per column. rsd defaults to 5%,
  *    the Spark built-in default.
  *
  * min/max are CAST to string AFTER aggregating (n typed extrema, not
  * n typed columns in the output), so heterogeneous tables profile
  * into one frame. All stats tolerate full-null columns (count=0,
  * min/max null).
  */
object Profile {

  /** Exact profile of `cols`: one output row per column, columns
    * `(column_name, n_rows, n_nulls, n_distinct, min_val, max_val)`.
    * One scan, one Expand-fed aggregate; see scale note above. */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame =
    assemble(df, cols, exact = true)

  /** HLL++ profile — identical shape, `n_distinct` is the
    * `approx_count_distinct` estimate. No Expand: the at-scale path. */
  def profileApprox(df: DataFrame, cols: Seq[String],
      rsd: Double = 0.05): DataFrame =
    assemble(df, cols, exact = false, rsd)

  private def assemble(df: DataFrame, cols: Seq[String], exact: Boolean,
      rsd: Double = 0.05): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"__nn_$c"),
        (if (exact) countDistinct(col(c))
         else approx_count_distinct(col(c), rsd)).as(s"__nd_$c"),
        min(col(c)).cast("string").as(s"__mn_$c"),
        max(col(c)).cast("string").as(s"__mx_$c"))
    }
    val one = df.agg(count(lit(1)).as("__n_rows"), aggs: _*)
    val perCol = cols.map { c =>
      struct(
        lit(c).as("column_name"),
        col("__n_rows").as("n_rows"),
        (col("__n_rows") - col(s"__nn_$c")).as("n_nulls"),
        col(s"__nd_$c").as("n_distinct"),
        col(s"__mn_$c").as("min_val"),
        col(s"__mx_$c").as("max_val"))
    }
    one.select(explode(array(perCol: _*)).as("p")).select("p.*")
  }
}
