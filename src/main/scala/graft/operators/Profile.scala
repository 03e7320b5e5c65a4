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

  /** Fixed-width histogram of a numeric column: `nBins` equal-width
    * buckets over the column's exact [min, max], emitting
    * (bin_id, lo, hi, n) with empty bins PRESENT (count 0) — the
    * distribution-shape profiling step next to [[profile]]'s scalar
    * stats. The max value lands in the LAST bin (half-open buckets,
    * closed at the top).
    *
    * Determinism: bounds come from exact MIN/MAX aggregates; the
    * bucket index is floor((x−min)/width) — single IEEE ops on
    * engine-identical operands, so the assignment is reproducible
    * anywhere (no summation anywhere in the path). `lo`/`hi` are
    * rounded to 6dp for the report only; assignment uses the raw
    * arithmetic.
    *
    * Scale: one min/max aggregate (fixed-size state), then one
    * partial-combined count keyed by bin — output is `nBins` rows
    * regardless of input size; the bin spine is a driver-side range
    * so empty bins cost nothing. Nulls are excluded (they are
    * [[profile]]'s `n_nulls` business, not a bucket). */
  def histogram(
      df: DataFrame,
      column: String,
      nBins: Int = 20): DataFrame = {
    require(nBins >= 1, s"nBins must be >= 1, got $nBins")
    val x = col(column).cast("double")
    val b = df.where(x.isNotNull)
      .agg(min(x).as("mn"), max(x).as("mx")).head()
    require(!b.isNullAt(0), s"histogram: column '$column' is all null")
    val (mn, mx) = (b.getDouble(0), b.getDouble(1))
    val width = (mx - mn) / nBins
    val spark = df.sparkSession
    import spark.implicits._
    // half-away-from-zero at 6dp — the ROUND convention DuckDB and
    // Spark's `round` share (rint's half-even would diverge on exact
    // .5e-6 boundaries)
    def r6(v: Double): Double =
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val spine = (0 until nBins).map(i => (i,
      r6(mn + i * width), r6(mn + (i + 1) * width)))
      .toDF("bin_id", "lo", "hi")
    val binned =
      if (width == 0) df.where(x.isNotNull).select(lit(0).as("bin_id"))
      else df.where(x.isNotNull).select(
        least(lit(nBins - 1),
          floor((x - lit(mn)) / lit(width)).cast("int")).as("bin_id"))
    spine.join(
      binned.groupBy("bin_id").agg(count(lit(1)).as("n")),
      Seq("bin_id"), "left")
      .select(col("bin_id"), col("lo"), col("hi"),
        coalesce(col("n"), lit(0L)).as("n"))
  }

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
