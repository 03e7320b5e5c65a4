package graft.features

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.NumericType

/** Robust (median/IQR) scaling of scalar numeric columns.
  *
  * Semantics match the reference's `robust_scaling`
  * (reference: spark_ml_features.py:130-159): for each selected column
  * append `{col}_scaled = (col - median) / IQR`, skipping columns whose
  * IQR <= 1e-10 (spark_ml_features.py:155). Per SURVEY.md Q3 the
  * default column set is the *numeric* columns only (the reference's
  * stated intent), and per Q7 all quantiles are computed on the input
  * DataFrame, never on previously appended `_scaled` columns.
  *
  * Scale design (100 TB): the reference runs one `approxQuantile` job
  * per column, sequentially. We instead compute the quantile triples for
  * ALL columns in a single aggregation job (one scan, partial+final agg,
  * fixed-size driver result: 3 doubles per column), then bake the
  * medians/IQRs into one literal projection that Catalyst constant-folds
  * into whole-stage codegen. Two paths:
  *   - exact  = sort-based `percentile` (matches DuckDB `quantile_cont`
  *     linear interpolation — used for the oracle-checked query).
  *     VALIDATION SCALE ONLY: Spark's sort-based `percentile` buffers a
  *     value→count multiset per partition, so on high-cardinality
  *     doubles its memory grows with the partition's distinct values —
  *     a cliff at 100 TB. Never the at-scale path;
  *   - approx = Greenwald–Khanna `approx_percentile` with relative
  *     error `quantileError` (the reference's own sketch; the at-scale
  *     default — bounded memory per partition, no global sort).
  */
object RobustScaling {
  val IqrGuard = 1e-10

  /** Columns eligible for scaling when the caller passes none. */
  def numericColumns(df: DataFrame): Seq[String] =
    df.schema.fields.collect {
      case f if f.dataType.isInstanceOf[NumericType] => f.name
    }.toSeq

  def apply(
      df: DataFrame,
      columns: Seq[String] = Nil,
      quantileError: Double = 0.05,
      exact: Boolean = false): DataFrame = {
    val cols = if (columns.nonEmpty) columns else numericColumns(df)
    if (cols.isEmpty) return df

    // One job computes q25/q50/q75 for every column at once.
    val qExprs: Seq[Column] = cols.map { c =>
      val quantiles = array(lit(0.25), lit(0.5), lit(0.75))
      val agg =
        if (exact) percentile(col(c).cast("double"), quantiles)
        else percentile_approx(col(c).cast("double"), quantiles,
          lit(math.max(1, math.ceil(1.0 / quantileError).toInt)))
      agg.as(c)
    }
    val row = df.agg(qExprs.head, qExprs.tail: _*).head()

    val scaled: Seq[(String, Column)] = cols.flatMap { c =>
      val idx = row.fieldIndex(c)
      if (row.isNullAt(idx)) None // all-null column
      else {
        val Seq(q25, q50, q75) = row.getSeq[Double](idx).toSeq
        val iqr = q75 - q25
        if (iqr <= IqrGuard) None // constant column: skip, as the reference does
        else Some(s"${c}_scaled" -> ((col(c) - lit(q50)) / lit(iqr)))
      }
    }
    scaled.foldLeft(df) { case (acc, (name, expr)) => acc.withColumn(name, expr) }
  }

  /** Exact-percentile variant whose results hash-match a DuckDB
    * `quantile_cont` oracle (SURVEY.md Q5). */
  def exactScaling(df: DataFrame, columns: Seq[String]): DataFrame =
    apply(df, columns, exact = true)

  /** Winsorization: clip each selected column into its `[lo, hi]`
    * quantile range, appended as `{col}_wins` — the outlier treatment a
    * feature pipeline applies when it wants to KEEP extreme rows but
    * bound their leverage (robust scaling's complement: scaling
    * re-centers, winsorizing caps).
    *
    * Scale design mirrors [[apply]]: ONE aggregation job computes the
    * (lo, hi) pair for every column at once (fixed-size driver result,
    * 2 doubles per column), then the clip is a literal
    * `least(greatest(x, lo), hi)` projection that constant-folds into
    * whole-stage codegen — zero extra shuffles, no per-column jobs.
    * Same exact-vs-GK-sketch dual as [[apply]]: `exact = true` is the
    * oracle path (matches DuckDB `quantile_cont`), `exact = false` the
    * bounded-memory at-scale default. All-null columns are skipped
    * (no quantile exists); a degenerate lo == hi column clips to the
    * constant, which is the definition, not a guard case. */
  def winsorize(
      df: DataFrame,
      columns: Seq[String] = Nil,
      lo: Double = 0.05,
      hi: Double = 0.95,
      quantileError: Double = 0.05,
      exact: Boolean = false): DataFrame = {
    require(lo >= 0 && hi <= 1 && lo < hi,
      s"need 0 <= lo < hi <= 1, got lo=$lo hi=$hi")
    val cols = if (columns.nonEmpty) columns else numericColumns(df)
    if (cols.isEmpty) return df

    val qExprs: Seq[Column] = cols.map { c =>
      val quantiles = array(lit(lo), lit(hi))
      val agg =
        if (exact) percentile(col(c).cast("double"), quantiles)
        else percentile_approx(col(c).cast("double"), quantiles,
          lit(math.max(1, math.ceil(1.0 / quantileError).toInt)))
      agg.as(c)
    }
    val row = df.agg(qExprs.head, qExprs.tail: _*).head()

    val clipped: Seq[(String, Column)] = cols.flatMap { c =>
      val idx = row.fieldIndex(c)
      if (row.isNullAt(idx)) None
      else {
        val Seq(qlo, qhi) = row.getSeq[Double](idx).toSeq
        Some(s"${c}_wins" ->
          least(greatest(col(c).cast("double"), lit(qlo)), lit(qhi)))
      }
    }
    clipped.foldLeft(df) { case (acc, (name, expr)) => acc.withColumn(name, expr) }
  }
}
