package graft.features

import org.apache.spark.ml.feature.{StringIndexer, VectorAssembler}
import org.apache.spark.sql.DataFrame

/** Assemble numeric feature columns into a `features` Vector and index a
  * string label into `label`.
  *
  * Follows the local-variant semantics (SURVEY.md Q1): the Databricks
  * variant keeps the raw string label (which breaks every downstream
  * fit); the local variant StringIndexes it first
  * (spark_ml_features_local.py:60-82) and that is the behavior
  * replicated here. Output is projected to exactly
  * `(features: Vector, label: double)` as the reference does
  * (spark_ml_features.py:46).
  *
  * Scale notes: VectorAssembler is a pure narrow projection (no
  * shuffle). StringIndexer's fit is one distinct-count aggregation over
  * the label column — at 100 TB that is a single partial+final agg on a
  * low-cardinality column, cheap; the transform is a broadcast of the
  * label→index map inside a codegen'd expression.
  */
object PrepareFeatures {
  val DefaultLabelCol = "label"

  def apply(
      df: DataFrame,
      featureCols: Seq[String],
      labelCol: String,
      outputFeaturesCol: String = "features"): DataFrame = {
    val indexed =
      if (df.schema(labelCol).dataType == org.apache.spark.sql.types.StringType) {
        new StringIndexer()
          .setInputCol(labelCol)
          .setOutputCol(DefaultLabelCol)
          .fit(df)
          .transform(df)
      } else df.withColumnRenamed(labelCol, DefaultLabelCol)
    new VectorAssembler()
      .setInputCols(featureCols.toArray)
      .setOutputCol(outputFeaturesCol)
      .transform(indexed)
      .select(outputFeaturesCol, DefaultLabelCol)
  }
}
