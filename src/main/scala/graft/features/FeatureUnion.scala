package graft.features

import org.apache.spark.ml.feature.{StandardScaler, VectorAssembler}
import org.apache.spark.sql.DataFrame

/** sklearn-`FeatureUnion` analog: z-score the `features` vector into
  * `scaled_features`, then concatenate original + scaled into
  * `combined_features` (reference: spark_ml_features.py:161-184).
  *
  * Quirk Q6 replicated: if `transformTypes` is given and does not
  * contain "scaled", the input is returned unchanged — observable API
  * behavior of the reference (spark_ml_features.py:184).
  *
  * Scale notes: StandardScaler.fit is one pass computing per-dimension
  * mean/variance (treeAggregate); transform and the concat assembler
  * are narrow. Nothing here shuffles.
  */
object FeatureUnion {
  def apply(
      df: DataFrame,
      featuresCol: String = "features",
      transformTypes: Option[Seq[String]] = None): DataFrame = {
    if (transformTypes.exists(ts => !ts.contains("scaled"))) return df // Q6
    val scaled = new StandardScaler()
      .setWithStd(true).setWithMean(true)
      .setInputCol(featuresCol).setOutputCol("scaled_features")
      .fit(df)
      .transform(df)
    new VectorAssembler()
      .setInputCols(Array(featuresCol, "scaled_features"))
      .setOutputCol("combined_features")
      .transform(scaled)
  }
}
