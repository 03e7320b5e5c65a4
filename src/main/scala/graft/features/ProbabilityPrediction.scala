package graft.features

import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.sql.DataFrame

/** Fit a classifier and return per-class probability vectors — the
  * reference's stand-in for sklearn's calibrated `predict_proba`
  * (spark_ml_features.py:106-128; MLlib has no CalibratedClassifierCV,
  * as the reference itself notes at :109).
  *
  * Faithful to the reference: fit on the FULL frame and transform the
  * same frame (no holdout), then project `(label, probability,
  * prediction)`.
  */
object ProbabilityPrediction {
  def apply(
      df: DataFrame,
      labelCol: String = "label",
      featuresCol: String = "features",
      maxIter: Int = 100): DataFrame = {
    val lr = new LogisticRegression()
      .setLabelCol(labelCol).setFeaturesCol(featuresCol)
      .setMaxIter(maxIter)
      .setProbabilityCol("probability")
    lr.fit(df).transform(df).select(labelCol, "probability", "prediction")
  }
}
