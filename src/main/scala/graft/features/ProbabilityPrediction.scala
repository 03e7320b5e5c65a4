package graft.features

import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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

  /** The deterministic SCORING half of [[apply]] (round 11): multinomial
    * softmax scoring against a FIXED coefficient matrix —
    * `coefficients(j)` is class `j`'s length-d weight row, `intercepts(j)`
    * its bias. Appends `prob_0..prob_{k-1}` (rounded `roundAt` dp) and
    * `prediction` (argmax class as double, ties toward the smallest
    * class — MLlib's `Vector.argmax` first-max rule).
    *
    * This is exactly what `LogisticRegressionModel.transform` computes
    * (margins `b_j + w_j·x`, softmax, argmax) with the iterative L-BFGS
    * *fit* factored out: FeaturesSpec ties this scoring applied to a
    * real fitted `coefficientMatrix`/`interceptVector` to the model's
    * own `probability`/`prediction` columns, and the registered query
    * runs it with frozen literal coefficients so the arithmetic is
    * hash-verifiable in DuckDB. Determinism contract: margins
    * left-fold from the intercept in column order; the softmax
    * denominator sums `exp(m_0)+…+exp(m_{k-1})` left-associated with NO
    * max-subtraction (MLlib's max-shift is a numerical-stability
    * identity; callers must keep margins in exp's comfort zone, which
    * frozen ~1e-4-scale coefficients do) — the oracle states the same
    * order. Argmax compares raw margins, not rounded probabilities, so
    * the tie-break never depends on the output rounding.
    *
    * Scale shape: zero-shuffle codegen projection; the coefficient
    * matrix is a k×(d+1) literal (model-artifact-sized). */
  def score(
      df: DataFrame,
      coefficients: Seq[Seq[Double]],
      intercepts: Seq[Double],
      featureCols: Seq[String],
      roundAt: Int = 6): DataFrame = {
    val k = coefficients.length
    require(k >= 2, s"need >= 2 classes, got $k")
    require(intercepts.length == k, "one intercept per class")
    require(coefficients.forall(_.length == featureCols.length),
      s"each coefficient row must have ${featureCols.length} entries")
    val feats = featureCols.map(c => col(c).cast("double"))
    val margins = coefficients.zip(intercepts).map { case (w, b) =>
      feats.zipWithIndex.foldLeft(lit(b): org.apache.spark.sql.Column) {
        case (acc, (x, i)) => acc + x * lit(w(i))
      }
    }
    val denom = margins.map(exp).reduce(_ + _)
    val probs = margins.zipWithIndex.map { case (m, j) =>
      round(exp(m) / denom, roundAt).as(s"prob_$j")
    }
    val pred = array_sort(array(margins.zipWithIndex.map { case (m, j) =>
      struct(negate(m).as("neg_m"), lit(j).as("cls"))
    }: _*)).getItem(0).getField("cls").cast("double").as("prediction")
    df.select(df.columns.map(col).toSeq ++ probs :+ pred: _*)
  }
}
