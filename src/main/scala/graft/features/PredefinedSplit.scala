package graft.features

import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.evaluation.MulticlassClassificationEvaluator
import org.apache.spark.ml.param.ParamMap
import org.apache.spark.ml.tuning.{ParamGridBuilder, TrainValidationSplit, TrainValidationSplitModel}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** sklearn `PredefinedSplit` analog: split rows by a 0/1 flag column,
  * grid-tune on the train side only (reference:
  * spark_ml_features.py:211-246).
  *
  * Quirk Q2 replicated and documented: the reference passes
  * `trainRatio=1.0` to TrainValidationSplit, so its internal validation
  * set is empty and the metric used to pick the "best" grid point is
  * over an empty set — model selection across the grid is effectively
  * arbitrary. Callers (and tests) must not depend on WHICH grid point
  * wins; the returned model is "a model fit on the train split", which
  * is all the reference guarantees. We default trainRatio to 1.0 for
  * parity but surface it.
  */
object PredefinedSplit {
  final case class Result(
      model: TrainValidationSplitModel, train: DataFrame, test: DataFrame)

  def defaultGrid(lr: LogisticRegression): Array[ParamMap] =
    new ParamGridBuilder()
      .addGrid(lr.regParam, Array(0.1, 0.01))
      .build()

  def apply(
      df: DataFrame,
      splitCol: String = "is_train",
      labelCol: String = "label",
      trainRatio: Double = 1.0,
      parallelism: Int = 2): Result = {
    val train = df.filter(col(splitCol) === 1)
    val test = df.filter(col(splitCol) === 0)
    val lr = new LogisticRegression()
      .setLabelCol(labelCol).setFeaturesCol("features")
    val tvs = new TrainValidationSplit()
      .setEstimator(lr)
      .setEstimatorParamMaps(defaultGrid(lr))
      .setEvaluator(new MulticlassClassificationEvaluator()
        .setLabelCol(labelCol).setMetricName("accuracy"))
      .setTrainRatio(trainRatio) // 1.0 = reference parity (Q2)
      // grid points are independent fits; running them concurrently
      // (like ValidationCurves) changes no result, only wall-clock
      .setParallelism(math.max(1, parallelism))
      .setSeed(42L)
    Result(tvs.fit(train), train, test)
  }

  /** Persist the fitted tuning model (MLlib's own writer format:
    * params + best-model coefficients + validation metrics, readable
    * across sessions/clusters). The reference never persists its fits —
    * provided because any real user of a tuned model wants it back
    * without re-fitting; round-trip equality is spec'd.
    *
    * CAVEAT, spec-pinned: at the reference-parity `trainRatio = 1.0`
    * (Q2) the validation metrics are NaN, MLlib serializes them as the
    * JSON string "NaN", and `TrainValidationSplitModel.load` then fails
    * (json4s refuses JString(NaN) → double). A Q2-shaped fit is
    * persistable only via [[writeBestModel]]; this writer round-trips
    * whenever `trainRatio < 1` produces finite metrics. */
  def writeModel(result: Result, path: String): Unit =
    result.model.write.overwrite().save(path)

  /** Reload a [[writeModel]] artifact (binds to the active session). */
  def readModel(path: String): TrainValidationSplitModel =
    TrainValidationSplitModel.load(path)

  /** Persist only the winning LogisticRegression model — the artifact a
    * serving path actually loads, and the ONLY persistable artifact of
    * a Q2 (`trainRatio = 1.0`) fit (see [[writeModel]]'s caveat). */
  def writeBestModel(result: Result, path: String): Unit =
    result.model.bestModel
      .asInstanceOf[org.apache.spark.ml.classification.LogisticRegressionModel]
      .write.overwrite().save(path)

  /** Reload a [[writeBestModel]] artifact. */
  def readBestModel(
      path: String): org.apache.spark.ml.classification.LogisticRegressionModel =
    org.apache.spark.ml.classification.LogisticRegressionModel.load(path)

  /** The tuning run's observable artifact: one row per grid point with
    * its `regParam` value and the tuner's validation metric — the
    * ValidationCurves-shaped frame for [[apply]]'s fit. The GRID is
    * fully specified (params and row count are deterministic); the
    * METRIC column documents Q2 honestly — at the reference's
    * `trainRatio=1.0` the validation set is empty, so every metric is
    * the evaluator's empty-set value (NaN), which is exactly WHY the
    * winning grid point is arbitrary. A caller passing a real
    * `trainRatio < 1` gets meaningful metrics in the same schema. */
  def gridMetrics(result: Result): DataFrame = {
    val spark = result.train.sparkSession
    import spark.implicits._
    val params = result.model.getEstimatorParamMaps.map { pm =>
      pm.toSeq.collectFirst {
        case pp if pp.param.name == "regParam" =>
          pp.value.asInstanceOf[Double]
      }.getOrElse(Double.NaN)
    }
    params.zip(result.model.validationMetrics).toSeq
      .toDF("reg_param", "validation_metric")
  }
}
