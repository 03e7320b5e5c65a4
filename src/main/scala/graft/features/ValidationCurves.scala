package graft.features

import org.apache.spark.ml.Estimator
import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.evaluation.MulticlassClassificationEvaluator
import org.apache.spark.ml.param.ParamMap
import org.apache.spark.ml.tuning.CrossValidator
import org.apache.spark.sql.{DataFrame, SparkSession}

/** sklearn `validation_curve` analog: k-fold cross-validated accuracy
  * across one hyperparameter axis (reference:
  * spark_ml_features.py:49-85).
  *
  * The reference resolves the parameter axis dynamically with Python
  * `getattr(classifier, param_name)` (:72); the Scala equivalent is
  * `Params.getParam(paramName)`, which works for any `Estimator`.
  *
  * Instead of the reference's matplotlib plot (out of engine scope,
  * SURVEY.md §2.1 #5) the curve is returned as a small DataFrame
  * `(param_value: double, avg_metric: double)` — the engine-side
  * artifact a client would plot.
  *
  * Scale notes: CV cost is folds × gridpoints fits; each
  * LogisticRegression iteration is a distributed treeAggregate. MLlib's
  * CrossValidator can run grid points concurrently — `parallelism` is
  * surfaced and defaults to 4 (the reference fits strictly
  * sequentially).
  */
object ValidationCurves {
  /** np.logspace(-6, -1, 5), the reference's default axis. */
  val DefaultParamRange: Seq[Double] =
    (0 until 5).map(i => math.pow(10, -6.0 + 1.25 * i))

  /** Deterministic k-fold assignment for [[apply]]'s `foldCol` path:
    * `fold = id mod numFolds` — the sklearn `KFold(shuffle=False)`
    * spirit made id-stable. Unlike the seeded-random default (MLlib
    * `kFold` RDD sampling, not SQL-expressible), this assignment is a
    * pure arithmetic fact of the frame: the registered
    * `validation_curves_folds` row pins it (fold ids + per-fold
    * counts) against the DuckDB oracle, shrinking the fit's unproven
    * surface to the optimizer iterations proper. */
  def foldAssignments(
      df: DataFrame,
      id: org.apache.spark.sql.Column,
      numFolds: Int = 3,
      outputCol: String = "fold"): DataFrame = {
    require(numFolds >= 2, s"numFolds must be >= 2, got $numFolds")
    df.withColumn(outputCol,
      org.apache.spark.sql.functions.pmod(id.cast("long"),
        org.apache.spark.sql.functions.lit(numFolds.toLong)).cast("int"))
  }

  def apply(
      spark: SparkSession,
      df: DataFrame,
      paramName: String = "regParam",
      paramRange: Seq[Double] = DefaultParamRange,
      labelCol: String = "label",
      estimator: Option[Estimator[_]] = None,
      numFolds: Int = 3,
      parallelism: Int = 4,
      seed: Long = 42L,
      foldCol: Option[String] = None): DataFrame = {
    val est = estimator.getOrElse(
      new LogisticRegression().setLabelCol(labelCol).setFeaturesCol("features"))
    val param = est.getParam(paramName)
    val grid: Array[ParamMap] =
      paramRange.map(v => ParamMap(param.asInstanceOf[
        org.apache.spark.ml.param.Param[Any]].w(v))).toArray
    val evaluator = new MulticlassClassificationEvaluator()
      .setLabelCol(labelCol).setMetricName("accuracy")
    val cv = new CrossValidator()
      .setEstimator(est)
      .setEstimatorParamMaps(grid)
      .setEvaluator(evaluator)
      .setNumFolds(numFolds)
      .setParallelism(parallelism)
      .setSeed(seed)
    // deterministic pre-assigned folds ([[foldAssignments]]) instead of
    // the seeded-random kFold sampling; values must sit in [0, numFolds)
    foldCol.foreach(cv.setFoldCol)
    val model = cv.fit(df)
    import spark.implicits._
    paramRange.zip(model.avgMetrics.toSeq)
      .toDF("param_value", "avg_metric")
  }
}
