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
  * surfaced and auto-sizes to the independent fit count (folds ×
  * gridpoints, capped at 16) when not given; the reference fits
  * strictly sequentially.
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
      parallelism: Int = 0,
      seed: Long = 42L,
      foldCol: Option[String] = None): DataFrame = {
    // parallelism <= 0 → auto: the CV runs folds × gridpoints fully
    // independent fits, so run them ALL concurrently (capped at 16 —
    // each fit is its own sequence of tiny driver-submitted jobs, and
    // past the fit count extra threads only contend). Changes no
    // result, only wall-clock (r19; the fixed 4 left 9 independent
    // fits 2.25-deep on an otherwise idle scheduler).
    val par =
      if (parallelism > 0) parallelism
      else math.min(16, math.max(1, paramRange.size * numFolds))
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
      .setParallelism(par)
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
