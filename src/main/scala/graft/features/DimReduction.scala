package graft.features

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.feature.PCA
import org.apache.spark.sql.DataFrame

/** Dimensionality reduction: KMeans cluster-id or PCA projection
  * (reference: spark_ml_features.py:186-209).
  *
  * - `method = "kmeans"`: fit KMeans(k) on `features`, append the
  *   cluster assignment as `prediction` (the reference's notion of
  *   "reduction to one categorical dimension").
  * - `method = "pca"`: fit PCA(k), append `pca_features`.
  * - anything else: IllegalArgumentException (reference raises
  *   ValueError).
  *
  * The reference leaves KMeans unseeded (SURVEY.md Q4); we default a
  * fixed seed for reproducibility.
  *
  * Scale notes: both are iterative MLlib fits — KMeans|| init + Lloyd
  * iterations and PCA's Gram-matrix/SVD are distributed treeAggregates;
  * the transforms are narrow projections. PCA's covariance step is
  * O(d^2) on the driver — fine for feature-engineering-sized d (tens to
  * low thousands), the regime this library targets.
  */
object DimReduction {
  val DefaultSeed = 42L

  def apply(
      df: DataFrame,
      method: String = "kmeans",
      k: Int = 2,
      featuresCol: String = "features",
      seed: Long = DefaultSeed): DataFrame = method match {
    case "kmeans" =>
      new KMeans().setK(k).setSeed(seed).setFeaturesCol(featuresCol)
        .fit(df).transform(df)
    case "pca" =>
      new PCA().setK(k).setInputCol(featuresCol).setOutputCol("pca_features")
        .fit(df).transform(df)
    case other =>
      throw new IllegalArgumentException(
        s"Unknown method: $other. Use 'kmeans' or 'pca'")
  }
}
