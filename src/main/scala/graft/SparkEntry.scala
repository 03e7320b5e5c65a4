package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.features._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator from SURVEY.md §2 (and the §7 LLM-pipeline extensions)
  * registers a named query here; SQL-expressible ones also register a
  * DuckDB oracle in [[oracleSql]] with IDENTICAL column names/aliases.
  */
object SparkEntry {

  private def lineitem(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/lineitem.parquet")
  private def customer(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/customer.parquet")

  /** customer with `(features, label)` — the ML-pipeline input frame
    * (label = c_mktsegment indexed, features = numeric customer cols). */
  private def customerFeatures(s: SparkSession, dir: String): DataFrame =
    PrepareFeatures(customer(s, dir),
      Seq("c_acctbal", "c_nationkey", "c_custkey"), "c_mktsegment")

  private def vecToArr(df: DataFrame, cols: String*): DataFrame =
    cols.foldLeft(df)((d, c) => d.withColumn(c,
      org.apache.spark.ml.functions.vector_to_array(col(c))))

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("robust_scaling")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.1 #7 robust_scaling — exact-percentile path (oracle parity, Q5).
    "robust_scaling" -> ((s, dir) =>
      RobustScaling(
        lineitem(s, dir).select("l_orderkey", "l_linenumber", "l_quantity",
          "l_extendedprice", "l_discount"),
        Seq("l_quantity", "l_extendedprice", "l_discount"),
        exact = true)),

    // §2.1 #11 add_split_column — deterministic custom branch (Q4):
    // everything outside one label value trains.
    "add_split_column" -> ((s, dir) =>
      SplitColumn.customByLabel(
        customer(s, dir).select("c_custkey", "c_mktsegment"),
        "c_mktsegment", "AUTOMOBILE")),

    // §2.1 #10 predefined_split filters — pushdown-friendly predicates.
    "predefined_split_train" -> ((s, dir) =>
      SplitColumn.trainSplit(SplitColumn.customByLabel(
        customer(s, dir).select("c_custkey", "c_acctbal", "c_mktsegment"),
        "c_mktsegment", "AUTOMOBILE"))),
    "predefined_split_test" -> ((s, dir) =>
      SplitColumn.testSplit(SplitColumn.customByLabel(
        customer(s, dir).select("c_custkey", "c_acctbal", "c_mktsegment"),
        "c_mktsegment", "AUTOMOBILE"))),

    // §2.1 #3 prepare_features — Vector output (no oracle; rows-only).
    "prepare_features" -> ((s, dir) =>
      vecToArr(customerFeatures(s, dir), "features")),

    // §2.1 #8 feature_union — original ++ z-scored vector concat.
    "feature_union" -> ((s, dir) =>
      vecToArr(FeatureUnion(customerFeatures(s, dir)),
        "features", "scaled_features", "combined_features")),

    // §2.1 #9 dimensionality reduction — seeded KMeans / PCA.
    "dim_reduction_kmeans" -> ((s, dir) =>
      vecToArr(DimReduction(customerFeatures(s, dir), "kmeans", k = 3),
        "features")),
    "dim_reduction_pca" -> ((s, dir) =>
      vecToArr(DimReduction(customerFeatures(s, dir), "pca", k = 2),
        "features", "pca_features")),

    // §2.1 #6 probability_prediction — LR fit+transform on same frame.
    "probability_prediction" -> ((s, dir) =>
      vecToArr(ProbabilityPrediction(customerFeatures(s, dir)),
        "probability")),

    // §2.1 #4 validation_curves — (param_value, avg_metric) curve.
    "validation_curves" -> ((s, dir) =>
      ValidationCurves(s, customerFeatures(s, dir),
        paramRange = Seq(0.001, 0.01, 0.1), numFolds = 3)),

    // §2.1 #10 predefined_split tuning — test-side predictions of the
    // train-fit model (Q2: which grid point wins is unspecified).
    "predefined_split_fit" -> ((s, dir) => {
      val withSplit = SplitColumn.customByLabel(
        customerFeatures(s, dir), "label", 0.0)
      val r = PredefinedSplit(withSplit)
      vecToArr(r.model.transform(r.test)
        .select("label", "prediction", "features"), "features")
    }),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "robust_scaling" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount,
        |  (l_quantity - (SELECT quantile_cont(l_quantity, 0.5) FROM lineitem))
        |    / ((SELECT quantile_cont(l_quantity, 0.75) FROM lineitem)
        |       - (SELECT quantile_cont(l_quantity, 0.25) FROM lineitem)) AS l_quantity_scaled,
        |  (l_extendedprice - (SELECT quantile_cont(l_extendedprice, 0.5) FROM lineitem))
        |    / ((SELECT quantile_cont(l_extendedprice, 0.75) FROM lineitem)
        |       - (SELECT quantile_cont(l_extendedprice, 0.25) FROM lineitem)) AS l_extendedprice_scaled,
        |  (l_discount - (SELECT quantile_cont(l_discount, 0.5) FROM lineitem))
        |    / ((SELECT quantile_cont(l_discount, 0.75) FROM lineitem)
        |       - (SELECT quantile_cont(l_discount, 0.25) FROM lineitem)) AS l_discount_scaled
        |FROM lineitem""".stripMargin,

    "add_split_column" ->
      """SELECT c_custkey, c_mktsegment,
        |  CAST(c_mktsegment <> 'AUTOMOBILE' AS INT) AS is_train
        |FROM customer""".stripMargin,

    "predefined_split_train" ->
      """SELECT c_custkey, c_acctbal, c_mktsegment,
        |  CAST(c_mktsegment <> 'AUTOMOBILE' AS INT) AS is_train
        |FROM customer WHERE c_mktsegment <> 'AUTOMOBILE'""".stripMargin,

    "predefined_split_test" ->
      """SELECT c_custkey, c_acctbal, c_mktsegment,
        |  CAST(c_mktsegment <> 'AUTOMOBILE' AS INT) AS is_train
        |FROM customer WHERE c_mktsegment = 'AUTOMOBILE'""".stripMargin,
  )
}
