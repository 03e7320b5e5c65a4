package graft

/** Oracle SQL for SURVEY 2.1/2.3 feature-engineering rows (scaling, splits, indexers, seeded kmeans/PCA iteration siblings, frozen-coefficient scoring).
  * Split from the single-file registry (r15 verdict item 7); every key
  * mirrors a [[SparkEntry.queries]] registration with IDENTICAL column
  * names/aliases. Shared CTE derivations live in [[OracleSqlShared]]. */
private[graft] object OracleSqlFeatures {
  import OracleSqlShared._
  import SparkEntry.{ScoringCoefficients, ScoringIntercepts, PcaScoringLoadings}
  import graft.features.DimReduction

  // Seq, not Map (r17 advice #5 applied to the oracle registry too):
  // a within-family duplicate key survives to OracleSql.all's
  // duplicate require instead of last-wins-collapsing silently.
  val entries: Seq[(String, String)] = Seq(
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

    "feature_winsorize" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount,
        |  LEAST(GREATEST(l_quantity,
        |    (SELECT quantile_cont(l_quantity, 0.05) FROM lineitem)),
        |    (SELECT quantile_cont(l_quantity, 0.95) FROM lineitem)) AS l_quantity_wins,
        |  LEAST(GREATEST(l_extendedprice,
        |    (SELECT quantile_cont(l_extendedprice, 0.05) FROM lineitem)),
        |    (SELECT quantile_cont(l_extendedprice, 0.95) FROM lineitem)) AS l_extendedprice_wins,
        |  LEAST(GREATEST(l_discount,
        |    (SELECT quantile_cont(l_discount, 0.05) FROM lineitem)),
        |    (SELECT quantile_cont(l_discount, 0.95) FROM lineitem)) AS l_discount_wins
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

    // Literal oracle, deliberately: the grid values are spec constants
    // (PredefinedSplit.defaultGrid) and Q2's trainRatio=1.0 makes every
    // validation metric the empty-set NaN — the expected artifact is
    // fully determined by the contract, so the oracle STATES it and the
    // row fails if the tuner ever stops honoring the grid or Q2.
    "predefined_split_grid" ->
      """SELECT 0.1 AS reg_param, TRUE AS metric_is_empty_nan
        |UNION ALL
        |SELECT 0.01 AS reg_param, TRUE AS metric_is_empty_nan""".stripMargin,

    // StringIndexer = frequency-desc dense rank, ties broken by value asc
    // (MLlib frequencyDesc semantics); VectorAssembler = identity cast.
    "prepare_features" ->
      """WITH counts AS (
        |  SELECT c_mktsegment, COUNT(*) AS cnt FROM customer GROUP BY 1
        |), idx AS (
        |  SELECT c_mktsegment,
        |    CAST(dense_rank() OVER (ORDER BY cnt DESC, c_mktsegment) - 1 AS DOUBLE) AS label
        |  FROM counts
        |)
        |SELECT i.label,
        |  CAST(c.c_acctbal  AS DOUBLE) AS features_0,
        |  CAST(c.c_nationkey AS DOUBLE) AS features_1,
        |  CAST(c.c_custkey  AS DOUBLE) AS features_2
        |FROM customer c JOIN idx i USING (c_mktsegment)""".stripMargin,

    // Round 13 (r12 verdict item 8): the CrossValidator's fold
    // assignment under the oracle. fold = custkey mod 3 (the foldCol
    // frame the registered validation_curves fit trains on); n_labels
    // restates distinct label = distinct mktsegment (the indexing is a
    // bijection, pinned by prepare_features above).
    "validation_curves_folds" ->
      """SELECT CAST(c_custkey % 3 AS INT) AS fold,
        |  COUNT(*) AS n_rows,
        |  COUNT(DISTINCT c_mktsegment) AS n_labels
        |FROM customer GROUP BY 1""".stripMargin,

    // Round 11 (VERDICT items 1-4): the deterministic halves of the
    // MLlib family under the oracle — hash-init KMeans, frozen-loadings
    // PCA projection, frozen-coefficients softmax scoring, and the
    // evaluator's accuracy arithmetic over a deterministic predictions
    // frame (label restated via the prepare_features mapping).
    "dim_reduction_kmeans_hashinit" -> kmeansHashInitOracle,

    "dim_reduction_kmeans_lloyd" -> kmeansLloydOracle(1),

    "dim_reduction_kmeans_lloyd2" -> kmeansLloydOracle(2),

    "dim_reduction_pca_scoring" -> pcaScoringOracle,

    // One power-iteration step re-derived end-to-end (r15): the same
    // idHash draw as the kmeans siblings seeds v0; the Gram-vector
    // product is three SUM aggregates over the corpus; each normalized
    // component is ROUND(·, 6) before reuse — the kmeansLloyd
    // determinism contract, so summation-order ulps cannot propagate.
    "dim_reduction_pca_power" ->
      s"""WITH f AS MATERIALIZED (
         |  SELECT c_custkey, c_acctbal, c_nationkey,
         |    CAST(c_acctbal AS DOUBLE) AS x0,
         |    CAST(c_nationkey AS DOUBLE) AS x1,
         |    CAST(c_custkey AS DOUBLE) AS x2
         |  FROM customer
         |), draw AS (
         |  SELECT x0, x1, x2 FROM f
         |  ORDER BY (c_custkey % 1048573) * ${DimReduction.KmeansHashMultiplier} % 1048573, c_custkey
         |  LIMIT 1
         |), v0 AS (
         |  SELECT ROUND(x0 / sqrt(x0*x0 + x1*x1 + x2*x2), 6) AS u0,
         |    ROUND(x1 / sqrt(x0*x0 + x1*x1 + x2*x2), 6) AS u1,
         |    ROUND(x2 / sqrt(x0*x0 + x1*x1 + x2*x2), 6) AS u2
         |  FROM draw
         |), s AS (
         |  SELECT
         |    SUM(x0 * (x0*u0 + x1*u1 + x2*u2)) AS s0,
         |    SUM(x1 * (x0*u0 + x1*u1 + x2*u2)) AS s1,
         |    SUM(x2 * (x0*u0 + x1*u1 + x2*u2)) AS s2
         |  FROM f, v0
         |), v AS (
         |  SELECT ROUND(s0 / sqrt(s0*s0 + s1*s1 + s2*s2), 6) AS w0,
         |    ROUND(s1 / sqrt(s0*s0 + s1*s1 + s2*s2), 6) AS w1,
         |    ROUND(s2 / sqrt(s0*s0 + s1*s1 + s2*s2), 6) AS w2
         |  FROM s
         |)
         |SELECT f.c_custkey, f.c_acctbal, f.c_nationkey,
         |  w0 AS v_0, w1 AS v_1, w2 AS v_2,
         |  floor((x0*w0 + x1*w1 + x2*w2) * 1000000.0 + 0.5) / 1000000.0 AS pc1_power
         |FROM f, v""".stripMargin,

    "probability_scoring" -> probabilityScoringOracle,

    "evaluator_accuracy" ->
      """WITH counts AS (
        |  SELECT c_mktsegment, COUNT(*) AS cnt FROM customer GROUP BY 1
        |), idx AS (
        |  SELECT c_mktsegment,
        |    CAST(dense_rank() OVER (ORDER BY cnt DESC, c_mktsegment) - 1 AS DOUBLE) AS label
        |  FROM counts
        |)
        |SELECT CAST(SUM(CASE WHEN i.label = CAST(c.c_custkey % 5 AS DOUBLE)
        |                     THEN 1 ELSE 0 END) AS DOUBLE)
        |  / CAST(COUNT(*) AS DOUBLE) AS accuracy
        |FROM customer c JOIN idx i USING (c_mktsegment)""".stripMargin,

    // StandardScaler(withMean,withStd) = (x - avg(x)) / stddev_samp(x).
    "feature_union" ->
      """WITH counts AS (
        |  SELECT c_mktsegment, COUNT(*) AS cnt FROM customer GROUP BY 1
        |), idx AS (
        |  SELECT c_mktsegment,
        |    CAST(dense_rank() OVER (ORDER BY cnt DESC, c_mktsegment) - 1 AS DOUBLE) AS label
        |  FROM counts
        |), base AS (
        |  SELECT i.label,
        |    CAST(c.c_acctbal  AS DOUBLE) AS f0,
        |    CAST(c.c_nationkey AS DOUBLE) AS f1,
        |    CAST(c.c_custkey  AS DOUBLE) AS f2
        |  FROM customer c JOIN idx i USING (c_mktsegment)
        |), stats AS (
        |  SELECT avg(f0) AS m0, stddev_samp(f0) AS s0,
        |         avg(f1) AS m1, stddev_samp(f1) AS s1,
        |         avg(f2) AS m2, stddev_samp(f2) AS s2
        |  FROM base
        |)
        |SELECT label,
        |  f0 AS features_0, f1 AS features_1, f2 AS features_2,
        |  ROUND((f0 - m0) / s0, 6) AS scaled_features_0,
        |  ROUND((f1 - m1) / s1, 6) AS scaled_features_1,
        |  ROUND((f2 - m2) / s2, 6) AS scaled_features_2,
        |  f0 AS combined_features_0, f1 AS combined_features_1, f2 AS combined_features_2,
        |  ROUND((f0 - m0) / s0, 6) AS combined_features_3,
        |  ROUND((f1 - m1) / s1, 6) AS combined_features_4,
        |  ROUND((f2 - m2) / s2, 6) AS combined_features_5
        |FROM base, stats""".stripMargin,
  )
}
