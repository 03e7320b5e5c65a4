package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.features._
import graft.llm._
import graft.operators.{Events, Profile, RangeJoin, Relational, Sketches, Skew}
import graft.sources.Sources
import graft.streaming.StreamOps
import graft.SparkEntry._

/** The reference ml-feature surface (survey §2.1/§2.3: scaling, splits, dim reduction, probability scoring, validation curves) and its engine-primitive companions — one slice of [[SparkEntry.queries]].
  *
  * Registration bodies are the pre-split [[SparkEntry]] map entries
  * moved VERBATIM (r16 verdict item 7: the per-family OracleSql file
  * pattern applied to the query registry, which had regrown to 3,200+
  * lines). Shared fixtures/harnesses stay on [[SparkEntry]] as
  * private[graft] members, wildcard-imported here, so the bodies did
  * not change; [[SparkEntry.queries]] assembles the slices and pins
  * key-disjointness. */
private[graft] object EntryQueriesFeatures {
  // Seq, not Map (r17 advice #5): a key accidentally registered twice
  // in ONE literal would silently last-wins inside a Map before any
  // disjointness check could see it; as a Seq the duplicate survives
  // to SparkEntry.queries' require, which fails loudly.
  def entries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    // ------------------------------------------------ reference surface
    // §2.1 #7 robust_scaling — exact-percentile path (oracle parity, Q5).
    "robust_scaling" -> ((s, dir) =>
      RobustScaling(
        lineitem(s, dir).select("l_orderkey", "l_linenumber", "l_quantity",
          "l_extendedprice", "l_discount"),
        Seq("l_quantity", "l_extendedprice", "l_discount"),
        exact = true)),

    // §2.1 #7 companion: winsorize — clip to [p05, p95] instead of
    // re-centering. Same one-job quantile plan; exact path for the
    // quantile_cont oracle.
    "feature_winsorize" -> ((s, dir) =>
      RobustScaling.winsorize(
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

    // §2.1 #3 prepare_features — StringIndexer(label) + VectorAssembler;
    // assembler is identity on the 3 numeric inputs, so the scalar
    // projection is exactly SQL-expressible (oracle below).
    "prepare_features" -> ((s, dir) =>
      vecToScalars(customerFeatures(s, dir), "features" -> 3)),

    // §2.1 #8 feature_union — original ++ z-scored concat. z-scores are
    // rounded to 6dp (StandardScaler's treeAggregate mean/std vs the
    // oracle's avg/stddev_samp differ in ulps from summation order).
    "feature_union" -> ((s, dir) => {
      val fu = vecToScalars(FeatureUnion(customerFeatures(s, dir)),
        "features" -> 3, "scaled_features" -> 3, "combined_features" -> 6)
      (Seq("scaled_features_0", "scaled_features_1", "scaled_features_2",
        "combined_features_3", "combined_features_4", "combined_features_5"))
        .foldLeft(fu)((d, c) => d.withColumn(c, round(col(c), 6)))
    }),

    // §2.1 #9 dimensionality reduction — seeded KMeans / PCA (iterative
    // fits: ScalaTest-adjudicated, no SQL oracle).
    "dim_reduction_kmeans" -> ((s, dir) =>
      vecToScalars(DimReduction(customerFeatures(s, dir), "kmeans", k = 3),
        "features" -> 3)),
    "dim_reduction_pca" -> ((s, dir) =>
      vecToScalars(DimReduction(customerFeatures(s, dir), "pca", k = 2),
        "features" -> 3, "pca_features" -> 2)),

    // §2.1 #9, round 11 (VERDICT item 1): KMeans with the hash-init
    // trick — centroids are the 8 hash-drawn customer rows, assignment
    // is literal-centroid euclidean argmin, so the whole operator is
    // restatable in DuckDB (hash-EXACT) while the Lloyd fit above keeps
    // its invariant specs. Same raw features as customerFeatures.
    "dim_reduction_kmeans_hashinit" -> ((s, dir) =>
      DimReduction.kmeansHashInit(
        customer(s, dir).select("c_custkey", "c_acctbal", "c_nationkey"),
        k = 8, featureCols = Seq("c_acctbal", "c_nationkey", "c_custkey"),
        idCol = "c_custkey")),
    // round 11, one step further: the actual Lloyd ITERATION under the
    // oracle — one unrolled assign + 6dp-rounded re-center + re-assign
    // (kmeansLloyd steps=1). With this row the full k-means recipe —
    // init draw (…_hashinit), iteration arithmetic (here), evaluator
    // (evaluator_accuracy) — is hash-proven; only open-ended
    // convergence looping remains invariant-adjudicated
    // (dim_reduction_kmeans).
    "dim_reduction_kmeans_lloyd" -> ((s, dir) =>
      DimReduction.kmeansLloyd(
        customer(s, dir).select("c_custkey", "c_acctbal", "c_nationkey"),
        k = 8, featureCols = Seq("c_acctbal", "c_nationkey", "c_custkey"),
        idCol = "c_custkey", steps = 1)),
    // round 12 (r11 verdict item 5): TWO chained Lloyd steps under the
    // oracle — the re-centered 6dp centroids from step 1 feed step 2's
    // assignment, so the iteration COMPOSITION (not just one step's
    // arithmetic) is hash-proven; the invariant-only surface shrinks
    // to MLlib's internal termination test. Oracle = the same CTE
    // chain unrolled twice (kmeansLloydOracle(2)).
    "dim_reduction_kmeans_lloyd2" -> ((s, dir) =>
      DimReduction.kmeansLloyd(
        customer(s, dir).select("c_custkey", "c_acctbal", "c_nationkey"),
        k = 8, featureCols = Seq("c_acctbal", "c_nationkey", "c_custkey"),
        idCol = "c_custkey", steps = 2)),

    // §2.1 #9, round 11 (VERDICT item 4): the PCA SCORING half under
    // the oracle — projection onto a FROZEN 2×3 loading matrix (the
    // literals below; FeaturesSpec ties the same projection applied to
    // a real fitted model.pc to PCAModel.transform). The iterative SVD
    // fit stays invariant-adjudicated in dim_reduction_pca.
    "dim_reduction_pca_scoring" -> ((s, dir) =>
      DimReduction.pcaProject(
        customer(s, dir).select("c_custkey", "c_acctbal", "c_nationkey"),
        PcaScoringLoadings,
        featureCols = Seq("c_acctbal", "c_nationkey", "c_custkey"))),

    // Round 15 (r14 verdict item 3): one hash-init POWER-ITERATION
    // step under the oracle — the kmeans_lloyd treatment applied to
    // the PCA fit family, which until now had only the frozen-loadings
    // scoring sibling. v0 = the first idHash-ranked customer row
    // unit-normalized; one Gram-vector product w = XᵀXv (a single
    // aggregated corpus pass) + 6dp-rounded normalization; output the
    // direction and the per-row projection. With this row every fit
    // family (kmeans / PCA / LR / CV / BPE) has a hash-exact ITERATION
    // sibling; only MLlib's internal SVD/convergence stays
    // invariant-only (dim_reduction_pca).
    "dim_reduction_pca_power" -> ((s, dir) =>
      DimReduction.pcaPowerIteration(
        customer(s, dir).select("c_custkey", "c_acctbal", "c_nationkey"),
        featureCols = Seq("c_acctbal", "c_nationkey", "c_custkey"),
        idCol = "c_custkey", steps = 1)),

    // §2.1 #6 probability_prediction — LR fit+transform on same frame
    // (5 label classes = 5 probability elements).
    "probability_prediction" -> ((s, dir) =>
      vecToScalars(ProbabilityPrediction(customerFeatures(s, dir)),
        "probability" -> 5)),

    // §2.1 #6, round 11 (VERDICT item 2): the LR SCORING half under the
    // oracle — softmax + argmax against the FROZEN 4×3 coefficient
    // matrix below (FeaturesSpec ties the same scoring applied to a real
    // fitted coefficientMatrix/interceptVector to the model's own
    // probability/prediction columns). The iterative L-BFGS fit stays
    // invariant-adjudicated in probability_prediction.
    "probability_scoring" -> ((s, dir) =>
      ProbabilityPrediction.score(
        customer(s, dir).select("c_custkey", "c_acctbal", "c_nationkey"),
        ScoringCoefficients, ScoringIntercepts,
        featureCols = Seq("c_acctbal", "c_nationkey", "c_custkey"))),

    // Round 11 (VERDICT item 3): the evaluator arithmetic under the
    // oracle — MulticlassClassificationEvaluator("accuracy") evaluated
    // over a frozen deterministic predictions frame (label from the
    // hash-EXACT prepare_features mapping, prediction a pure custkey
    // expression). accuracy = correct/total is exact-integer division,
    // so the genuinely-MLlib-computed scalar is itself hash-EXACT —
    // proving the metric path validation_curves / predefined_split rank
    // their grids with, even though those fits stay iterative.
    "evaluator_accuracy" -> ((s, dir) => {
      import s.implicits._
      // features_2 is c_custkey (the customerFeatures assembly order):
      // prediction = custkey mod 5 — deterministic, label-correlated
      // never, so the accuracy is a pure arithmetic fact of the frame
      val custkey = org.apache.spark.ml.functions
        .vector_to_array(col("features")).getItem(2).cast("long")
      val preds = customerFeatures(s, dir)
        .withColumn("prediction", (custkey % 5).cast("double"))
      val acc = new org.apache.spark.ml.evaluation
          .MulticlassClassificationEvaluator()
        .setMetricName("accuracy").setLabelCol("label")
        .setPredictionCol("prediction")
        .evaluate(preds)
      Seq(acc).toDF("accuracy")
    }),

    // §2.1 #4 validation_curves — (param_value, avg_metric) curve
    // (CV fit metrics: ScalaTest-adjudicated, no SQL oracle). Round 13
    // (r12 verdict item 8): the fit runs on DETERMINISTIC pre-assigned
    // folds (foldCol, fold = custkey mod 3) instead of the seeded
    // random kFold sampling — the fold assignment itself is pinned
    // hash-EXACT by the validation_curves_folds sibling below, so the
    // unproven surface of this row shrinks to the LR optimizer
    // iterations proper (whose metric arithmetic evaluator_accuracy
    // already proves).
    "validation_curves" -> ((s, dir) =>
      ValidationCurves(s, foldedCustomerFeatures(s, dir),
        paramRange = Seq(0.001, 0.01, 0.1), numFolds = 3,
        foldCol = Some("fold"))),
    // The fold assignment + per-fold shape under the oracle: fold ids,
    // row counts, distinct-label counts — exactly the frame the
    // CrossValidator above trains on (same foldedCustomerFeatures
    // call), restated by DuckDB from the raw customer table.
    "validation_curves_folds" -> ((s, dir) =>
      foldedCustomerFeatures(s, dir)
        .groupBy("fold")
        .agg(count(lit(1)).as("n_rows"),
          countDistinct(col("label")).as("n_labels"))),

    // §2.1 #10 predefined_split tuning — test-side predictions of the
    // train-fit model (Q2: which grid point wins is unspecified).
    "predefined_split_fit" -> ((s, dir) => {
      val withSplit = SplitColumn.customByLabel(
        customerFeatures(s, dir), "label", 0.0)
      val r = PredefinedSplit(withSplit)
      vecToScalars(r.model.transform(r.test)
        .select("label", "prediction", "features"), "features" -> 3)
    }),
    // The fit's grid artifact (one row per grid point). The grid values
    // are spec-determined literals and Q2 (trainRatio=1.0 ⇒ empty
    // validation set) forces every tuner metric to NaN — surfaced as a
    // boolean so the hash compare never touches NaN, and so the oracle
    // states the Q2 contract explicitly: the grid SHAPE is pinned, the
    // winner never is.
    "predefined_split_grid" -> ((s, dir) => {
      val withSplit = SplitColumn.customByLabel(
        customerFeatures(s, dir), "label", 0.0)
      PredefinedSplit.gridMetrics(PredefinedSplit(withSplit))
        .select(col("reg_param"),
          isnan(col("validation_metric")).as("metric_is_empty_nan"))
    }),
  )
}
