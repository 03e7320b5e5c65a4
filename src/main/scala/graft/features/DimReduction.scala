package graft.features

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.feature.PCA
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

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

  /** [[apply]]'s "kmeans" branch with the hash-init trick
    * ([[graft.llm.Similarity]]'s quantizer recipe, round 11): centroids
    * are the `k` rows ranked first by the public idHash rule — k-means
    * with ZERO Lloyd refinement steps (the standard init, shipped as the
    * final model). Cluster geometry is worse than a Lloyd fit, so
    * production code keeps [[apply]]; the point of this variant is that
    * centroid derivation + assignment are pure engine-portable
    * arithmetic, so the whole operator is restatable in SQL and
    * hash-verifiable against a DuckDB twin — the one thing an iterative
    * MLlib fit can never be.
    *
    * Assignment: squared-euclidean argmin over the `k` collected
    * centroids baked into the plan as literals (per-dim terms summed in
    * column order, left-associated — the oracle states the same order),
    * ties broken toward the SMALLEST cluster id. Appends `prediction`
    * (cluster id, int) and `dist2` (squared distance to the winning
    * centroid, rounded `roundAt` dp).
    *
    * Scale shape: one bounded TakeOrdered collect of k rows (the same
    * fixed-size artifact a KMeans fit materializes), then a single
    * zero-shuffle whole-stage-codegen projection over the corpus — no
    * join, no driver loop. Rows with a null feature are unassignable
    * and dropped (a distance against null is undefined; MLlib would
    * have thrown at assembly time). */
  def kmeansHashInit(
      df: DataFrame,
      k: Int,
      featureCols: Seq[String],
      idCol: String,
      roundAt: Int = 6): DataFrame =
    // exactly the zero-refinement case of the Lloyd machinery — ONE
    // body, so the draw/assignment arithmetic can never diverge from
    // the steps>0 path (FeaturesSpec pins the steps=0 equality)
    kmeansLloyd(df, k, featureCols, idCol, steps = 0, roundAt = roundAt)

  /** The deterministic PCA SCORING half (round 11): project each row
    * onto a FIXED loading matrix — `loadings(j)` is component `j`'s
    * length-d loading vector — appending `pca_0..pca_{k-1}` (rounded
    * `roundAt` dp). This is exactly what `PCAModel.transform` computes
    * (`pc.transpose * x`; MLlib PCA does NOT mean-center at transform
    * time), with the iterative SVD *fit* factored out: FeaturesSpec
    * ties this projection applied to a real fitted `model.pc` to
    * `model.transform`'s output, and the registered query runs it with
    * frozen literal loadings so the arithmetic is hash-verifiable in
    * DuckDB. Per-dim products are summed in column order,
    * left-associated — the oracle states the same order.
    *
    * Scale shape: zero-shuffle codegen projection; the loading matrix
    * is a k×d literal (model-artifact-sized). */
  def pcaProject(
      df: DataFrame,
      loadings: Seq[Seq[Double]],
      featureCols: Seq[String],
      roundAt: Int = 6): DataFrame = {
    require(loadings.nonEmpty, "need at least one component")
    require(loadings.forall(_.length == featureCols.length),
      s"each loading row must have ${featureCols.length} entries")
    val feats = featureCols.map(c => col(c).cast("double"))
    val projected = loadings.zipWithIndex.map { case (w, j) =>
      round(feats.zipWithIndex.map { case (x, i) => x * lit(w(i)) }
        .reduce(_ + _), roundAt).as(s"pca_$j")
    }
    df.select(df.columns.map(col).toSeq ++ projected: _*)
  }

  /** Lloyd's algorithm UNROLLED for a fixed step budget, on top of the
    * [[kmeansHashInit]] draw (round 11): each step assigns every row to
    * its squared-euclidean argmin centroid and re-centers each cluster
    * at the per-dimension MEAN of its members, ROUNDED to `roundAt`
    * decimal places before the next assignment. The rounding is the
    * determinism contract: every assignment pass then runs against
    * bit-identical centroid literals in any engine (summation-order
    * ulps in the mean cannot propagate past the round), so the actual
    * ITERATION — not just the init — is restatable in SQL and
    * hash-verifiable. A cluster that empties keeps its previous
    * centroid unchanged (MLlib's behavior, and the oracle's COALESCE).
    *
    * This is exactly the distributed-KMeans execution shape MLlib uses:
    * per-step, one map-side-combined aggregation over the corpus
    * (k×d partial sums per task) and a k×d driver update — the collect
    * is model-artifact-sized, never corpus-sized. `steps` is a fixed
    * unroll, so the whole pipeline is `steps + 1` codegen'd assignment
    * passes; production convergence-loop fitting stays [[apply]].
    * Appends `prediction` and `dist2` like [[kmeansHashInit]]. */
  def kmeansLloyd(
      df: DataFrame,
      k: Int,
      featureCols: Seq[String],
      idCol: String,
      steps: Int = 1,
      roundAt: Int = 6): DataFrame = {
    require(k >= 1, s"need k >= 1, got $k")
    require(steps >= 0, s"need steps >= 0, got $steps")
    require(featureCols.nonEmpty, "need at least one feature column")
    val feats = featureCols.map(c => col(c).cast("double"))
    val clean = df.where(feats.map(_.isNotNull).reduce(_ && _))
    val drawn = clean
      .select((col(idCol).cast("long").as("__id") +: feats): _*)
      .orderBy(idHash(col("__id")), col("__id"))
      .limit(k)
      .collect()
    require(drawn.length == k,
      s"hash-init kmeans: only ${drawn.length} well-formed rows, need $k")
    var centroids: Array[Array[Double]] = drawn.map(r =>
      featureCols.indices.map(i => r.getDouble(i + 1)).toArray)
    for (_ <- 1 to steps) {
      val assigned = clean.withColumn("__cl",
        nearestCluster(feats, centroids).getField("cluster"))
      val avgs = feats.zipWithIndex.map { case (x, i) =>
        avg(x).as(s"__m$i") }
      val means = assigned.groupBy(col("__cl"))
        .agg(avgs.head, avgs.tail: _*)
        .collect()
        .map(r => r.getInt(0) ->
          featureCols.indices.map(i => r.getDouble(i + 1)).toArray)
        .toMap
      centroids = centroids.zipWithIndex.map { case (prev, j) =>
        means.get(j) match {
          case Some(m) => m.map(v =>
            BigDecimal(v).setScale(roundAt,
              BigDecimal.RoundingMode.HALF_UP).toDouble)
          case None => prev // emptied cluster keeps its centroid
        }
      }
    }
    val best = nearestCluster(feats, centroids)
    clean
      .withColumn("prediction", best.getField("cluster"))
      .withColumn("dist2", round(best.getField("d2"), roundAt))
  }

  /** One-or-more POWER-ITERATION steps toward the top principal
    * direction, unrolled under the oracle (round 15, verdict item 3 —
    * the [[kmeansLloyd]] treatment applied to the last fit family
    * without a hash-exact iteration sibling): v₀ is the first
    * idHash-ranked row's feature vector unit-normalized, and each step
    * computes the Gram-vector product w = XᵀXv (one map-side-combined
    * aggregation: wᵢ = Σ_rows xᵢ·(x·v), never materializing the d×d
    * Gram) followed by unit normalization, with every normalized
    * component ROUNDED to `roundAt` dp before the next pass. The
    * rounding is the determinism contract (the kmeansLloyd recipe):
    * each corpus pass runs against bit-identical literal v in any
    * engine, so summation-order ulps in the big sums cannot propagate
    * past the round, and the whole iteration is restatable in SQL.
    *
    * This is the uncentered power method — MLlib's PCA fit computes
    * principal components of the mean-CENTERED covariance via SVD, so
    * the learned direction is a sibling, not a drop-in replacement;
    * the point (as with kmeansLloyd vs the KMeans fit) is that the
    * ITERATION ARITHMETIC of the fit family is hash-verifiable, while
    * production fitting stays [[apply]]. FeaturesSpec ties the
    * converged direction to the dominant eigenvector on a planted
    * spectrum fixture.
    *
    * Output: the input rows (null-feature rows dropped — unprojectable)
    * plus the learned direction as literal columns `v_0..v_{d-1}` and
    * the per-row projection `pc1_power = round(x·v, roundAt)`.
    *
    * Scale shape: one bounded 1-row TakeOrdered collect (the init
    * draw), then per step ONE partially-aggregated corpus scan
    * returning d doubles to the driver — model-artifact-sized, never
    * corpus-sized — and finally a zero-shuffle codegen projection. */
  def pcaPowerIteration(
      df: DataFrame,
      featureCols: Seq[String],
      idCol: String,
      steps: Int = 1,
      roundAt: Int = 6): DataFrame = {
    require(steps >= 0, s"need steps >= 0, got $steps")
    require(featureCols.nonEmpty, "need at least one feature column")
    val feats = featureCols.map(c => col(c).cast("double"))
    val clean = df.where(feats.map(_.isNotNull).reduce(_ && _))
    val drawn = clean
      .select((col(idCol).cast("long").as("__id") +: feats): _*)
      .orderBy(idHash(col("__id")), col("__id"))
      .limit(1)
      .collect()
    require(drawn.nonEmpty, "power iteration: no well-formed rows")
    def normalize(w: Array[Double]): Array[Double] = {
      // left-assoc sum-of-squares, the order the oracle states
      val n = math.sqrt(w.map(v => v * v).reduce(_ + _))
      require(n > 0, "power iteration hit the zero vector")
      w.map(v => BigDecimal(v / n)
        .setScale(roundAt, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    var v = normalize(
      featureCols.indices.map(i => drawn(0).getDouble(i + 1)).toArray)
    for (_ <- 1 to steps) {
      // x·v with v as literals, per-dim terms left-associated
      val dot = feats.zipWithIndex.map { case (x, i) => x * lit(v(i)) }
        .reduce(_ + _)
      val sums = feats.zipWithIndex.map { case (x, i) =>
        sum(x * dot).as(s"__s$i") }
      val srow = clean.agg(sums.head, sums.tail: _*).collect()(0)
      v = normalize(featureCols.indices.map(srow.getDouble).toArray)
    }
    val vCols = v.zipWithIndex.map { case (w, i) => lit(w).as(s"v_$i") }
    val proj = feats.zipWithIndex.map { case (x, i) => x * lit(v(i)) }
      .reduce(_ + _)
    // Projection rounding is spelled floor(x·10^r + 0.5)/10^r, NOT
    // round(): x·v here is an EXACT 8-decimal product (2dp features ×
    // 6dp loadings), so ~1% of rows sit on the 6dp half boundary where
    // Spark's BigDecimal HALF_UP and DuckDB's multiply-then-round
    // disagree on the same double (observed: 2/1500 rows off by 1e-6).
    // The floor form is identical IEEE arithmetic in both engines —
    // bit-exact by construction, whatever the tie policy.
    val scale = lit(math.pow(10.0, roundAt))
    clean.select(df.columns.map(col).toSeq ++ vCols :+
      (floor(proj * scale + lit(0.5)) / scale).as("pc1_power"): _*)
  }

  /** The shared squared-euclidean argmin: per-dim terms summed in
    * column order, left-associated (the oracle states the same order),
    * ties broken toward the SMALLEST cluster id. Returns the winning
    * struct(d2, cluster). */
  private def nearestCluster(
      feats: Seq[Column],
      centroids: Array[Array[Double]]): Column = {
    val scored = centroids.zipWithIndex.map { case (c, j) =>
      val d2 = feats.zipWithIndex.map { case (x, i) =>
        (x - lit(c(i))) * (x - lit(c(i)))
      }.reduce(_ + _)
      struct(d2.as("d2"), lit(j).as("cluster"))
    }
    array_sort(array(scored: _*)).getItem(0)
  }

  /** The public hash-draw rank (the [[graft.llm.Similarity]] idHash
    * contract under this operator's own multiplier, so the KMeans draw
    * is decorrelated from the IVF/PQ quantizer draws): rank rows by
    * `((id mod 1048573) * KmeansHashMultiplier) mod 1048573`, ties on
    * id. The DuckDB oracle restates the same constants. */
  val KmeansHashMultiplier = 3266489917L

  private def idHash(id: Column): Column =
    pmod(pmod(id, lit(1048573L)) * lit(KmeansHashMultiplier),
      lit(1048573L))
}
