package graft.llm

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`).
  *
  * Three tiers, cheap → scale:
  *  1. [[cosineTopK]] — brute-force per-query top-k against the corpus:
  *     exact, broadcast the (small) query set, one pass over the
  *     corpus. The correctness baseline.
  *  2. [[selfTopK]] — all-vectors × all-vectors exact top-k; quadratic,
  *     only for validation at small SF and for recall measurement.
  *  3. [[ivfTopK]] — IVF (inverted-file) index: KMeans coarse
  *     quantizer, probe the `nProbe` nearest centroids per query,
  *     exact re-rank inside the probed cells. At 100 TB this turns
  *     O(N·Q) into O(N·Q·nProbe/nCells) with one co-partitioned join
  *     on cell id — the classic billion-scale ANN layout (IVF-Flat).
  */
object Similarity {

  /** Cosine similarity between two double-array columns — the custom
    * Catalyst expression [[graft.functions.CosineSimilarity]] (tight
    * codegen'd loop; higher-order functions would evaluate interpreted
    * in this hot path). Zero-norm vectors yield -1, never NaN/null —
    * NaN sorts ABOVE every double and would win each desc top-k. */
  def cosine(a: Column, b: Column): Column =
    graft.functions.CosineSimilarity(a, b)

  /** The composable `sql.functions`-only formulation, kept as the
    * bit-parity cross-check for the custom expression (SimilaritySpec)
    * and as a porting reference. `try_divide` guards ANSI
    * divide-by-zero; coalesce maps the null to -1 like [[cosine]]. */
  private[llm] def cosineHof(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (s, x) => s + x)
    val na = sqrt(aggregate(transform(a, x => x * x), lit(0.0), (s, x) => s + x))
    val nb = sqrt(aggregate(transform(b, x => x * x), lit(0.0), (s, x) => s + x))
    coalesce(try_divide(dot, na * nb), lit(-1.0))
  }

  private def asDouble(c: Column): Column = c.cast("array<double>")

  /** Exact top-k neighbors for each query id in `queries` (a subset of
    * ids or a separate frame with the same `(idCol, embCol)` schema).
    *
    * `roundAt >= 0` rounds the cosine to that many decimals BEFORE
    * ranking (ties then broken by neighbor_id) — this is what makes the
    * result hash-comparable against a DuckDB oracle despite cross-engine
    * ulp differences in the float reduction.
    *
    * Scale: `queries` is broadcast (small by construction); the corpus
    * is scanned once; the only shuffle is the per-query top-k window
    * over `queryId` — cardinality = |queries|, partial top-k pushed
    * map-side by the rank filter. */
  def cosineTopK(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int = 10,
      embCol: String = "embedding",
      idCol: String = "vec_id",
      roundAt: Int = -1): DataFrame = {
    val q = broadcast(queries.select(
      col(idCol).as("query_id"), asDouble(col(embCol)).as("q_emb")))
    val c = corpus.select(col(idCol).as("neighbor_id"),
      asDouble(col(embCol)).as("c_emb"))
    val sim = cosine(col("q_emb"), col("c_emb"))
    val scored = c.crossJoin(q)
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine", if (roundAt >= 0) round(sim, roundAt) else sim)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "cosine")
  }

  /** Exact self-join top-k (validation / recall baseline only —
    * quadratic). */
  def selfTopK(df: DataFrame, k: Int = 10, embCol: String = "embedding",
      idCol: String = "vec_id"): DataFrame =
    cosineTopK(df, df, k, embCol, idCol)

  /** IVF-Flat ANN: KMeans(nCells) coarse quantizer fit on a SAMPLE of
    * the corpus (at target scale the fit must not see every row —
    * recall depends only on centroid geometry), corpus partitioned by
    * nearest-centroid cell, queries probe their `nProbe` closest cells
    * and re-rank exactly within them.
    *
    * Metric consistency: vectors are L2-normalized before BOTH cell
    * assignment and probe ranking, and both use euclidean distance —
    * on unit vectors euclidean argmin == cosine argmax, so the
    * quantizer geometry agrees with the final cosine re-rank (an
    * unnormalized/mixed-metric IVF silently probes the wrong cells).
    *
    * Returns the same shape as [[cosineTopK]]; recall < 1.0 by design,
    * measured by [[recallAgainst]]. */
  def ivfTopK(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int = 10,
      nCells: Int = 16,
      nProbe: Int = 4,
      embCol: String = "embedding",
      idCol: String = "vec_id",
      seed: Long = 42L,
      fitSampleFraction: Double = 0.25): DataFrame = {
    val spark = corpus.sparkSession
    def sqNorm(c: Column): Column =
      aggregate(transform(c, x => x * x), lit(0.0), (s, x) => s + x)
    // zero-norm vectors are KEPT (unit-divide guarded by a 1.0 floor):
    // cosineTopK scores them -1, and ivfTopK must not silently drop
    // rows its exact twin would return
    val vecs = corpus.select(col(idCol).as("neighbor_id"),
      asDouble(col(embCol)).as("c_emb"))
      .withColumn("n",
        when(sqrt(sqNorm(col("c_emb"))) > 0, sqrt(sqNorm(col("c_emb"))))
          .otherwise(lit(1.0)))
      .withColumn("v", array_to_vector(
        transform(col("c_emb"), x => x / col("n"))))
      .drop("n")
    // quantizer quality needs coarse centroid geometry, not converged
    // Lloyd: cap iterations/init rounds (recall guarded by the spec's
    // recall test; each extra iteration is a full pass over the sample)
    val km = new KMeans().setK(nCells).setSeed(seed).setFeaturesCol("v")
      .setPredictionCol("cell").setMaxIter(10).setInitSteps(1)
    val model = km.fit(
      vecs.select("v").sample(withReplacement = false, fitSampleFraction, seed))
    val centroids = model.clusterCenters.zipWithIndex.map {
      case (ctr, i) => (i, ctr.toArray)
    }.toSeq
    import spark.implicits._
    val centroidDf = broadcast(centroids.toDF("cell", "centroid"))

    // corpus side: one narrow pass assigns each vector to its cell
    val cells = model.transform(vecs).select(col("neighbor_id"),
      col("c_emb"), col("cell"))

    // query side: nProbe nearest centroids per query (tiny cross join:
    // |queries| × nCells, both small), ranked by euclidean distance of
    // the UNIT query to each centroid — the assignment metric
    val q = queries.select(col(idCol).as("query_id"),
      asDouble(col(embCol)).as("q_emb"))
      .withColumn("qn",
        when(sqrt(sqNorm(col("q_emb"))) > 0, sqrt(sqNorm(col("q_emb"))))
          .otherwise(lit(1.0)))
      .withColumn("q_unit", transform(col("q_emb"), x => x / col("qn")))
    val eDist = aggregate(
      zip_with(col("q_unit"), col("centroid"), (x, y) => (x - y) * (x - y)),
      lit(0.0), (s, x) => s + x)
    val probes = q.crossJoin(centroidDf)
      .withColumn("cdist", eDist)
      .withColumn("crank", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("cdist"), col("cell"))))
      .filter(col("crank") <= nProbe)
      .select("query_id", "q_emb", "cell")

    // equi-join on cell id — co-partitioned scan of only probed cells
    val scored = cells.join(broadcast(probes), "cell")
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine", cosine(col("q_emb"), col("c_emb")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "cosine")
  }

  /** Recall@k of `approx` against exact `truth` (both in topK shape):
    * fraction of true neighbors the approximate index found. */
  def recallAgainst(approx: DataFrame, truth: DataFrame): Double = {
    val hits = truth.join(approx, Seq("query_id", "neighbor_id"), "left_semi").count()
    val total = truth.count()
    if (total == 0) 1.0 else hits.toDouble / total
  }
}
