package graft

/** Oracle SQL for the ANN/similarity family (exact top-k, IVF/PQ/SQ8 + recall rows, MMR, projections).
  * Split from the single-file registry (r15 verdict item 7); every key
  * mirrors a [[SparkEntry.queries]] registration with IDENTICAL column
  * names/aliases. Shared CTE derivations live in [[OracleSqlShared]]. */
private[graft] object OracleSqlSimilarity {
  import OracleSqlShared._
  import SparkEntry.{ScoringCoefficients, ScoringIntercepts, PcaScoringLoadings}
  import graft.features.DimReduction

  // Seq, not Map (r17 advice #5 applied to the oracle registry too):
  // a within-family duplicate key survives to OracleSql.all's
  // duplicate require instead of last-wins-collapsing silently.
  val entries: Seq[(String, String)] = Seq(
    "similarity_topk" ->
      """WITH q AS (
        |  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS q_emb
        |  FROM embeddings WHERE vec_id < 10
        |), scored AS (
        |  SELECT q.query_id, c.vec_id AS neighbor_id,
        |    ROUND(list_cosine_similarity(q.q_emb, CAST(c.embedding AS DOUBLE[])), 6) AS cosine
        |  FROM q CROSS JOIN embeddings c
        |  WHERE c.vec_id <> q.query_id
        |)
        |SELECT query_id, neighbor_id, CAST(rn AS INT) AS rank, cosine FROM (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rn
        |  FROM scored
        |) WHERE rn <= 10""".stripMargin,

    // The full SQ8 index re-derived in SQL: per-dim exact min/max
    // bounds, half-UP quantize to 0..255 (floor(v + 0.5) — spelled
    // identically in SqEncode.compute), reconstruction, ADC dot
    // against the raw query, reconstructed-norm cosine, 6dp pre-rank
    // rounding (absorbs cross-engine float-sum order, the
    // similarity_topk contract). unnest(range)+unnest(list) expand in
    // lockstep, giving (vec_id, i, x) exploded dims.
    "similarity_sq8" -> (sq8ScoredCtesSql +
      """
        |SELECT query_id, neighbor_id, CAST(rnk AS INT) AS rank, sq_score
        |FROM (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY query_id ORDER BY sq_score DESC, neighbor_id) AS rnk
        |  FROM scored
        |) WHERE rnk <= 10""".stripMargin),

    // SQ8 recall (r15): the same scored CTE chain feeding the shared
    // recall tail — reconstruction loss alone, as a gated number.
    "similarity_sq8_recall" ->
      (sq8ScoredCtesSql + annRecallTailSql("sq_score")),

    // The full hash-init PQ pipeline re-derived in SQL: the codebook
    // rows are the 64 corpus rows ranked by the Knuth multiplicative
    // hash ((id % 1048573) * 2654435761 % 1048573 — reduced BEFORE the
    // multiply, so BIGINT arithmetic matches the JVM bit-for-bit with
    // no overflow), centroid c of subspace j = dims [j*4, j*4+4) of the
    // c-th selected row; encode = per-(row, subspace) argmin of squared
    // distance with smallest-centroid tie-break (PqEncode's strict `<`);
    // ADC dot = sum over subspaces of the query-subvector·centroid dot
    // for the assigned code; cosine-normalized by the EXACT raw norms;
    // 6dp pre-rank rounding (the similarity_topk contract).
    "similarity_pq" -> (pqScoredCtesSql +
      """
        |SELECT query_id, neighbor_id, CAST(rnk AS INT) AS rank, pq_score
        |FROM (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY query_id ORDER BY pq_score DESC, neighbor_id) AS rnk
        |  FROM scored
        |) WHERE rnk <= 10""".stripMargin),

    // PQ recall (r15): pure ADC quantization loss with no pruning in
    // play — the same scored CTE chain feeding the shared recall tail.
    "similarity_pq_recall" ->
      (pqScoredCtesSql + annRecallTailSql("pq_score")),

    // The two-level hash-init IVFPQ re-derived in SQL: coarse
    // centroids = the 16 rows drawn by the SECOND hash multiplier
    // (2246822519), L2-normalized; cell assignment = cosine argmax
    // with LARGEST-cell tie-break (array_max on struct(cos, cell));
    // probe = top-8 cells per query by the same ordering; then the
    // similarity_pq ADC machinery restricted to probed cells. Both
    // cosine legs divide by the recomputed centroid norm (≈1 after
    // normalization) exactly as CosineSimilarity does.
    "similarity_ivfpq" -> (ivfPqAssignCtesSql + ivfPqProbeScoredCtesSql +
      """
        |SELECT query_id, neighbor_id, CAST(rnk AS INT) AS rank, pq_score
        |FROM (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY query_id ORDER BY pq_score DESC, neighbor_id) AS rnk
        |  FROM scored
        |) WHERE rnk <= 10""".stripMargin),

    "similarity_ivfpq_recall" -> ivfPqRecallOracle,

    // Hash-init IVF-Flat re-derived in SQL: unit-normalized hash-drawn
    // centroids, cosine argmax assignment (largest-cell ties), top-4
    // probe cells per query (cos DESC, cell DESC — the sort_array
    // struct order), exact cosine over in-cell candidates, 6dp
    // pre-rank round. similarity_ivf_persisted shares the twin
    // verbatim: the write → reload → probe round-trip must be the
    // identity, so persistence itself is under the oracle.
    "similarity_ivf" -> ivfHashInitOracle,

    // The DELETE leg (round 18): the SAME frozen quantizer + probe
    // chain — centroids still drawn over the FULL corpus (deletion
    // must not refit; a re-drawn quantizer would move every cell and
    // the row would mismatch) — with the survivor filter applied to
    // the candidate set only. One surgical edit of the shared chain so
    // the probe arithmetic is stated exactly once.
    "similarity_ivf_delete" -> (ivfAssignCtesSql +
      ivfProbeScoredCtesSql.replace(
        "WHERE a.vec_id <> p.query_id",
        "WHERE a.vec_id <> p.query_id AND a.vec_id % 7 <> 3") + """
      |SELECT query_id, neighbor_id, CAST(rnk AS INT) AS rank, cosine
      |FROM (
      |  SELECT *, row_number() OVER (
      |    PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rnk
      |  FROM scored
      |) WHERE rnk <= 10""".stripMargin),

    "similarity_ivf_persisted" -> ivfHashInitOracle,

    "similarity_ivf_recall" -> ivfRecallOracle,

    // Streaming append-then-probe == batch build-then-probe: the
    // micro-batched half-corpus ingest must land exactly where the
    // one-pass assignment puts it, so the row shares similarity_ivf's
    // oracle verbatim.
    "stream_ivf_append" -> ivfHashInitOracle,

    // Round-11 build-half rows (VERDICT item 5): the amortized probe
    // queries above report steady-state cost; these keep the build cost
    // observable under named timers AND hash-verified.
    "similarity_ivf_build" -> similarityIvfBuildOracle,

    "similarity_ivfpq_build" -> similarityIvfPqBuildOracle,

    // label-outlier oracle: per-(label, dim) AVG centroid, euclidean
    // distance rounded 6dp, per-label quantile_cont(0.95) over the
    // ROUNDED distances (== Spark's exact percentile on bit-identical
    // inputs), strict > flag.
    "embedding_random_projection" -> randomProjectionOracle,

    "similarity_mmr" -> mmrOracle,

    "embedding_label_outliers" ->
      """WITH vals AS (
        |  SELECT vec_id, label,
        |    unnest(range(0, len(embedding))) AS i,
        |    unnest(CAST(embedding AS DOUBLE[])) AS x
        |  FROM embeddings
        |), cent AS (
        |  SELECT label, i, AVG(x) AS c FROM vals GROUP BY 1, 2
        |), dist AS (
        |  SELECT v.vec_id, v.label,
        |    ROUND(sqrt(SUM((v.x - c.c) * (v.x - c.c))), 6) AS dist
        |  FROM vals v JOIN cent c ON c.label = v.label AND c.i = v.i
        |  GROUP BY 1, 2
        |), thr AS (
        |  SELECT label, quantile_cont(dist, 0.95) AS thr
        |  FROM dist GROUP BY 1
        |)
        |SELECT d.vec_id, d.label, d.dist,
        |  CAST(d.dist > t.thr AS INT) AS is_outlier
        |FROM dist d JOIN thr t USING (label)""".stripMargin,

    "embedding_label_stats" ->
      """WITH n AS (
        |  SELECT label, len(embedding) AS emb_dim,
        |    ROUND(sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]),
        |                                       x -> x * x))), 6) AS n
        |  FROM embeddings
        |)
        |SELECT label, COUNT(*) AS n_vecs,
        |  CAST(MIN(emb_dim) AS INT) AS min_dim,
        |  CAST(MAX(emb_dim) AS INT) AS max_dim,
        |  ROUND(AVG(n), 6) AS avg_norm,
        |  MIN(n) AS min_norm, MAX(n) AS max_norm
        |FROM n GROUP BY 1""".stripMargin,

    // identical to similarity_topk's brute-force oracle: an exhaustive
    // probe must reproduce it bit-for-bit
    "similarity_ivf_exhaustive" ->
      """WITH q AS (
        |  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS q_emb
        |  FROM embeddings WHERE vec_id < 10
        |), scored AS (
        |  SELECT q.query_id, c.vec_id AS neighbor_id,
        |    ROUND(list_cosine_similarity(q.q_emb, CAST(c.embedding AS DOUBLE[])), 6) AS cosine
        |  FROM q CROSS JOIN embeddings c
        |  WHERE c.vec_id <> q.query_id
        |)
        |SELECT query_id, neighbor_id, CAST(rn AS INT) AS rank, cosine FROM (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rn
        |  FROM scored
        |) WHERE rn <= 10""".stripMargin,
  )
}
