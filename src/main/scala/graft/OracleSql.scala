package graft

/** The DuckDB-oracle SQL side of the driver contract, split from
  * [[SparkEntry]] (r14 verdict item 8: registry hygiene past 150
  * queries). Every key here mirrors a [[SparkEntry.queries]]
  * registration with IDENTICAL column names/aliases; the shared
  * CTE constants keep each arithmetic derivation stated exactly
  * once across the twins that reuse it. Scala constants that both
  * engines interpolate (frozen scoring coefficients, PCA loadings)
  * stay in [[SparkEntry]] and are referenced from here so the two
  * sides cannot drift. */
private[graft] object OracleSql {
  import SparkEntry.{ScoringCoefficients, ScoringIntercepts, PcaScoringLoadings}
  import graft.features.DimReduction

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  /** Shared by similarity_ivf and similarity_ivf_persisted — the
    * persisted round-trip must be the identity, so one twin holds for
    * both (and persistence itself becomes an oracled behavior). */
  /** The hash-init IVF coarse-quantizer derivation + full-corpus cell
    * assignment re-derived in SQL — shared by the probe oracle
    * ([[ivfHashInitOracle]]) and the round-11 build oracle
    * (`similarity_ivf_build`), so the assignment arithmetic is stated
    * exactly once. */
  private val ivfAssignCtesSql: String =
    """WITH wf AS MATERIALIZED (
      |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
      |  FROM embeddings WHERE len(embedding) = 64
      |), vals AS MATERIALIZED (
      |  SELECT vec_id, unnest(range(0, len(e))) AS i, unnest(e) AS x
      |  FROM wf
      |), norms AS MATERIALIZED (
      |  SELECT vec_id, sqrt(SUM(x * x)) AS nrm FROM vals GROUP BY 1
      |), ivf_rows AS (
      |  SELECT vec_id, e, row_number() OVER (
      |    ORDER BY (vec_id % 1048573) * 2246822519 % 1048573, vec_id
      |  ) - 1 AS cell
      |  FROM wf WHERE len(list_filter(e, x -> x IS NULL)) = 0
      |  QUALIFY cell < 16
      |), centv AS (
      |  SELECT cell, unnest(range(0, len(e))) AS i, unnest(e) AS v
      |  FROM ivf_rows
      |), cent AS MATERIALIZED (
      |  SELECT cell, i,
      |    v / sqrt(SUM(v * v) OVER (PARTITION BY cell)) AS cv
      |  FROM centv
      |), centnorm AS (
      |  SELECT cell, sqrt(SUM(cv * cv)) AS cnrm FROM cent GROUP BY 1
      |), rowdot AS (
      |  SELECT v.vec_id, c.cell, SUM(v.x * c.cv) AS dot
      |  FROM vals v JOIN cent c USING (i)
      |  GROUP BY 1, 2
      |), rowcos AS (
      |  SELECT d.vec_id, d.cell,
      |    CASE WHEN n.nrm > 0 THEN d.dot / (n.nrm * cn.cnrm)
      |      ELSE -1 END AS cos
      |  FROM rowdot d
      |  JOIN norms n ON n.vec_id = d.vec_id
      |  JOIN centnorm cn USING (cell)
      |), assign AS (
      |  SELECT vec_id, cell FROM rowcos
      |  QUALIFY row_number() OVER (
      |    PARTITION BY vec_id ORDER BY cos DESC, cell DESC) = 1
      |)""".stripMargin

  /** Round-11 build-half oracle: the per-cell occupancy/id-checksum
    * profile of the full hash-init assignment. */
  private val similarityIvfBuildOracle: String =
    ivfAssignCtesSql +
      """
      |SELECT CAST(cell AS INT) AS cell, COUNT(*) AS n_vecs,
      |  CAST(SUM(vec_id) AS BIGINT) AS id_sum,
      |  MIN(vec_id) AS min_id, MAX(vec_id) AS max_id
      |FROM assign GROUP BY 1""".stripMargin

  /** The hash-init IVF probe chain up to `scored` (query_id,
    * neighbor_id, 6dp cosine over probed candidates) — shared by
    * [[ivfHashInitOracle]] (which ranks it) and the round-14 recall
    * oracle (which compares its ranking against the exact top-k). */
  private val ivfProbeScoredCtesSql: String =
    """, probecells AS (
      |  SELECT vec_id AS query_id, cell FROM rowcos
      |  WHERE vec_id < 10
      |  QUALIFY row_number() OVER (
      |    PARTITION BY vec_id ORDER BY cos DESC, cell DESC) <= 4
      |), cand AS (
      |  SELECT p.query_id, a.vec_id AS neighbor_id
      |  FROM probecells p JOIN assign a USING (cell)
      |  WHERE a.vec_id <> p.query_id
      |), pairdot AS (
      |  SELECT c.query_id, c.neighbor_id, SUM(q.x * v.x) AS dot
      |  FROM cand c
      |  JOIN vals q ON q.vec_id = c.query_id
      |  JOIN vals v ON v.vec_id = c.neighbor_id AND v.i = q.i
      |  GROUP BY 1, 2
      |), scored AS (
      |  SELECT d.query_id, d.neighbor_id,
      |    ROUND(CASE WHEN nn.nrm > 0 AND qn.nrm > 0
      |      THEN d.dot / (nn.nrm * qn.nrm) ELSE -1 END, 6) AS cosine
      |  FROM pairdot d
      |  JOIN norms nn ON nn.vec_id = d.neighbor_id
      |  JOIN norms qn ON qn.vec_id = d.query_id
      |)""".stripMargin

  private val ivfHashInitOracle: String =
    ivfAssignCtesSql + ivfProbeScoredCtesSql +
      """
      |SELECT query_id, neighbor_id, CAST(rnk AS INT) AS rank, cosine
      |FROM (
      |  SELECT *, row_number() OVER (
      |    PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rnk
      |  FROM scored
      |) WHERE rnk <= 10""".stripMargin

  /** Round-14 (VERDICT item 3): recall@10 of the hash-init IVF probe
    * against the exact top-k, re-derived entirely in SQL — the IVF
    * ranking from the shared probe chain, the exact ranking from the
    * similarity_topk restatement, recall = per-query hit fraction. */
  /** The shared recall TAIL (r15): top-10 `approx` from whatever
    * `scored` CTE precedes it (ranked by `scoreCol` DESC, id ASC — the
    * probe tie-break), the exact-cosine `truth` re-derivation, and the
    * per-query hit count — one statement of the recall arithmetic
    * reused by every `similarity_*_recall` row, so the quality gates
    * cannot drift from each other. */
  private def annRecallTailSql(scoreCol: String): String =
    s""", approx AS (
      |  SELECT query_id, neighbor_id FROM (
      |    SELECT *, row_number() OVER (
      |      PARTITION BY query_id ORDER BY $scoreCol DESC, neighbor_id) AS rnk
      |    FROM scored
      |  ) WHERE rnk <= 10
      |), tq AS (
      |  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS q_emb
      |  FROM embeddings WHERE vec_id < 10
      |), tscored AS (
      |  SELECT tq.query_id, c.vec_id AS neighbor_id,
      |    ROUND(list_cosine_similarity(tq.q_emb,
      |      CAST(c.embedding AS DOUBLE[])), 6) AS cosine
      |  FROM tq CROSS JOIN embeddings c
      |  WHERE c.vec_id <> tq.query_id
      |), truth AS (
      |  SELECT query_id, neighbor_id FROM (
      |    SELECT *, row_number() OVER (
      |      PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rn
      |    FROM tscored
      |  ) WHERE rn <= 10
      |)
      |SELECT t.query_id, COUNT(*) AS n_truth,
      |  CAST(SUM(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_hit,
      |  ROUND(SUM(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
      |    / COUNT(*), 6) AS recall
      |FROM truth t
      |LEFT JOIN approx a
      |  ON a.query_id = t.query_id AND a.neighbor_id = t.neighbor_id
      |GROUP BY 1""".stripMargin

  private val ivfRecallOracle: String =
    ivfAssignCtesSql + ivfProbeScoredCtesSql + annRecallTailSql("cosine")

  /** Shared by text_perplexity_cross and text_perplexity_persisted (the
    * model write → reload → score round-trip must be the identity). */
  private val crossPerplexityOracle: String =
    """WITH toks AS (
        |  SELECT doc_id, lang,
        |    regexp_extract_all(lower(text), '[\p{L}]+') AS ws
        |  FROM documents
        |), big AS (
        |  SELECT doc_id, lang, ws[i] AS w1, ws[i + 1] AS w2
        |  FROM (SELECT doc_id, lang, ws, unnest(range(1, len(ws))) AS i
        |        FROM toks)
        |), tbig AS (
        |  SELECT w1, w2 FROM big WHERE lang = 'en'
        |), ctx AS (
        |  SELECT w1, COUNT(*) AS c1 FROM tbig GROUP BY w1
        |), pair AS (
        |  SELECT w1, w2, COUNT(*) AS c12 FROM tbig GROUP BY w1, w2
        |), voc AS (
        |  SELECT COUNT(DISTINCT w) AS v
        |  FROM (SELECT unnest(ws) AS w FROM toks WHERE lang = 'en')
        |), model AS (
        |  SELECT p.w1, p.w2,
        |    (p.c12 + 0.5) / (c.c1 + 0.5 * voc.v) AS p
        |  FROM pair p JOIN ctx c USING (w1), voc
        |), scored AS (
        |  SELECT b.doc_id,
        |    ln(COALESCE(m.p,
        |      0.5 / (COALESCE(c.c1, 0) + 0.5 * voc.v))) AS lp
        |  FROM big b
        |  LEFT JOIN model m ON b.w1 = m.w1 AND b.w2 = m.w2
        |  LEFT JOIN ctx c ON b.w1 = c.w1, voc
        |), agg AS (
        |  SELECT doc_id, COUNT(*) AS n_bigrams, EXP(-AVG(lp)) AS ppl
        |  FROM scored GROUP BY doc_id
        |)
        |SELECT d.doc_id,
        |  COALESCE(a.n_bigrams, 0) AS n_bigrams,
        |  ROUND(a.ppl, 6) AS ppl
        |FROM documents d LEFT JOIN agg a USING (doc_id)""".stripMargin

  /** BM25 CTE chain up to `scored` (query_id, doc_id, bm25) — shared
    * by the bm25 oracle (which ranks it) and the hybrid-retrieval
    * oracle (which fuses it with the cosine ranking). */
  private val bm25CtesSql: String =
    """WITH toks AS MATERIALIZED (
      |  SELECT doc_id,
      |    list_filter(regexp_split_to_array(lower(text), '[^\p{L}\p{N}]+'),
      |                t -> length(t) > 0) AS ws
      |  FROM documents
      |), dl AS (
      |  SELECT doc_id, len(ws) AS dl FROM toks
      |), stats AS (
      |  SELECT COUNT(*) AS n, AVG(dl) AS avgdl FROM dl
      |), tfc AS (
      |  SELECT doc_id, term, COUNT(*) AS tf
      |  FROM (SELECT doc_id, unnest(ws) AS term FROM toks)
      |  GROUP BY 1, 2
      |), dfx AS (
      |  SELECT term, COUNT(*) AS df_docs FROM tfc GROUP BY 1
      |), qt AS (
      |  SELECT DISTINCT doc_id AS query_id, term
      |  FROM (SELECT doc_id, unnest(ws) AS term FROM toks
      |        WHERE doc_id < 5)
      |), contrib AS (
      |  SELECT q.query_id, f.doc_id,
      |    ln(1.0 + (s.n - d.df_docs + 0.5) / (d.df_docs + 0.5)) *
      |      (f.tf * (1.2 + 1.0)) /
      |      (f.tf + 1.2 * ((1.0 - 0.75) + 0.75 * l.dl / s.avgdl)) AS c
      |  FROM qt q
      |  JOIN tfc f USING (term)
      |  JOIN dfx d USING (term)
      |  JOIN dl l ON l.doc_id = f.doc_id
      |  CROSS JOIN stats s
      |  WHERE f.doc_id <> q.query_id
      |), scored AS (
      |  SELECT query_id, doc_id, ROUND(SUM(c), 6) AS bm25
      |  FROM contrib GROUP BY 1, 2
      |)""".stripMargin

  /** Shared by text_bm25 and text_bm25_persisted (round-trip must be
    * the identity). */
  /** Shared by events_window and its round-11 streaming twin
    * stream_window_counts (complete-mode materialization makes the
    * final sink state equal the batch aggregate). */
  // shared verbatim between the batch row and its streaming twin — the
  // "oracle IS the batch SQL" claim enforced by construction
  private val eventsSessionizeOracle: String =
    """SELECT event_id, user_id, strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts,
        |  CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_idx
        |FROM (
        |  SELECT event_id, user_id, ts,
        |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
        |           OR CAST(floor(epoch(ts)) AS BIGINT)
        |              - CAST(floor(epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))) AS BIGINT) > 1800
        |         THEN 1 ELSE 0 END AS is_new
        |  FROM events)""".stripMargin

  private val eventsAttributionOracle: String =
    """WITH c AS (
        |  SELECT event_id AS click_id, user_id, ts AS click_ts,
        |    epoch_us(ts) AS c_us
        |  FROM events WHERE event_type = 'click'
        |), p AS (
        |  SELECT event_id AS purchase_id, user_id, ts AS purchase_ts,
        |    epoch_us(ts) AS p_us
        |  FROM events WHERE event_type = 'purchase'
        |)
        |SELECT c.click_id, p.purchase_id, c.user_id,
        |  strftime(c.click_ts, '%Y-%m-%d %H:%M:%S.%f') AS click_ts,
        |  strftime(p.purchase_ts, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts
        |FROM c JOIN p ON c.user_id = p.user_id
        |  AND p.p_us >= c.c_us
        |  AND p.p_us <= c.c_us + 3600000000""".stripMargin

  // shared between the one-shot sketch row and its persisted
  // incremental twin; capacity lives in FrequentItems.DefaultCapacity
  /** The BPE oracle: the full 3-step unrolled learn restated — word
    * table (top-200 by count DESC, word ASC), char symbols, and per
    * step the pair-count argmax plus the leftmost-nonoverlap rewrite
    * (match marks → run parity via (i − run_start) % 2 → consumed
    * right neighbors dropped → reindex). Same window algebra as
    * `Bpe.applyMerge`, so Spark and DuckDB agree position by
    * position; `finalSelect` picks the merges or the segmentation
    * view of the shared chain. */
  private def bpeOracle(finalSelect: String): String = {
    val stepBlocks = (1 to 3).map { k =>
      val prev = s"syms${k - 1}"
      s"""p$k AS (
         |  SELECT a.s AS l, b.s AS r, CAST(SUM(a.cnt) AS BIGINT) AS pc
         |  FROM $prev a JOIN $prev b
         |    ON b.word = a.word AND b.i = a.i + 1
         |  GROUP BY 1, 2
         |), b$k AS (
         |  SELECT l, r, pc FROM p$k ORDER BY pc DESC, l, r LIMIT 1
         |), m$k AS (
         |  SELECT s.word, s.cnt, s.i, s.s,
         |    COALESCE(s.s = (SELECT l FROM b$k) AND
         |      lead(s.s) OVER (PARTITION BY s.word ORDER BY s.i)
         |        = (SELECT r FROM b$k), FALSE) AS mt
         |  FROM $prev s
         |), g$k AS (
         |  SELECT *, SUM(CASE WHEN mt THEN 0 ELSE 1 END)
         |    OVER (PARTITION BY word ORDER BY i) AS grp
         |  FROM m$k
         |), r$k AS (
         |  SELECT *, CASE WHEN mt THEN
         |      CAST(i - min(i) OVER (PARTITION BY word, grp, mt) AS INT)
         |        % 2 = 0
         |    ELSE FALSE END AS keepm
         |  FROM g$k
         |), d$k AS (
         |  SELECT *, COALESCE(lag(keepm)
         |    OVER (PARTITION BY word ORDER BY i), FALSE) AS consumed
         |  FROM r$k
         |), syms$k AS (
         |  SELECT word, cnt,
         |    row_number() OVER (PARTITION BY word ORDER BY i) AS i,
         |    CASE WHEN keepm THEN s || (SELECT r FROM b$k) ELSE s END AS s
         |  FROM d$k WHERE keepm OR NOT consumed
         |)""".stripMargin
    }.mkString(", ")
    s"""WITH w0 AS (
       |  SELECT word, cnt FROM (
       |    SELECT t.w AS word, COUNT(*) AS cnt
       |    FROM documents,
       |      unnest(regexp_extract_all(lower(text), '[\\p{L}]+')) AS t(w)
       |    GROUP BY 1)
       |  ORDER BY cnt DESC, word LIMIT 200
       |), syms0 AS (
       |  SELECT word, cnt, i, substr(word, CAST(i AS INT), 1) AS s
       |  FROM w0, unnest(range(1, length(word) + 1)) AS t(i)
       |), $stepBlocks
       |$finalSelect""".stripMargin
  }

  private val heavyHittersOracle: String =
    """WITH toks AS (
        |  SELECT regexp_extract_all(lower(text), '[\p{L}\p{N}]+') AS w
        |  FROM documents
        |), g AS (
        |  SELECT unnest(list_transform(range(1, len(w)),
        |                               i -> w[i] || ' ' || w[i + 1])) AS gram
        |  FROM toks WHERE len(w) >= 2
        |)
        |SELECT gram, count(*) AS cnt, CAST(0 AS BIGINT) AS max_error
        |FROM g GROUP BY gram
        |ORDER BY cnt DESC, gram LIMIT 50""".stripMargin

  private val eventsWindowOracle: String =
    """SELECT strftime(time_bucket(INTERVAL 1 HOUR, ts), '%Y-%m-%d %H:%M:%S') AS window_start,
      |  strftime(time_bucket(INTERVAL 1 HOUR, ts) + INTERVAL 1 HOUR, '%Y-%m-%d %H:%M:%S') AS window_end,
      |  event_type, COUNT(*) AS n_events,
      |  ROUND(SUM(value), 6) AS total_value
      |FROM events GROUP BY 1, 2, 3""".stripMargin

  private val bm25Oracle: String =
    bm25CtesSql +
      """
      |SELECT query_id, doc_id, CAST(rnk AS INT) AS rank, bm25
      |FROM (
      |  SELECT *, row_number() OVER (
      |    PARTITION BY query_id ORDER BY bm25 DESC, doc_id) AS rnk
      |  FROM scored
      |) WHERE rnk <= 10""".stripMargin

  /** Round-11 build-half oracle for text_bm25_write: the all-integer
    * postings profile re-derived from the shared tokenizer CTEs. */
  private val bm25WriteOracle: String =
    bm25CtesSql +
      """
      |SELECT COUNT(DISTINCT term) AS n_terms, COUNT(*) AS n_postings,
      |  CAST(SUM(tf) AS BIGINT) AS tf_sum,
      |  COUNT(DISTINCT doc_id) AS n_docs
      |FROM tfc""".stripMargin

  /** Round-11 build-half oracle for similarity_ivfpq_build: coarse
    * assignment (ivf multiplier 2246822519) + PQ encode (pq multiplier
    * 2654435761) re-derived in SQL, summarized per cell with all-integer
    * checksums. CTE arithmetic matches the similarity_ivfpq probe oracle
    * verbatim; only the final aggregation differs. */
  // shared CTE prefix of the IVFPQ probe oracle and its build-half
  // twin: hash-draw codebook + hash-draw IVF centroids + cosine argmax
  // assignment — ONE text, so a fix to the draw/assignment arithmetic
  // cannot drift between the two rows (the null-element screen had to
  // be patched in three copies before this was factored).
  private val ivfPqAssignCtesSql: String =
    """WITH wf AS MATERIALIZED (
      |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
      |  FROM embeddings WHERE len(embedding) = 64
      |), vals AS MATERIALIZED (
      |  SELECT vec_id, unnest(range(0, len(e))) AS i, unnest(e) AS x
      |  FROM wf
      |), norms AS MATERIALIZED (
      |  SELECT vec_id, sqrt(SUM(x * x)) AS nrm FROM vals GROUP BY 1
      |), cb_rows AS (
      |  SELECT e, row_number() OVER (
      |    ORDER BY (vec_id % 1048573) * 2654435761 % 1048573, vec_id
      |  ) - 1 AS c
      |  FROM wf WHERE len(list_filter(e, x -> x IS NULL)) = 0
      |  QUALIFY c < 64
      |), cbv AS MATERIALIZED (
      |  SELECT c, unnest(range(0, len(e))) AS i, unnest(e) AS v
      |  FROM cb_rows
      |), ivf_rows AS (
      |  SELECT vec_id, e, row_number() OVER (
      |    ORDER BY (vec_id % 1048573) * 2246822519 % 1048573, vec_id
      |  ) - 1 AS cell
      |  FROM wf WHERE len(list_filter(e, x -> x IS NULL)) = 0
      |  QUALIFY cell < 16
      |), centv AS (
      |  SELECT cell, unnest(range(0, len(e))) AS i, unnest(e) AS v
      |  FROM ivf_rows
      |), cent AS MATERIALIZED (
      |  SELECT cell, i,
      |    v / sqrt(SUM(v * v) OVER (PARTITION BY cell)) AS cv
      |  FROM centv
      |), centnorm AS (
      |  SELECT cell, sqrt(SUM(cv * cv)) AS cnrm FROM cent GROUP BY 1
      |), rowdot AS (
      |  SELECT v.vec_id, c.cell, SUM(v.x * c.cv) AS dot
      |  FROM vals v JOIN cent c USING (i)
      |  GROUP BY 1, 2
      |), rowcos AS (
      |  SELECT d.vec_id, d.cell,
      |    CASE WHEN n.nrm > 0 THEN d.dot / (n.nrm * cn.cnrm)
      |      ELSE -1 END AS cos
      |  FROM rowdot d
      |  JOIN norms n ON n.vec_id = d.vec_id
      |  JOIN centnorm cn USING (cell)
      |), assign AS (
      |  SELECT vec_id, cell FROM rowcos
      |  QUALIFY row_number() OVER (
      |    PARTITION BY vec_id ORDER BY cos DESC, cell DESC) = 1
      |""".stripMargin

  private val similarityIvfPqBuildOracle: String =
    ivfPqAssignCtesSql +
      """), dists AS (
      |  SELECT v.vec_id, cb.c, v.i // 4 AS j,
      |    SUM((v.x - cb.v) * (v.x - cb.v)) AS d2
      |  FROM vals v JOIN cbv cb USING (i)
      |  GROUP BY 1, 2, 3
      |), codes AS (
      |  SELECT vec_id, j, c FROM dists
      |  QUALIFY row_number() OVER (
      |    PARTITION BY vec_id, j ORDER BY d2, c) = 1
      |), percell AS (
      |  SELECT a.cell, cd.vec_id, SUM(cd.c) AS row_code_sum
      |  FROM codes cd JOIN assign a USING (vec_id)
      |  GROUP BY 1, 2
      |)
      |SELECT CAST(cell AS INT) AS cell, COUNT(*) AS n_vecs,
      |  CAST(SUM(vec_id) AS BIGINT) AS id_sum,
      |  CAST(SUM(row_code_sum) AS BIGINT) AS code_sum
      |FROM percell GROUP BY 1""".stripMargin

  /** The hash-init IVFPQ probe chain up to `scored` (query_id,
    * neighbor_id, 6dp ADC pq_score over probed candidates) — shared by
    * the `similarity_ivfpq` oracle (which ranks it) and the round-14
    * recall oracle (which compares its ranking against the exact
    * top-k): cell-pruned candidates (top-8 probe cells), per-subvector
    * code assignment, and the ADC dot rebuilt from the codebook. */
  private val ivfPqProbeScoredCtesSql: String =
    """), probecells AS (
      |  SELECT vec_id AS query_id, cell FROM rowcos
      |  WHERE vec_id < 10
      |  QUALIFY row_number() OVER (
      |    PARTITION BY vec_id ORDER BY cos DESC, cell DESC) <= 8
      |), dists AS (
      |  SELECT v.vec_id, cb.c, v.i // 4 AS j,
      |    SUM((v.x - cb.v) * (v.x - cb.v)) AS d2
      |  FROM vals v JOIN cbv cb USING (i)
      |  GROUP BY 1, 2, 3
      |), codes AS (
      |  SELECT vec_id, j, c FROM dists
      |  QUALIFY row_number() OVER (
      |    PARTITION BY vec_id, j ORDER BY d2, c) = 1
      |), qdots AS (
      |  SELECT q.vec_id AS query_id, cb.c, q.i // 4 AS j,
      |    SUM(q.x * cb.v) AS dot
      |  FROM vals q JOIN cbv cb USING (i)
      |  WHERE q.vec_id < 10
      |  GROUP BY 1, 2, 3
      |), adc AS (
      |  SELECT qd.query_id, cd.vec_id AS neighbor_id, SUM(qd.dot) AS adc_dot
      |  FROM codes cd
      |  JOIN qdots qd ON qd.j = cd.j AND qd.c = cd.c
      |  JOIN assign a ON a.vec_id = cd.vec_id
      |  JOIN probecells p ON p.query_id = qd.query_id AND p.cell = a.cell
      |  WHERE cd.vec_id <> qd.query_id
      |  GROUP BY 1, 2
      |), scored AS (
      |  SELECT a.query_id, a.neighbor_id,
      |    ROUND(CASE WHEN nn.nrm > 0 AND qn.nrm > 0
      |      THEN a.adc_dot / (nn.nrm * qn.nrm) ELSE -1 END, 6) AS pq_score
      |  FROM adc a
      |  JOIN norms nn ON nn.vec_id = a.neighbor_id
      |  JOIN norms qn ON qn.vec_id = a.query_id
      |)""".stripMargin

  /** Round-14: recall@10 of the hash-init IVFPQ probe against the
    * exact cosine top-k, re-derived entirely in SQL — the quantization
    * loss of the two-level (cell-pruned + ADC-scored) scan becomes a
    * gated number. Truth CTEs identical to [[ivfRecallOracle]]'s. */
  private val ivfPqRecallOracle: String =
    ivfPqAssignCtesSql + ivfPqProbeScoredCtesSql + annRecallTailSql("pq_score")

  /** The full SQ8 index re-derived in SQL up to its `scored` CTE:
    * per-dim exact min/max bounds, half-UP quantize to 0..255
    * (floor(v + 0.5) — spelled identically in SqEncode.compute),
    * reconstruction, ADC dot against the raw query,
    * reconstructed-norm cosine, 6dp pre-rank rounding. Shared by the
    * top-10 row (`similarity_sq8`) and its recall row (r15). */
  private val sq8ScoredCtesSql: String =
    """WITH vals AS (
      |  SELECT vec_id,
      |    unnest(range(1, len(embedding) + 1)) AS i,
      |    unnest(CAST(embedding AS DOUBLE[])) AS x
      |  FROM embeddings
      |), bounds AS (
      |  SELECT i, MIN(x) AS vmin, MAX(x) - MIN(x) AS vdiff
      |  FROM vals GROUP BY i
      |), recon AS (
      |  SELECT vec_id, v.i,
      |    b.vmin + (CASE WHEN b.vdiff = 0 THEN 0
      |      ELSE LEAST(255, GREATEST(0,
      |        CAST(floor((v.x - b.vmin) / b.vdiff * 255.0 + 0.5) AS INT))) END)
      |      * b.vdiff / 255.0 AS xr
      |  FROM vals v JOIN bounds b USING (i)
      |), rn AS (
      |  SELECT vec_id, sqrt(sum(xr * xr)) AS rnorm FROM recon GROUP BY vec_id
      |), qn AS (
      |  SELECT vec_id, sqrt(sum(x * x)) AS q_norm
      |  FROM vals WHERE vec_id < 10 GROUP BY vec_id
      |), dots AS (
      |  SELECT q.vec_id AS query_id, r.vec_id AS neighbor_id,
      |    SUM(q.x * r.xr) AS dot
      |  FROM vals q JOIN recon r ON q.i = r.i AND r.vec_id <> q.vec_id
      |  WHERE q.vec_id < 10
      |  GROUP BY 1, 2
      |), scored AS (
      |  SELECT d.query_id, d.neighbor_id,
      |    ROUND(CASE WHEN rn.rnorm > 0 AND qn.q_norm > 0
      |      THEN d.dot / (rn.rnorm * qn.q_norm) ELSE -1 END, 6) AS sq_score
      |  FROM dots d
      |  JOIN rn ON rn.vec_id = d.neighbor_id
      |  JOIN qn ON qn.vec_id = d.query_id
      |)""".stripMargin

  /** The full hash-init PQ pipeline re-derived in SQL up to its
    * `scored` CTE (codebook draw, per-subspace encode argmin, ADC dot,
    * exact-norm cosine, 6dp pre-rank rounding). Shared by the top-10
    * row (`similarity_pq`) and its recall row (r15). */
  private val pqScoredCtesSql: String =
    """WITH wf AS MATERIALIZED (
      |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
      |  FROM embeddings WHERE len(embedding) = 64
      |), cb_rows AS (
      |  SELECT e, row_number() OVER (
      |    ORDER BY (vec_id % 1048573) * 2654435761 % 1048573, vec_id
      |  ) - 1 AS c
      |  FROM wf WHERE len(list_filter(e, x -> x IS NULL)) = 0
      |  QUALIFY c < 64
      |), vals AS MATERIALIZED (
      |  SELECT vec_id, unnest(range(0, len(e))) AS i, unnest(e) AS x
      |  FROM wf
      |), cbv AS MATERIALIZED (
      |  SELECT c, unnest(range(0, len(e))) AS i, unnest(e) AS v
      |  FROM cb_rows
      |), dists AS (
      |  SELECT v.vec_id, cb.c, v.i // 4 AS j,
      |    SUM((v.x - cb.v) * (v.x - cb.v)) AS d2
      |  FROM vals v JOIN cbv cb USING (i)
      |  GROUP BY 1, 2, 3
      |), codes AS (
      |  SELECT vec_id, j, c FROM dists
      |  QUALIFY row_number() OVER (
      |    PARTITION BY vec_id, j ORDER BY d2, c) = 1
      |), qdots AS (
      |  SELECT q.vec_id AS query_id, cb.c, q.i // 4 AS j,
      |    SUM(q.x * cb.v) AS dot
      |  FROM vals q JOIN cbv cb USING (i)
      |  WHERE q.vec_id < 10
      |  GROUP BY 1, 2, 3
      |), norms AS (
      |  SELECT vec_id, sqrt(SUM(x * x)) AS nrm FROM vals GROUP BY 1
      |), adc AS (
      |  SELECT qd.query_id, cd.vec_id AS neighbor_id, SUM(qd.dot) AS adc_dot
      |  FROM codes cd JOIN qdots qd ON qd.j = cd.j AND qd.c = cd.c
      |  WHERE cd.vec_id <> qd.query_id
      |  GROUP BY 1, 2
      |), scored AS (
      |  SELECT a.query_id, a.neighbor_id,
      |    ROUND(CASE WHEN nn.nrm > 0 AND qn.nrm > 0
      |      THEN a.adc_dot / (nn.nrm * qn.nrm) ELSE -1 END, 6) AS pq_score
      |  FROM adc a
      |  JOIN norms nn ON nn.vec_id = a.neighbor_id
      |  JOIN norms qn ON qn.vec_id = a.query_id
      |)""".stripMargin

  // ---- round-11 frozen-scoring oracles: the SQL is string-interpolated
  // from the SAME Scala constants the registered queries evaluate
  // (Double.toString round-trips bit-exactly through DuckDB's parser),
  // so the two engines cannot drift on a literal.
  private def sqlD(d: Double): String = d.toString
  private val customerXs = Seq("CAST(c_acctbal AS DOUBLE)",
    "CAST(c_nationkey AS DOUBLE)", "CAST(c_custkey AS DOUBLE)")

  private val pcaScoringOracle: String = {
    val projs = PcaScoringLoadings.zipWithIndex.map { case (w, j) =>
      val sum = customerXs.zip(w)
        .map { case (x, wi) => s"$x * ${sqlD(wi)}" }.mkString(" + ")
      s"ROUND($sum, 6) AS pca_$j"
    }
    s"""SELECT c_custkey, c_acctbal, c_nationkey,
       |  ${projs.mkString(",\n  ")}
       |FROM customer""".stripMargin
  }

  private val probabilityScoringOracle: String = {
    val k = ScoringCoefficients.length
    val margins = ScoringCoefficients.zip(ScoringIntercepts)
      .map { case (w, b) =>
        sqlD(b) + customerXs.zip(w)
          .map { case (x, wi) => s" + $x * ${sqlD(wi)}" }.mkString
      }
    val mDefs = margins.zipWithIndex
      .map { case (m, j) => s"$m AS m$j" }.mkString(",\n    ")
    val denom = (0 until k).map(j => s"exp(m$j)").mkString(" + ")
    val probs = (0 until k)
      .map(j => s"ROUND(exp(m$j) / denom, 6) AS prob_$j").mkString(",\n  ")
    // first-max argmax: class j wins iff it is >= every later class and
    // no earlier class already won — exactly MLlib Vector.argmax
    val pred = (0 until k - 1).map { j =>
      val geRest = (j + 1 until k).map(i => s"m$j >= m$i").mkString(" AND ")
      s"WHEN $geRest THEN $j.0"
    }.mkString("CASE ", " ", s" ELSE ${k - 1}.0 END")
    s"""WITH m AS (
       |  SELECT c_custkey, c_acctbal, c_nationkey,
       |    $mDefs
       |  FROM customer
       |), e AS (
       |  SELECT *, $denom AS denom FROM m
       |)
       |SELECT c_custkey, c_acctbal, c_nationkey,
       |  $probs,
       |  $pred AS prediction
       |FROM e""".stripMargin
  }

  private val kmeansHashInitOracle: String = {
    val terms = customerXs.zipWithIndex
      .map { case (x, i) => s"(f.x$i - c.k$i) * (f.x$i - c.k$i)" }
      .mkString(" + ")
    s"""WITH feat AS MATERIALIZED (
       |  SELECT c_custkey, c_acctbal, c_nationkey,
       |    CAST(c_acctbal AS DOUBLE) AS x0,
       |    CAST(c_nationkey AS DOUBLE) AS x1,
       |    CAST(c_custkey AS DOUBLE) AS x2
       |  FROM customer
       |), cent AS (
       |  SELECT x0 AS k0, x1 AS k1, x2 AS k2, row_number() OVER (
       |    ORDER BY (c_custkey % 1048573) * ${DimReduction.KmeansHashMultiplier} % 1048573, c_custkey
       |  ) - 1 AS j
       |  FROM feat QUALIFY j < 8
       |), d AS (
       |  SELECT f.c_custkey, f.c_acctbal, f.c_nationkey, c.j,
       |    $terms AS d2
       |  FROM feat f CROSS JOIN cent c
       |)
       |SELECT c_custkey, c_acctbal, c_nationkey, CAST(j AS INT) AS prediction,
       |  ROUND(d2, 6) AS dist2
       |FROM d
       |QUALIFY row_number() OVER (PARTITION BY c_custkey ORDER BY d2, j) = 1""".stripMargin
  }

  /** One UNROLLED Lloyd step on top of the hash-init draw
    * (round 11): assignment a0 against the drawn centroids, per-cluster
    * ROUND(AVG, 6) re-centering (COALESCE keeps an emptied cluster's
    * previous centroid — kmeansLloyd's contract), then the final
    * assignment against the updated centroids. The 6dp round is what
    * makes the ITERATION itself engine-portable: both engines assign
    * against bit-identical updated-centroid literals. */
  private def kmeansLloydOracle(steps: Int): String = {
    def terms(c: String) = customerXs.indices
      .map(i => s"(f.x$i - $c.k$i) * (f.x$i - $c.k$i)").mkString(" + ")
    // one CTE triple per unrolled step s: assignment a{s-1} against
    // cent{s-1}, 6dp-rounded per-cluster means upd{s}, updated
    // centroids cent{s} (COALESCE keeps an emptied cluster's previous
    // centroid — kmeansLloyd's contract). The round-12 lloyd2 row
    // chains TWO of these, hash-proving the iteration COMPOSITION
    // (re-centered centroids feeding the next assignment), not just
    // one step's arithmetic.
    val updCols = customerXs.indices
      .map(i => s"ROUND(AVG(f.x$i), 6) AS k$i").mkString(",\n       |    ")
    val keepCols = customerXs.indices
      .map(i => s"COALESCE(u.k$i, c.k$i) AS k$i").mkString(",\n       |    ")
    val stepCtes = (1 to steps).map { s =>
      s""", a${s - 1} AS (
         |  SELECT f.c_custkey, c.j
         |  FROM feat f CROSS JOIN cent${s - 1} c
         |  QUALIFY row_number() OVER (PARTITION BY f.c_custkey
         |    ORDER BY ${terms("c")}, c.j) = 1
         |), upd$s AS (
         |  SELECT a${s - 1}.j, $updCols
         |  FROM a${s - 1} JOIN feat f USING (c_custkey) GROUP BY a${s - 1}.j
         |), cent$s AS (
         |  SELECT c.j, $keepCols
         |  FROM cent${s - 1} c LEFT JOIN upd$s u USING (j)
         |)""".stripMargin
    }.mkString
    s"""WITH feat AS MATERIALIZED (
       |  SELECT c_custkey, c_acctbal, c_nationkey,
       |    CAST(c_acctbal AS DOUBLE) AS x0,
       |    CAST(c_nationkey AS DOUBLE) AS x1,
       |    CAST(c_custkey AS DOUBLE) AS x2
       |  FROM customer
       |), cent0 AS (
       |  SELECT x0 AS k0, x1 AS k1, x2 AS k2, row_number() OVER (
       |    ORDER BY (c_custkey % 1048573) * ${DimReduction.KmeansHashMultiplier} % 1048573, c_custkey
       |  ) - 1 AS j
       |  FROM feat QUALIFY j < 8
       |)""".stripMargin + stepCtes +
      s""", d AS (
         |  SELECT f.c_custkey, f.c_acctbal, f.c_nationkey, c.j,
         |    ${terms("c")} AS d2
         |  FROM feat f CROSS JOIN cent$steps c
         |)
         |SELECT c_custkey, c_acctbal, c_nationkey, CAST(j AS INT) AS prediction,
         |  ROUND(d2, 6) AS dist2
         |FROM d
         |QUALIFY row_number() OVER (PARTITION BY c_custkey ORDER BY d2, j) = 1""".stripMargin
  }

  /** Brute-force simhash ground truth shared by the pair oracle and
    * the round-11 star-reduction oracle: the full xxHash64 + Charikar
    * fingerprint re-derivation (CTEs up to `fpl`), then all pairs at
    * Hamming <= 3 within the +-1 length-bucket salt horizon. */
  private val simhashPairsOracle: String =
    """WITH RECURSIVE pow2(i, p) AS (
        |  SELECT 0, 1::HUGEINT UNION ALL SELECT i + 1, p * 2 FROM pow2 WHERE i < 63
        |), toks AS MATERIALIZED (
        |  SELECT doc_id,
        |    list_filter(regexp_split_to_array(lower(text), '[^\p{L}\p{N}]+'),
        |                t -> length(t) > 0) AS tokens
        |  FROM documents
        |), lens AS (
        |  SELECT doc_id,
        |    CAST(floor(ln(len(tokens)) / ln(2)) AS INT) AS len_bucket
        |  FROM toks WHERE len(tokens) > 0
        |), tok AS (
        |  SELECT doc_id, unnest(tokens) AS t FROM toks WHERE len(tokens) > 0
        |), x0 AS (
        |  SELECT doc_id, t, length(t) AS l,
        |    (42::HUGEINT + 2870177450012600261::HUGEINT + length(t)) % 18446744073709551616::HUGEINT AS a
        |  FROM tok
        |), s0k1 AS (
        |  SELECT *, CASE WHEN l >= 8 THEN ((((unicode(t[1]) + unicode(t[2]) * 256::HUGEINT + unicode(t[3]) * 65536::HUGEINT + unicode(t[4]) * 16777216::HUGEINT + unicode(t[5]) * 4294967296::HUGEINT + unicode(t[6]) * 1099511627776::HUGEINT + unicode(t[7]) * 281474976710656::HUGEINT + unicode(t[8]) * 72057594037927936::HUGEINT) % 4294967296::HUGEINT) * 14029467366897019727::HUGEINT % 18446744073709551616::HUGEINT + (((unicode(t[1]) + unicode(t[2]) * 256::HUGEINT + unicode(t[3]) * 65536::HUGEINT + unicode(t[4]) * 16777216::HUGEINT + unicode(t[5]) * 4294967296::HUGEINT + unicode(t[6]) * 1099511627776::HUGEINT + unicode(t[7]) * 281474976710656::HUGEINT + unicode(t[8]) * 72057594037927936::HUGEINT) // 4294967296::HUGEINT) * 14029467366897019727::HUGEINT % 4294967296::HUGEINT) * 4294967296::HUGEINT) % 18446744073709551616::HUGEINT) ELSE 0::HUGEINT END AS k1 FROM x0
        |), s0k3 AS (
        |  SELECT * EXCLUDE (k1), CASE WHEN l >= 8 THEN (((((k1 * 2147483648::HUGEINT) % 18446744073709551616::HUGEINT + (k1 // 8589934592::HUGEINT)) % 4294967296::HUGEINT) * 11400714785074694791::HUGEINT % 18446744073709551616::HUGEINT + ((((k1 * 2147483648::HUGEINT) % 18446744073709551616::HUGEINT + (k1 // 8589934592::HUGEINT)) // 4294967296::HUGEINT) * 11400714785074694791::HUGEINT % 4294967296::HUGEINT) * 4294967296::HUGEINT) % 18446744073709551616::HUGEINT) ELSE 0::HUGEINT END AS k3 FROM s0k1
        |), s0x AS (
        |  SELECT * EXCLUDE (a, k3), CASE WHEN l >= 8 THEN xor(a, k3) ELSE a END AS a FROM s0k3
        |), s0 AS (
        |  SELECT * EXCLUDE (a), CASE WHEN l >= 8 THEN ((((((a * 134217728::HUGEINT) % 18446744073709551616::HUGEINT + (a // 137438953472::HUGEINT)) % 4294967296::HUGEINT) * 11400714785074694791::HUGEINT % 18446744073709551616::HUGEINT + ((((a * 134217728::HUGEINT) % 18446744073709551616::HUGEINT + (a // 137438953472::HUGEINT)) // 4294967296::HUGEINT) * 11400714785074694791::HUGEINT % 4294967296::HUGEINT) * 4294967296::HUGEINT) % 18446744073709551616::HUGEINT) + 9650029242287828579::HUGEINT) % 18446744073709551616::HUGEINT ELSE a END AS a FROM s0x
        |), s1k1 AS (
        |  SELECT *, CASE WHEN l >= 16 THEN ((((unicode(t[9]) + unicode(t[10]) * 256::HUGEINT + unicode(t[11]) * 65536::HUGEINT + unicode(t[12]) * 16777216::HUGEINT + unicode(t[13]) * 4294967296::HUGEINT + unicode(t[14]) * 1099511627776::HUGEINT + unicode(t[15]) * 281474976710656::HUGEINT + unicode(t[16]) * 72057594037927936::HUGEINT) % 4294967296::HUGEINT) * 14029467366897019727::HUGEINT % 18446744073709551616::HUGEINT + (((unicode(t[9]) + unicode(t[10]) * 256::HUGEINT + unicode(t[11]) * 65536::HUGEINT + unicode(t[12]) * 16777216::HUGEINT + unicode(t[13]) * 4294967296::HUGEINT + unicode(t[14]) * 1099511627776::HUGEINT + unicode(t[15]) * 281474976710656::HUGEINT + unicode(t[16]) * 72057594037927936::HUGEINT) // 4294967296::HUGEINT) * 14029467366897019727::HUGEINT % 4294967296::HUGEINT) * 4294967296::HUGEINT) % 18446744073709551616::HUGEINT) ELSE 0::HUGEINT END AS k1 FROM s0
        |), s1k3 AS (
        |  SELECT * EXCLUDE (k1), CASE WHEN l >= 16 THEN (((((k1 * 2147483648::HUGEINT) % 18446744073709551616::HUGEINT + (k1 // 8589934592::HUGEINT)) % 4294967296::HUGEINT) * 11400714785074694791::HUGEINT % 18446744073709551616::HUGEINT + ((((k1 * 2147483648::HUGEINT) % 18446744073709551616::HUGEINT + (k1 // 8589934592::HUGEINT)) // 4294967296::HUGEINT) * 11400714785074694791::HUGEINT % 4294967296::HUGEINT) * 4294967296::HUGEINT) % 18446744073709551616::HUGEINT) ELSE 0::HUGEINT END AS k3 FROM s1k1
        |), s1x AS (
        |  SELECT * EXCLUDE (a, k3), CASE WHEN l >= 16 THEN xor(a, k3) ELSE a END AS a FROM s1k3
        |), s1 AS (
        |  SELECT * EXCLUDE (a), CASE WHEN l >= 16 THEN ((((((a * 134217728::HUGEINT) % 18446744073709551616::HUGEINT + (a // 137438953472::HUGEINT)) % 4294967296::HUGEINT) * 11400714785074694791::HUGEINT % 18446744073709551616::HUGEINT + ((((a * 134217728::HUGEINT) % 18446744073709551616::HUGEINT + (a // 137438953472::HUGEINT)) // 4294967296::HUGEINT) * 11400714785074694791::HUGEINT % 4294967296::HUGEINT) * 4294967296::HUGEINT) % 18446744073709551616::HUGEINT) + 9650029242287828579::HUGEINT) % 18446744073709551616::HUGEINT ELSE a END AS a FROM s1x
        |), s2k1 AS (
        |  SELECT *, CASE WHEN l >= 24 THEN ((((unicode(t[17]) + unicode(t[18]) * 256::HUGEINT + unicode(t[19]) * 65536::HUGEINT + unicode(t[20]) * 16777216::HUGEINT + unicode(t[21]) * 4294967296::HUGEINT + unicode(t[22]) * 1099511627776::HUGEINT + unicode(t[23]) * 281474976710656::HUGEINT + unicode(t[24]) * 72057594037927936::HUGEINT) % 4294967296::HUGEINT) * 14029467366897019727::HUGEINT % 18446744073709551616::HUGEINT + (((unicode(t[17]) + unicode(t[18]) * 256::HUGEINT + unicode(t[19]) * 65536::HUGEINT + unicode(t[20]) * 16777216::HUGEINT + unicode(t[21]) * 4294967296::HUGEINT + unicode(t[22]) * 1099511627776::HUGEINT + unicode(t[23]) * 281474976710656::HUGEINT + unicode(t[24]) * 72057594037927936::HUGEINT) // 4294967296::HUGEINT) * 14029467366897019727::HUGEINT % 4294967296::HUGEINT) * 4294967296::HUGEINT) % 18446744073709551616::HUGEINT) ELSE 0::HUGEINT END AS k1 FROM s1
        |), s2k3 AS (
        |  SELECT * EXCLUDE (k1), CASE WHEN l >= 24 THEN (((((k1 * 2147483648::HUGEINT) % 18446744073709551616::HUGEINT + (k1 // 8589934592::HUGEINT)) % 4294967296::HUGEINT) * 11400714785074694791::HUGEINT % 18446744073709551616::HUGEINT + ((((k1 * 2147483648::HUGEINT) % 18446744073709551616::HUGEINT + (k1 // 8589934592::HUGEINT)) // 4294967296::HUGEINT) * 11400714785074694791::HUGEINT % 4294967296::HUGEINT) * 4294967296::HUGEINT) % 18446744073709551616::HUGEINT) ELSE 0::HUGEINT END AS k3 FROM s2k1
        |), s2x AS (
        |  SELECT * EXCLUDE (a, k3), CASE WHEN l >= 24 THEN xor(a, k3) ELSE a END AS a FROM s2k3
        |), s2 AS (
        |  SELECT * EXCLUDE (a), CASE WHEN l >= 24 THEN ((((((a * 134217728::HUGEINT) % 18446744073709551616::HUGEINT + (a // 137438953472::HUGEINT)) % 4294967296::HUGEINT) * 11400714785074694791::HUGEINT % 18446744073709551616::HUGEINT + ((((a * 134217728::HUGEINT) % 18446744073709551616::HUGEINT + (a // 137438953472::HUGEINT)) // 4294967296::HUGEINT) * 11400714785074694791::HUGEINT % 4294967296::HUGEINT) * 4294967296::HUGEINT) % 18446744073709551616::HUGEINT) + 9650029242287828579::HUGEINT) % 18446744073709551616::HUGEINT ELSE a END AS a FROM s2x
        |), y4x AS (
        |  SELECT * EXCLUDE (a), CASE WHEN l % 8 >= 4
        |    THEN xor(a, ((unicode(t[(l // 8) * 8 + 1]) + unicode(t[(l // 8) * 8 + 2]) * 256 + unicode(t[(l // 8) * 8 + 3]) * 65536 + unicode(t[(l // 8) * 8 + 4]) * 16777216)::HUGEINT * 11400714785074694791::HUGEINT) % 18446744073709551616::HUGEINT) ELSE a END AS a
        |  FROM s2
        |), y4 AS (
        |  SELECT * EXCLUDE (a), CASE WHEN l % 8 >= 4
        |    THEN ((((((a * 8388608::HUGEINT) % 18446744073709551616::HUGEINT + (a // 2199023255552::HUGEINT)) % 4294967296::HUGEINT) * 14029467366897019727::HUGEINT % 18446744073709551616::HUGEINT + ((((a * 8388608::HUGEINT) % 18446744073709551616::HUGEINT + (a // 2199023255552::HUGEINT)) // 4294967296::HUGEINT) * 14029467366897019727::HUGEINT % 4294967296::HUGEINT) * 4294967296::HUGEINT) % 18446744073709551616::HUGEINT) + 1609587929392839161::HUGEINT) % 18446744073709551616::HUGEINT ELSE a END AS a
        |  FROM y4x
        |), yq AS (
        |  SELECT *, (l // 8) * 8 + CASE WHEN l % 8 >= 4 THEN 4 ELSE 0 END AS q
        |  FROM y4
        |), b0x AS (
        |  SELECT * EXCLUDE (a), CASE WHEN l - q >= 1
        |    THEN xor(a, (unicode(t[q + 1]) * 2870177450012600261::HUGEINT) % 18446744073709551616::HUGEINT) ELSE a END AS a
        |  FROM yq
        |), b0 AS (
        |  SELECT * EXCLUDE (a), CASE WHEN l - q >= 1
        |    THEN (((((a * 2048::HUGEINT) % 18446744073709551616::HUGEINT + (a // 9007199254740992::HUGEINT)) % 4294967296::HUGEINT) * 11400714785074694791::HUGEINT % 18446744073709551616::HUGEINT + ((((a * 2048::HUGEINT) % 18446744073709551616::HUGEINT + (a // 9007199254740992::HUGEINT)) // 4294967296::HUGEINT) * 11400714785074694791::HUGEINT % 4294967296::HUGEINT) * 4294967296::HUGEINT) % 18446744073709551616::HUGEINT) ELSE a END AS a
        |  FROM b0x
        |), b1x AS (
        |  SELECT * EXCLUDE (a), CASE WHEN l - q >= 2
        |    THEN xor(a, (unicode(t[q + 2]) * 2870177450012600261::HUGEINT) % 18446744073709551616::HUGEINT) ELSE a END AS a
        |  FROM b0
        |), b1 AS (
        |  SELECT * EXCLUDE (a), CASE WHEN l - q >= 2
        |    THEN (((((a * 2048::HUGEINT) % 18446744073709551616::HUGEINT + (a // 9007199254740992::HUGEINT)) % 4294967296::HUGEINT) * 11400714785074694791::HUGEINT % 18446744073709551616::HUGEINT + ((((a * 2048::HUGEINT) % 18446744073709551616::HUGEINT + (a // 9007199254740992::HUGEINT)) // 4294967296::HUGEINT) * 11400714785074694791::HUGEINT % 4294967296::HUGEINT) * 4294967296::HUGEINT) % 18446744073709551616::HUGEINT) ELSE a END AS a
        |  FROM b1x
        |), b2x AS (
        |  SELECT * EXCLUDE (a), CASE WHEN l - q >= 3
        |    THEN xor(a, (unicode(t[q + 3]) * 2870177450012600261::HUGEINT) % 18446744073709551616::HUGEINT) ELSE a END AS a
        |  FROM b1
        |), b2 AS (
        |  SELECT * EXCLUDE (a), CASE WHEN l - q >= 3
        |    THEN (((((a * 2048::HUGEINT) % 18446744073709551616::HUGEINT + (a // 9007199254740992::HUGEINT)) % 4294967296::HUGEINT) * 11400714785074694791::HUGEINT % 18446744073709551616::HUGEINT + ((((a * 2048::HUGEINT) % 18446744073709551616::HUGEINT + (a // 9007199254740992::HUGEINT)) // 4294967296::HUGEINT) * 11400714785074694791::HUGEINT % 4294967296::HUGEINT) * 4294967296::HUGEINT) % 18446744073709551616::HUGEINT) ELSE a END AS a
        |  FROM b2x
        |), av1 AS (
        |  SELECT * EXCLUDE (a), (((xor(a, a // 8589934592::HUGEINT) % 4294967296::HUGEINT) * 14029467366897019727::HUGEINT % 18446744073709551616::HUGEINT + ((xor(a, a // 8589934592::HUGEINT) // 4294967296::HUGEINT) * 14029467366897019727::HUGEINT % 4294967296::HUGEINT) * 4294967296::HUGEINT) % 18446744073709551616::HUGEINT) AS a FROM b2
        |), av2 AS (
        |  SELECT * EXCLUDE (a), (((xor(a, a // 536870912::HUGEINT) % 4294967296::HUGEINT) * 1609587929392839161::HUGEINT % 18446744073709551616::HUGEINT + ((xor(a, a // 536870912::HUGEINT) // 4294967296::HUGEINT) * 1609587929392839161::HUGEINT % 4294967296::HUGEINT) * 4294967296::HUGEINT) % 18446744073709551616::HUGEINT) AS a FROM av1
        |), hashed AS (
        |  SELECT doc_id, xor(a, a // 4294967296::HUGEINT) AS h FROM av2
        |), bits AS (
        |  SELECT doc_id, i,
        |    SUM(CASE WHEN (h // p) % 2 = 1 THEN 1 ELSE -1 END) AS s
        |  FROM hashed CROSS JOIN pow2
        |  GROUP BY doc_id, i
        |), fp AS (
        |  SELECT doc_id, CAST(SUM(CASE WHEN s > 0 THEN
        |      CASE WHEN i = 63 THEN -9223372036854775808::HUGEINT ELSE p END
        |    ELSE 0::HUGEINT END) AS BIGINT) AS fp
        |  FROM bits JOIN pow2 USING (i) GROUP BY doc_id
        |), fpl AS (
        |  SELECT f.doc_id, f.fp, l.len_bucket FROM fp f JOIN lens l USING (doc_id)
        |)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  CAST(bit_count(xor(a.fp, b.fp)) AS INT) AS hamming
        |FROM fpl a JOIN fpl b
        |  ON a.doc_id < b.doc_id
        |  AND abs(a.len_bucket - b.len_bucket) <= 1
        |  AND bit_count(xor(a.fp, b.fp)) <= 3""".stripMargin

  /** [[simhashPairsOracle]]'s CTE prefix (everything up to and
    * including `fpl`), for oracles that band the same fingerprints
    * differently. */
  private val simhashFpCtesSql: String =
    simhashPairsOracle.substring(0,
      simhashPairsOracle.lastIndexOf("SELECT a.doc_id AS id_a"))

  /** Star-reduction oracle (round 11, band-parametric since r13): the
    * EXACT banding + linking mechanics — `bands`×(64/bands)-bit blocks
    * of the re-derived fingerprint, ±1 length-bucket salt replication,
    * then per bucket (ordered by doc_id) each row links to the
    * bucket's PREFIX MINIMUM and its PREDECESSOR. Block extraction is
    * (fp >> bits·b) & mask in both engines (arithmetic-shift sign bits
    * are masked off identically). Hamming filtering is the CALLER's
    * (star_drop / the star oracle tail). */
  private def simhashStarLinkCtesSql(bands: Int): String = {
    val bits = 64 / bands
    val mask = (1L << bits) - 1L
    s""", banded AS (
      |  SELECT f.doc_id, f.fp, f.len_bucket + off.o AS salt, b.band,
      |    (f.fp >> (b.band * $bits)) & $mask AS key
      |  FROM fpl f
      |  CROSS JOIN (SELECT unnest(range(0, $bands)) AS band) b
      |  CROSS JOIN (SELECT unnest([0, 1]) AS o) off
      |), linked AS (
      |  SELECT doc_id, fp,
      |    MIN(doc_id) OVER (PARTITION BY band, key, salt
      |      ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS mn_id,
      |    lag(doc_id) OVER (PARTITION BY band, key, salt
      |      ORDER BY doc_id) AS pv_id
      |  FROM banded
      |), links AS (
      |  SELECT doc_id, fp, mn_id AS lnk FROM linked WHERE mn_id IS NOT NULL
      |  UNION ALL
      |  SELECT doc_id, fp, pv_id FROM linked WHERE pv_id IS NOT NULL
      |)""".stripMargin
  }

  /** MULTIPROBE star-link CTEs (round 13): 4×16-bit blocks, each doc
    * emitting its exact block key plus all 16 one-bit flips (v = 0 is
    * the exact row), then the same per-bucket prefix-min + predecessor
    * linking. Restates `Dedup.multiprobeBandedRows` +
    * `starLinksFromBanded` verbatim — the Hamming-≤7-guaranteed,
    * 16-bit-selective layout the verified row runs on. */
  private val simhashMultiprobeLinkCtesSql: String =
    """, banded AS (
      |  SELECT f.doc_id, f.fp, f.len_bucket + off.o AS salt, b.band,
      |    xor((f.fp >> (b.band * 16)) & 65535,
      |        CASE WHEN v.v = 0 THEN 0 ELSE (1 << (v.v - 1)) END) AS key,
      |    (v.v = 0) AS exact
      |  FROM fpl f
      |  CROSS JOIN (SELECT unnest(range(0, 4)) AS band) b
      |  CROSS JOIN (SELECT unnest(range(0, 17)) AS v) v
      |  CROSS JOIN (SELECT unnest([0, 1]) AS o) off
      |), linked AS (
      |  SELECT doc_id, fp,
      |    MIN(doc_id) OVER (PARTITION BY band, key, salt
      |      ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS mn_id,
      |    lag(doc_id) OVER (PARTITION BY band, key, salt
      |      ORDER BY doc_id) AS pv_id
      |  FROM banded
      |), links AS (
      |  SELECT doc_id, fp, mn_id AS lnk FROM linked WHERE mn_id IS NOT NULL
      |  UNION ALL
      |  SELECT doc_id, fp, pv_id FROM linked WHERE pv_id IS NOT NULL
      |)""".stripMargin

  private val simhashStarOracle: String =
    simhashFpCtesSql + simhashStarLinkCtesSql(4) +
      """
        |SELECT DISTINCT l.lnk AS id_a, l.doc_id AS id_b,
        |  CAST(bit_count(xor(l.fp, f2.fp)) AS INT) AS hamming
        |FROM links l
        |JOIN fpl f2 ON f2.doc_id = l.lnk
        |WHERE bit_count(xor(l.fp, f2.fp)) <= 3""".stripMargin

  /** The star-first SURVIVOR frame shared by the production simhash
    * oracles (round 12): star links applied as keep-min collapse —
    * `star_drop` is every doc with a link within `collapseHamming`
    * (its `lnk` is always a smaller id), `surv` the remaining
    * fingerprint rows. Composes the exact mechanics
    * [[simhashStarOracle]] pins with the brute-force pair relations
    * the two rows restate over `surv`. */
  private def simhashSurvivorCtesSql(collapseHamming: Int): String =
    simhashFpCtesSql + simhashStarLinkCtesSql(4) +
      s""", star_drop AS (
         |  SELECT DISTINCT l.doc_id FROM links l
         |  JOIN fpl f2 ON f2.doc_id = l.lnk
         |  WHERE bit_count(xor(l.fp, f2.fp)) <= $collapseHamming
         |), surv AS (
         |  SELECT * FROM fpl
         |  WHERE doc_id NOT IN (SELECT doc_id FROM star_drop)
         |)""".stripMargin

  /** Hash-rank bottom-16 sample + exact quantile legs per source —
    * shared by the one-shot row (`text_sample_quantiles`) and the r15
    * persisted-merge lifecycle row (`text_sample_quantiles_merged`):
    * merged batch sketches equal the one-shot sketch (min-k of a set
    * union), so one twin adjudicates both. */
  private val sampleQuantilesOracle: String =
    """WITH n AS (
      |  SELECT source, doc_id,
      |    CAST(len(regexp_extract_all(text, '\S+')) AS DOUBLE) AS v,
      |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS h
      |  FROM documents
      |), r AS (
      |  SELECT source, v,
      |    row_number() OVER (PARTITION BY source ORDER BY h) AS rn
      |  FROM n
      |), qs AS (
      |  SELECT source, COUNT(*) AS n_sampled,
      |    ROUND(quantile_cont(v, 0.5), 6) AS p50_sample,
      |    ROUND(quantile_cont(v, 0.9), 6) AS p90_sample
      |  FROM r WHERE rn <= 16 GROUP BY 1
      |), qe AS (
      |  SELECT source, COUNT(*) AS n_rows,
      |    ROUND(quantile_cont(v, 0.5), 6) AS p50_exact,
      |    ROUND(quantile_cont(v, 0.9), 6) AS p90_exact
      |  FROM n GROUP BY 1
      |)
      |SELECT source, n_rows, n_sampled,
      |  p50_sample, p50_exact, p90_sample, p90_exact
      |FROM qe JOIN qs USING (source)""".stripMargin

  /** Weighted PageRank (GraphX staticPageRank semantics) with the 3
    * iterations UNROLLED as CTE pairs (mass, rank): each step's rank
    * vector is floor6-rounded before the next consumes it, so both
    * engines iterate on bit-identical doubles. Literals 0.15/0.85 are
    * spelled as decimal literals on both sides (their double
    * conversions agree; `1.0 - 0.85` would differ in the last ulp). */
  private val pageRankOracle: String = {
    val base =
      """WITH seq AS (
        |  SELECT event_type,
        |    lead(event_type) OVER (
        |      PARTITION BY user_id ORDER BY ts, event_id) AS next_type
        |  FROM events
        |), edges AS (
        |  SELECT event_type AS src, next_type AS dst, COUNT(*) AS n
        |  FROM seq WHERE next_type IS NOT NULL GROUP BY 1, 2
        |), outw AS (
        |  SELECT src, CAST(SUM(n) AS BIGINT) AS w_out FROM edges GROUP BY 1
        |), we AS (
        |  SELECT e.src, e.dst, e.n, o.w_out
        |  FROM edges e JOIN outw o USING (src)
        |), nodes AS (
        |  SELECT DISTINCT event_type AS node FROM events
        |), pr0 AS (
        |  SELECT node, CAST(1.0 AS DOUBLE) AS pr FROM nodes
        |)""".stripMargin
    val steps = (1 to 3).map { t =>
      s""", m$t AS (
         |  SELECT we.dst AS node, SUM(p.pr * we.n / we.w_out) AS mass
         |  FROM pr${t - 1} p JOIN we ON p.node = we.src GROUP BY 1
         |), pr$t AS (
         |  SELECT n.node,
         |    floor((0.15 + 0.85 * COALESCE(m.mass, 0.0)) * 1000000.0 + 0.5)
         |      / 1000000.0 AS pr
         |  FROM nodes n LEFT JOIN m$t m USING (node)
         |)""".stripMargin
    }.mkString
    val tail =
      """
        |SELECT p0.node AS event_type, p0.pr AS pr_0, p1.pr AS pr_1,
        |  p2.pr AS pr_2, p3.pr AS pr_3
        |FROM pr0 p0 JOIN pr1 p1 USING (node) JOIN pr2 p2 USING (node)
        |  JOIN pr3 p3 USING (node)""".stripMargin
    base + steps + tail
  }

  /** Count-Min sketch re-derived end-to-end: same tokenization as
    * text_tfidf_exact, the d=4 hash rows from the shared 60-bit md5
    * recipe ("i:term") mod w=128, counters by (depth, bucket) GROUP
    * BY, probes = top-20 exact terms, estimate = MIN over the 4
    * counters with absent cells reading 0. Shared VERBATIM by
    * text_count_min_merged: counter matrices add and group-sums of a
    * disjoint split equal the total sums, so the persist/merge
    * lifecycle must reproduce the one-shot build exactly. */
  private val countMinOracle: String =
    """WITH toks AS (
      |  SELECT list_filter(regexp_split_to_array(lower(text), '[^\p{L}\p{N}]+'),
      |                     t -> length(t) > 0) AS tokens
      |  FROM documents
      |), terms AS (
      |  SELECT unnest(tokens) AS term FROM toks
      |), exact AS (
      |  SELECT term, COUNT(*) AS n_exact FROM terms GROUP BY 1
      |), probes AS (
      |  SELECT term, n_exact FROM exact ORDER BY n_exact DESC, term LIMIT 20
      |), sk AS (
      |  SELECT r.d AS depth,
      |    ('0x' || substr(md5(CAST(r.d AS VARCHAR) || ':' || term), 1, 15))::BIGINT
      |      % 128 AS bucket,
      |    COUNT(*) AS cnt
      |  FROM terms CROSS JOIN (SELECT unnest(range(4)) AS d) r
      |  GROUP BY 1, 2
      |), pb AS (
      |  SELECT p.term, p.n_exact, r.d AS depth,
      |    ('0x' || substr(md5(CAST(r.d AS VARCHAR) || ':' || p.term), 1, 15))::BIGINT
      |      % 128 AS bucket
      |  FROM probes p CROSS JOIN (SELECT unnest(range(4)) AS d) r
      |)
      |SELECT pb.term, pb.n_exact,
      |  MIN(COALESCE(sk.cnt, 0)) AS cm_est,
      |  MIN(COALESCE(sk.cnt, 0)) - pb.n_exact AS overcount
      |FROM pb LEFT JOIN sk USING (depth, bucket)
      |GROUP BY 1, 2""".stripMargin

  /** JL ±1 sign projection 64→8 re-derived in SQL: signs from the
    * shared 60-bit md5 recipe on "i:j" (odd → +1), the same
    * unnest(range)+unnest(list) lockstep dims as the PQ oracle, sums
    * 6dp-rounded per the similarity-family float contract; l2_proj
    * folds the UNROUNDED projected coordinates like the Spark side. */
  private val randomProjectionOracle: String = {
    val projCols = (0 until 8).map(j =>
      s"  ROUND(MAX(CASE WHEN p.j = $j THEN p.y END), 6) AS proj_$j,")
      .mkString("\n")
    s"""WITH wf AS MATERIALIZED (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
       |  FROM embeddings WHERE len(embedding) = 64
       |), vals AS MATERIALIZED (
       |  SELECT vec_id, unnest(range(0, len(e))) AS i, unnest(e) AS x
       |  FROM wf
       |), signs AS (
       |  SELECT d.i, r.j,
       |    CASE WHEN ('0x' || substr(md5(CAST(d.i AS VARCHAR) || ':' ||
       |        CAST(r.j AS VARCHAR)), 1, 15))::BIGINT % 2 = 1
       |      THEN CAST(1.0 AS DOUBLE) ELSE CAST(-1.0 AS DOUBLE) END AS s
       |  FROM (SELECT DISTINCT i FROM vals) d
       |    CROSS JOIN (SELECT unnest(range(8)) AS j) r
       |), proj AS (
       |  SELECT v.vec_id, sg.j,
       |    SUM(v.x * sg.s) / sqrt(CAST(8.0 AS DOUBLE)) AS y
       |  FROM vals v JOIN signs sg USING (i) GROUP BY 1, 2
       |), norms AS (
       |  SELECT vec_id, sqrt(SUM(x * x)) AS l2o FROM vals GROUP BY 1
       |), pnorm AS (
       |  SELECT vec_id, sqrt(SUM(y * y)) AS l2p FROM proj GROUP BY 1
       |)
       |SELECT p.vec_id,
       |$projCols
       |  ROUND(MIN(n.l2o), 6) AS l2_orig,
       |  ROUND(MIN(q.l2p), 6) AS l2_proj
       |FROM proj p JOIN norms n USING (vec_id) JOIN pnorm q USING (vec_id)
       |GROUP BY 1""".stripMargin
  }

  /** The REGR_-family select tail over an `s` CTE carrying (group
    * col, n_rows BIGINT, n DOUBLE, sx, sy, sxy, sxx, syy) — every
    * formula spelled operand-for-operand like
    * [[graft.operators.Regression.linearFit]], degenerate variance
    * cases NULL via the same guards. */
  private def olsTailSql(groupCol: String): String =
    s"""SELECT $groupCol, n_rows,
       |  ROUND(CASE WHEN (n * sxx - sx * sx) > 0.0
       |    THEN (n * sxy - sx * sy) / (n * sxx - sx * sx) END, 6) AS slope,
       |  ROUND(CASE WHEN (n * sxx - sx * sx) > 0.0
       |    THEN (sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n
       |    END, 6) AS intercept,
       |  ROUND(CASE WHEN (n * sxx - sx * sx) > 0.0
       |      AND (n * syy - sy * sy) > 0.0
       |    THEN (n * sxy - sx * sy)
       |      / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)) END, 6) AS corr,
       |  ROUND(CASE WHEN (n * sxx - sx * sx) > 0.0
       |      AND (n * syy - sy * sy) > 0.0
       |    THEN ((n * sxy - sx * sy)
       |        / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)))
       |      * ((n * sxy - sx * sy)
       |        / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))) END, 6) AS r2
       |FROM s""".stripMargin

  /** The curation scoring chain (quality score + lang-id ratios +
    * argmax pick) re-derived in SQL — WITH d, s, scored — shared by
    * the llm_curate pipeline oracle and the r15 attrition-report
    * oracle so the stage definitions are stated exactly once. */
  private val curateScoredCtesSql: String =
    """WITH d AS (
        |  SELECT doc_id, text,
        |    regexp_extract_all(lower(text), '[\p{L}]+') AS words,
        |    GREATEST(length(text), 1) AS n_chars,
        |    CAST(GREATEST(len(regexp_extract_all(lower(text), '[\p{L}]+')), 1) AS DOUBLE) AS nw
        |  FROM documents
        |), s AS (
        |  SELECT doc_id, text,
        |    CAST(len(words) AS INT) AS n_words,
        |    CAST(len(list_filter(words, w -> list_contains(['the','of','and','to','in','is','that','it','was','for','on','are','with','as','this'], w))) AS DOUBLE) / nw AS stop_ratio,
        |    CAST(length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')) AS DOUBLE) / n_chars AS p_ratio,
        |    CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS DOUBLE) / n_chars AS d_ratio,
        |    CAST(len(list_filter(words, x -> list_contains(['the','of','and','to','in','is','that','it','was','for','on','are','with','as','this'], x))) AS DOUBLE) / nw AS s_en,
        |    CAST(len(list_filter(words, x -> list_contains(['der','die','das','und','ist','von','mit','den','nicht','ein','eine','auf','im','dem','zu'], x))) AS DOUBLE) / nw AS s_de,
        |    CAST(len(list_filter(words, x -> list_contains(['le','la','les','de','des','et','est','un','une','dans','que','pour','qui','au','pas'], x))) AS DOUBLE) / nw AS s_fr,
        |    CAST(len(list_filter(words, x -> list_contains(['el','la','los','las','de','que','y','en','un','una','es','por','con','para','no'], x))) AS DOUBLE) / nw AS s_es,
        |    CAST(len(list_filter(words, x -> list_contains(['il','la','di','che','e','un','una','per','non','sono','con','del','le','si','da'], x))) AS DOUBLE) / nw AS s_it
        |  FROM d
        |), scored AS (
        |  SELECT doc_id, text,
        |    LEAST(1.0, CAST(n_words AS DOUBLE) / 20.0) * LEAST(1.0, stop_ratio * 5.0)
        |      * (1.0 - LEAST(1.0, p_ratio * 3.0)) * (1.0 - LEAST(1.0, d_ratio * 3.0)) AS quality_score,
        |    list_reverse_sort([
        |      struct_pack(score := s_en, lang := 'en'),
        |      struct_pack(score := s_de, lang := 'de'),
        |      struct_pack(score := s_fr, lang := 'fr'),
        |      struct_pack(score := s_es, lang := 'es'),
        |      struct_pack(score := s_it, lang := 'it')])[1] AS b
        |  FROM s
        |)""".stripMargin

  /** The lang-id scoring chain (stopword-ratio scores + argmax +
    * the und rule) re-derived in SQL — WITH w, s, best — shared by
    * text_language and the r15 confusion-matrix row. */
  private val langIdCtesSql: String =
    """WITH w AS (
        |  SELECT doc_id, lang,
        |    regexp_extract_all(lower(text), '[\p{L}]+') AS words,
        |    CAST(GREATEST(len(regexp_extract_all(lower(text), '[\p{L}]+')), 1) AS DOUBLE) AS nw
        |  FROM documents
        |), s AS (
        |  SELECT doc_id, lang,
        |    CAST(len(list_filter(words, x -> list_contains(['the','of','and','to','in','is','that','it','was','for','on','are','with','as','this'], x))) AS DOUBLE) / nw AS s_en,
        |    CAST(len(list_filter(words, x -> list_contains(['der','die','das','und','ist','von','mit','den','nicht','ein','eine','auf','im','dem','zu'], x))) AS DOUBLE) / nw AS s_de,
        |    CAST(len(list_filter(words, x -> list_contains(['le','la','les','de','des','et','est','un','une','dans','que','pour','qui','au','pas'], x))) AS DOUBLE) / nw AS s_fr,
        |    CAST(len(list_filter(words, x -> list_contains(['el','la','los','las','de','que','y','en','un','una','es','por','con','para','no'], x))) AS DOUBLE) / nw AS s_es,
        |    CAST(len(list_filter(words, x -> list_contains(['il','la','di','che','e','un','una','per','non','sono','con','del','le','si','da'], x))) AS DOUBLE) / nw AS s_it
        |  FROM w
        |), best AS (
        |  SELECT doc_id, lang,
        |    list_reverse_sort([
        |      struct_pack(score := s_en, lang := 'en'),
        |      struct_pack(score := s_de, lang := 'de'),
        |      struct_pack(score := s_fr, lang := 'fr'),
        |      struct_pack(score := s_es, lang := 'es'),
        |      struct_pack(score := s_it, lang := 'it')])[1] AS b
        |  FROM s
        |)""".stripMargin

  /** MMR re-ranking unrolled: the similarity_topk candidate chain,
    * pairwise candidate sims (both 6dp like the Spark side), then
    * `select` greedy steps as CTE triples (max-sim vs the selection
    * so far, score, per-query argmax). Literals 0.7 / 0.3 are spelled
    * separately on both sides (the pageRank decimal-conversion
    * lesson). */
  private val mmrOracle: String = {
    val base =
      """WITH q AS (
        |  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS q_emb
        |  FROM embeddings WHERE vec_id < 10
        |), scoredc AS (
        |  SELECT q.query_id, c.vec_id AS neighbor_id,
        |    ROUND(list_cosine_similarity(q.q_emb, CAST(c.embedding AS DOUBLE[])), 6) AS cosine
        |  FROM q CROSS JOIN embeddings c
        |  WHERE c.vec_id <> q.query_id
        |), cand AS (
        |  SELECT query_id, neighbor_id, cosine FROM (
        |    SELECT *, row_number() OVER (
        |      PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rn
        |    FROM scoredc
        |  ) WHERE rn <= 10
        |), ps AS (
        |  SELECT ca.query_id, ca.neighbor_id AS a, cb.neighbor_id AS b,
        |    ROUND(list_cosine_similarity(CAST(ea.embedding AS DOUBLE[]),
        |      CAST(eb.embedding AS DOUBLE[])), 6) AS sim
        |  FROM cand ca JOIN cand cb ON ca.query_id = cb.query_id
        |    AND ca.neighbor_id <> cb.neighbor_id
        |  JOIN embeddings ea ON ea.vec_id = ca.neighbor_id
        |  JOIN embeddings eb ON eb.vec_id = cb.neighbor_id
        |), sel1 AS (
        |  SELECT query_id, neighbor_id, 1 AS mmr_rank,
        |    floor((0.7 * cosine - 0.3 * 0.0) * 1000000.0 + 0.5) / 1000000.0 AS mmr_score
        |  FROM (
        |    SELECT *, row_number() OVER (PARTITION BY query_id
        |      ORDER BY floor((0.7 * cosine - 0.3 * 0.0) * 1000000.0 + 0.5) / 1000000.0 DESC, neighbor_id
        |    ) AS rn FROM cand
        |  ) WHERE rn = 1
        |), prev1 AS (
        |  SELECT query_id, neighbor_id FROM sel1
        |)""".stripMargin
    val steps = (2 to 5).map { t =>
      s""", m$t AS (
         |  SELECT c.query_id, c.neighbor_id, c.cosine, MAX(p.sim) AS maxsim
         |  FROM cand c
         |  JOIN ps p ON p.query_id = c.query_id AND p.a = c.neighbor_id
         |  JOIN prev${t - 1} s ON s.query_id = p.query_id
         |    AND s.neighbor_id = p.b
         |  WHERE NOT EXISTS (SELECT 1 FROM prev${t - 1} x
         |    WHERE x.query_id = c.query_id
         |      AND x.neighbor_id = c.neighbor_id)
         |  GROUP BY 1, 2, 3
         |), sel$t AS (
         |  SELECT query_id, neighbor_id, $t AS mmr_rank, mmr_score FROM (
         |    SELECT query_id, neighbor_id,
         |      floor((0.7 * cosine - 0.3 * maxsim) * 1000000.0 + 0.5) / 1000000.0 AS mmr_score,
         |      row_number() OVER (PARTITION BY query_id
         |        ORDER BY floor((0.7 * cosine - 0.3 * maxsim) * 1000000.0 + 0.5) / 1000000.0 DESC,
         |          neighbor_id) AS rn
         |    FROM m$t
         |  ) WHERE rn = 1
         |), prev$t AS (
         |  SELECT query_id, neighbor_id FROM prev${t - 1}
         |  UNION ALL SELECT query_id, neighbor_id FROM sel$t
         |)""".stripMargin
    }.mkString
    val tail = "\n" + (1 to 5).map(t =>
      s"SELECT query_id, neighbor_id, mmr_rank, mmr_score FROM sel$t")
      .mkString("", "\nUNION ALL ", "")
    base + steps + tail
  }

  /** The dHash signature re-derived from the BMP fixture
    * CONSTRUCTION (the multimodal_bmp_stats recipe at 9×8): grayscale
    * = channel sum of the three text bytes at the nearest-neighbor
    * source pixel, one bit per adjacent comparison, row bytes packed
    * by `SUM(bit · (1 << x))`. Shared by the signature row and the
    * near-dup pairs row. */
  private val dhashRowsCtesSql: String = {
    def px(c: Int): String =
      "unicode(substr(padded, CAST(((h - 1 - ((y.yy * h) // 8)) * w + " +
        s"((x.xx * w) // 9)) * 3 + ${c + 1} AS INT), 1))"
    val dCols = (0 until 8).map(y =>
      s"    MAX(CASE WHEN gy = $y THEN d END) AS d$y").mkString(",\n")
    s"""WITH bmp AS (
       |  SELECT doc_id, CAST(n_chars % 7 + 2 AS INT) AS w,
       |    CAST(doc_id % 5 + 2 AS INT) AS h,
       |    rpad(text, 144, 'x') AS padded
       |  FROM documents
       |), gq AS (
       |  SELECT doc_id, w, h, y.yy AS gy, x.xx AS gx,
       |    ${px(0)}
       |  + ${px(1)}
       |  + ${px(2)} AS g
       |  FROM bmp
       |  CROSS JOIN (SELECT unnest(range(0, 8)) AS yy) y
       |  CROSS JOIN (SELECT unnest(range(0, 9)) AS xx) x
       |), bits AS (
       |  SELECT a.doc_id, a.gy, a.gx,
       |    CASE WHEN a.g < b.g THEN 1 ELSE 0 END AS bit
       |  FROM gq a JOIN gq b ON a.doc_id = b.doc_id AND a.gy = b.gy
       |    AND b.gx = a.gx + 1
       |  WHERE a.gx < 8
       |), drows AS (
       |  SELECT doc_id, gy, CAST(SUM(bit * (1 << gx)) AS INT) AS d
       |  FROM bits GROUP BY 1, 2
       |), hashes AS (
       |  SELECT doc_id,
       |$dCols
       |  FROM drows GROUP BY 1
       |)""".stripMargin
  }

  private val dhashOracle: String =
    dhashRowsCtesSql + """
      |SELECT b.doc_id, CAST(1 AS INT) AS is_bmp, b.w AS width,
      |  b.h AS height, h.d0, h.d1, h.d2, h.d3, h.d4, h.d5, h.d6, h.d7
      |FROM hashes h JOIN bmp b USING (doc_id)""".stripMargin

  private val dhashPairsCtesSql: String = {
    val ds = (0 until 8).map(y => s"d$y").mkString(", ")
    val bandV = (0 until 8).map(y => s"WHEN $y THEN d$y").mkString(" ")
    val ham = (for (y <- 0 until 8; bit <- 0 until 8) yield
      s"((xor(pa.d$y, pb.d$y) >> $bit) & 1)").mkString(" + ")
    // star-first like the Spark side: identical-hash members star to
    // their min-id keeper at hamming 0; only DISTINCT hashes (the
    // keepers) enter the band join
    dhashRowsCtesSql + s"""
      |, planted AS (
      |  SELECT doc_id, $ds FROM hashes
      |  UNION ALL
      |  SELECT doc_id + 3000000, $ds FROM hashes WHERE doc_id % 29 = 0
      |), keyed AS (
      |  SELECT doc_id, $ds,
      |    MIN(doc_id) OVER (PARTITION BY $ds) AS keeper
      |  FROM planted
      |), star AS (
      |  SELECT keeper AS id_a, doc_id AS id_b, 0 AS hamming
      |  FROM keyed WHERE doc_id <> keeper
      |), reps AS (
      |  SELECT doc_id, $ds FROM keyed WHERE doc_id = keeper
      |), bands AS (
      |  SELECT doc_id, b.i AS band, CASE b.i $bandV END AS v
      |  FROM reps CROSS JOIN (SELECT unnest(range(0, 8)) AS i) b
      |), cand AS (
      |  SELECT DISTINCT a.doc_id AS id_a, bb.doc_id AS id_b
      |  FROM bands a JOIN bands bb ON a.band = bb.band AND a.v = bb.v
      |    AND a.doc_id < bb.doc_id
      |), ham AS (
      |  SELECT c.id_a, c.id_b,
      |    $ham AS hamming
      |  FROM cand c JOIN reps pa ON pa.doc_id = c.id_a
      |    JOIN reps pb ON pb.doc_id = c.id_b
      |), phpairs AS (
      |  SELECT id_a, id_b, hamming FROM star
      |  UNION ALL
      |  SELECT id_a, id_b, hamming FROM ham WHERE hamming <= 2
      |)""".stripMargin
  }

  private val dhashPairsOracle: String =
    dhashPairsCtesSql + """
      |SELECT id_a, id_b, hamming FROM phpairs""".stripMargin

  /** Components over the star+near edge set: the dedup_components
    * recursive-closure recipe (min label over transitive reach) on
    * the image modality. */
  private val dhashClustersOracle: String =
    dhashPairsCtesSql.replaceFirst("WITH ", "WITH RECURSIVE ") + """
      |, sym AS (
      |  SELECT id_a AS src, id_b AS dst FROM phpairs
      |  UNION
      |  SELECT id_b AS src, id_a AS dst FROM phpairs
      |), reach AS (
      |  SELECT DISTINCT src AS id, src AS comp FROM sym
      |  UNION
      |  SELECT s.dst AS id, r.comp FROM reach r JOIN sym s ON s.src = r.id
      |)
      |SELECT id, min(comp) AS component FROM reach GROUP BY id""".stripMargin

  val all: Map[String, String] = Map(
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

    "dedup_exact" ->
      """SELECT doc_id, content_hash FROM (
        |  SELECT doc_id, content_hash,
        |    row_number() OVER (PARTITION BY content_hash ORDER BY doc_id) AS rn
        |  FROM (SELECT doc_id,
        |          sha256(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS content_hash
        |        FROM documents)
        |) WHERE rn = 1""".stripMargin,

    "dedup_exact_groups" ->
      """SELECT sha256(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS content_hash,
        |  min(doc_id) AS keep_id, count(*) AS group_size
        |FROM documents GROUP BY 1""".stripMargin,

    "dedup_incremental" ->
      """WITH hashed AS (
        |  SELECT doc_id,
        |    sha256(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS content_hash
        |  FROM documents
        |), hist AS (
        |  SELECT DISTINCT content_hash FROM hashed WHERE doc_id % 10 < 8
        |), batch AS (
        |  SELECT min(doc_id) AS doc_id, content_hash
        |  FROM hashed WHERE doc_id % 10 >= 8 GROUP BY content_hash
        |)
        |SELECT doc_id, content_hash FROM batch
        |WHERE content_hash NOT IN (SELECT content_hash FROM hist)""".stripMargin,

    // BRUTE-FORCE minhash oracles (pairs + incremental survivors): the
    // all-pairs 3-gram Jaccard ground truth the seeded LSH must find.
    // Exact at driver scale because banding recall is complete on this
    // fixture (checked; deterministic seed ⇒ stable across runs). The
    // jaccard value is a ratio of small exact ints — bit-identical
    // IEEE division on both engines, no rounding needed.
    // Star-first (r13): the keep-min drop set at the 0.95 collapse
    // threshold restricts the enumerated relation to collapse
    // survivors. Exact because the verified star links' drop set
    // equals the brute-force keep-min drop set on this fixture (zero
    // escapes — every near-identical group sits contiguously in its
    // shared buckets) and survivor-pair banding recall is complete.
    "dedup_minhash_pairs" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    list_filter(regexp_split_to_array(lower(text), '[^\p{L}\p{N}]+'),
        |                t -> length(t) > 0) AS tokens
        |  FROM documents
        |), sh AS (
        |  SELECT doc_id,
        |    list_distinct(CASE WHEN len(tokens) >= 3 THEN
        |      list_transform(range(1, len(tokens) - 1),
        |                     i -> concat_ws(' ', tokens[i], tokens[i+1], tokens[i+2]))
        |      ELSE tokens END) AS sh
        |  FROM toks WHERE len(tokens) > 0
        |), ap AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |    CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        |      / GREATEST(len(list_distinct(list_concat(a.sh, b.sh))), 1) AS jaccard
        |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |), drops AS (
        |  SELECT DISTINCT id_b FROM ap WHERE jaccard >= 0.95
        |)
        |SELECT id_a, id_b, jaccard FROM ap
        |WHERE jaccard >= 0.2
        |  AND id_a NOT IN (SELECT id_b FROM drops)
        |  AND id_b NOT IN (SELECT id_b FROM drops)""".stripMargin,

    // cluster-dedup oracle: the dedup_minhash_pairs edge set → UNION-
    // symmetrized recursive closure (min reachable id = component rep)
    // → drop every member that is not its component's min → the kept
    // document rows.
    "dedup_minhash_clusters" ->
      """WITH RECURSIVE toks AS (
        |  SELECT doc_id,
        |    list_filter(regexp_split_to_array(lower(text), '[^\p{L}\p{N}]+'),
        |                t -> length(t) > 0) AS tokens
        |  FROM documents
        |), sh AS (
        |  SELECT doc_id,
        |    list_distinct(CASE WHEN len(tokens) >= 3 THEN
        |      list_transform(range(1, len(tokens) - 1),
        |                     i -> concat_ws(' ', tokens[i], tokens[i+1], tokens[i+2]))
        |      ELSE tokens END) AS sh
        |  FROM toks WHERE len(tokens) > 0
        |), edges AS (
        |  SELECT id_a, id_b FROM (
        |    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |      CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        |        / GREATEST(len(list_distinct(list_concat(a.sh, b.sh))), 1)
        |        AS jaccard
        |    FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |  ) WHERE jaccard >= 0.2
        |), sym AS (
        |  SELECT id_a AS src, id_b AS dst FROM edges
        |  UNION
        |  SELECT id_b AS src, id_a AS dst FROM edges
        |), reach AS (
        |  SELECT DISTINCT src AS id, src AS comp FROM sym
        |  UNION
        |  SELECT s.dst AS id, r.comp FROM reach r JOIN sym s ON s.src = r.id
        |), losers AS (
        |  SELECT id FROM reach GROUP BY id HAVING id <> MIN(comp)
        |)
        |SELECT doc_id, lang, source, n_chars FROM documents
        |WHERE doc_id NOT IN (SELECT id FROM losers)""".stripMargin,

    // keep-best variant: identical edges + closure; losers = cluster
    // members that are NOT the (n_chars DESC, id ASC) winner of their
    // component.
    "dedup_minhash_clusters_best" ->
      """WITH RECURSIVE toks AS (
        |  SELECT doc_id,
        |    list_filter(regexp_split_to_array(lower(text), '[^\p{L}\p{N}]+'),
        |                t -> length(t) > 0) AS tokens
        |  FROM documents
        |), sh AS (
        |  SELECT doc_id,
        |    list_distinct(CASE WHEN len(tokens) >= 3 THEN
        |      list_transform(range(1, len(tokens) - 1),
        |                     i -> concat_ws(' ', tokens[i], tokens[i+1], tokens[i+2]))
        |      ELSE tokens END) AS sh
        |  FROM toks WHERE len(tokens) > 0
        |), edges AS (
        |  SELECT id_a, id_b FROM (
        |    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |      CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        |        / GREATEST(len(list_distinct(list_concat(a.sh, b.sh))), 1)
        |        AS jaccard
        |    FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |  ) WHERE jaccard >= 0.2
        |), sym AS (
        |  SELECT id_a AS src, id_b AS dst FROM edges
        |  UNION
        |  SELECT id_b AS src, id_a AS dst FROM edges
        |), reach AS (
        |  SELECT DISTINCT src AS id, src AS comp FROM sym
        |  UNION
        |  SELECT s.dst AS id, r.comp FROM reach r JOIN sym s ON s.src = r.id
        |), comps AS (
        |  SELECT id, MIN(comp) AS component FROM reach GROUP BY id
        |), losers AS (
        |  SELECT id FROM (
        |    SELECT c.id, row_number() OVER (
        |      PARTITION BY c.component
        |      ORDER BY d.n_chars DESC, c.id) AS rk
        |    FROM comps c JOIN documents d ON d.doc_id = c.id
        |  ) WHERE rk <> 1
        |)
        |SELECT doc_id, lang, source, n_chars FROM documents
        |WHERE doc_id NOT IN (SELECT id FROM losers)""".stripMargin,

    // FULL-FIDELITY simhash oracle: re-implements Spark's pipeline in
    // pure SQL — XXH64(token, seed 42) via HUGEINT mod-2^64 arithmetic
    // (split 32-bit multiplies keep every product inside INT128), the
    // Charikar bit-vote, the len_bucket +/-1 banding contract, and
    // bit_count(xor) Hamming <= 3. An independent second implementation,
    // not a text-similarity proxy: two of the 17 fixture pairs are
    // COINCIDENTAL fingerprint collisions (3-gram jaccard 0.0) that no
    // similarity threshold could reproduce. Byte access assumes the
    // fixture's ASCII-only text (unicode(ch) == byte; validated, and
    // the XXH64 short path covers the <32-byte fixture tokens).
    // Star-first production shape (round 12): the full-fidelity
    // fingerprint + star-link mechanics (shared CTE prefix with
    // dedup_simhash_star) feed the keep-min drop set, then the pair
    // relation is brute-forced over the SURVIVORS — exact by the same
    // pigeonhole/salt argument as before, now composed with the
    // collapse. The raw-corpus pair relation stays pinned by
    // dedup_simhash_star's oracle (same fingerprints, same banding)
    // and by DedupSpec's un-benched ground-truth comparison.
    "dedup_simhash_pairs" -> (simhashSurvivorCtesSql(2) +
      """
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  CAST(bit_count(xor(a.fp, b.fp)) AS INT) AS hamming
        |FROM surv a JOIN surv b
        |  ON a.doc_id < b.doc_id
        |  AND abs(a.len_bucket - b.len_bucket) <= 1
        |  AND bit_count(xor(a.fp, b.fp)) <= 3""".stripMargin),
    "dedup_simhash_star" -> simhashStarOracle,

    // Same ground truth at the 0.5 threshold for the simhash-candidate
    // verified path (r13 shape): MULTIPROBE star links at the full
    // enumeration threshold (4×16-bit blocks + 1-bit probes, Hamming
    // ≤ 6), each link verified at Jaccard ≥ 0.5 before it can drop
    // anyone. Output = the verified links themselves (the relation's
    // replica mass, linear) UNION the pair relation brute-forced over
    // the collapse survivors. Exact because the multiprobe link
    // mechanics are restated verbatim and survivor-pair recall is
    // complete on the fixture (multiprobe guarantees Hamming ≤ 7 >
    // the 6 cutoff; worst len-bucket delta 1 vs ±1 salt — restricting
    // to a survivor subset preserves the margin).
    "dedup_simhash_verified" -> (simhashFpCtesSql +
      simhashMultiprobeLinkCtesSql +
      """, vtoks AS (
        |  SELECT doc_id,
        |    list_filter(regexp_split_to_array(lower(text), '[^\p{L}\p{N}]+'),
        |                t -> length(t) > 0) AS tokens
        |  FROM documents
        |), vsh AS (
        |  SELECT doc_id,
        |    list_distinct(CASE WHEN len(tokens) >= 3 THEN
        |      list_transform(range(1, len(tokens) - 1),
        |                     i -> concat_ws(' ', tokens[i], tokens[i+1], tokens[i+2]))
        |      ELSE tokens END) AS sh
        |  FROM vtoks WHERE len(tokens) > 0
        |), vlinks AS (
        |  SELECT DISTINCT l.lnk AS id_a, l.doc_id AS id_b,
        |    CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
        |      / GREATEST(len(list_distinct(list_concat(sa.sh, sb.sh))), 1)
        |      AS jaccard
        |  FROM links l
        |  JOIN fpl f2 ON f2.doc_id = l.lnk
        |  JOIN vsh sa ON sa.doc_id = l.lnk
        |  JOIN vsh sb ON sb.doc_id = l.doc_id
        |  WHERE bit_count(xor(l.fp, f2.fp)) <= 6
        |), vlinks_ok AS (
        |  SELECT * FROM vlinks WHERE jaccard >= 0.5
        |), star_drop AS (
        |  SELECT DISTINCT id_b AS doc_id FROM vlinks_ok
        |)
        |SELECT id_a, id_b, jaccard FROM vlinks_ok
        |UNION
        |SELECT id_a, id_b, jaccard FROM (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |    CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        |      / GREATEST(len(list_distinct(list_concat(a.sh, b.sh))), 1) AS jaccard
        |  FROM vsh a JOIN vsh b ON a.doc_id < b.doc_id
        |  WHERE a.doc_id NOT IN (SELECT doc_id FROM star_drop)
        |    AND b.doc_id NOT IN (SELECT doc_id FROM star_drop)
        |) WHERE jaccard >= 0.5""".stripMargin),

    // Streaming near-dedup oracle (round 13): brute-force keep-min
    // survivors at Jaccard >= 0.95 — exact because the stream's
    // verified star-link drop set equals the brute-force keep-min drop
    // set on this fixture (zero escapes, the dedup_minhash_pairs
    // collapse precedent at the same banding knobs and threshold).
    "stream_dedup_near" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    list_filter(regexp_split_to_array(lower(text), '[^\p{L}\p{N}]+'),
        |                t -> length(t) > 0) AS tokens
        |  FROM documents
        |), sh AS (
        |  SELECT doc_id,
        |    list_distinct(CASE WHEN len(tokens) >= 3 THEN
        |      list_transform(range(1, len(tokens) - 1),
        |                     i -> concat_ws(' ', tokens[i], tokens[i+1], tokens[i+2]))
        |      ELSE tokens END) AS sh
        |  FROM toks WHERE len(tokens) > 0
        |), drops AS (
        |  SELECT DISTINCT b.doc_id FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |  WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        |        / GREATEST(len(list_distinct(list_concat(a.sh, b.sh))), 1)
        |        >= 0.95
        |)
        |SELECT doc_id, lang, source, n_chars FROM documents
        |WHERE doc_id NOT IN (SELECT doc_id FROM drops)""".stripMargin,

    "dedup_minhash_incremental" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    list_filter(regexp_split_to_array(lower(text), '[^\p{L}\p{N}]+'),
        |                t -> length(t) > 0) AS tokens
        |  FROM documents
        |), sh AS (
        |  SELECT doc_id,
        |    list_distinct(CASE WHEN len(tokens) >= 3 THEN
        |      list_transform(range(1, len(tokens) - 1),
        |                     i -> concat_ws(' ', tokens[i], tokens[i+1], tokens[i+2]))
        |      ELSE tokens END) AS sh
        |  FROM toks WHERE len(tokens) > 0
        |), pairs AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |  WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        |        / GREATEST(len(list_distinct(list_concat(a.sh, b.sh))), 1) >= 0.5
        |), batch AS (SELECT doc_id FROM documents WHERE doc_id % 10 >= 8),
        |losers AS (
        |  SELECT id_b AS doc_id FROM pairs
        |  WHERE id_b IN (SELECT doc_id FROM batch)
        |  UNION
        |  SELECT id_a FROM pairs
        |  WHERE id_b NOT IN (SELECT doc_id FROM batch)
        |    AND id_a IN (SELECT doc_id FROM batch)
        |)
        |SELECT doc_id FROM batch
        |WHERE doc_id NOT IN (SELECT doc_id FROM losers)""".stripMargin,

    // RegexTokenizer(lowercase, gaps on [^\p{L}\p{N}]+, minTokenLength 1)
    // = regexp_split_to_array(lower) + empty filter; NGram(3) = space-
    // joined triples; tiny-doc fallback keeps single tokens.
    "dedup_ngram_jaccard" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    list_filter(regexp_split_to_array(lower(text), '[^\p{L}\p{N}]+'),
        |                t -> length(t) > 0) AS tokens
        |  FROM documents
        |), sh AS (
        |  SELECT doc_id,
        |    list_distinct(CASE WHEN len(tokens) >= 3 THEN
        |      list_transform(range(1, len(tokens) - 1),
        |                     i -> concat_ws(' ', tokens[i], tokens[i+1], tokens[i+2]))
        |      ELSE tokens END) AS sh
        |  FROM toks WHERE len(tokens) > 0
        |)
        |SELECT p.id_a, p.id_b,
        |  ROUND(CASE WHEN len(list_distinct(list_concat(a.sh, b.sh))) = 0 THEN 0.0
        |    ELSE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        |         / len(list_distinct(list_concat(a.sh, b.sh))) END, 6) AS jaccard
        |FROM (SELECT doc_id AS id_a, doc_id + 1 AS id_b FROM documents) p
        |JOIN sh a ON a.doc_id = p.id_a
        |JOIN sh b ON b.doc_id = p.id_b""".stripMargin,

    // connected-components oracle: the edge set reuses the proven
    // dedup_ngram_jaccard arithmetic (UNROUNDED jaccard at the filter —
    // the ratio of small integers is exact on both engines); the
    // min-label fixpoint is recursive undirected reachability + min.
    // The VALUES CTE replicates the Spark side's planted 3-doc chain
    // verbatim (consecutive jaccard 3/5).
    "dedup_components" ->
      """WITH RECURSIVE docs2 AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT CAST(v.doc_id AS BIGINT), v.text FROM (VALUES
        |    (2000000, 'alpha beta gamma delta epsilon zeta'),
        |    (2000001, 'alpha beta gamma delta epsilon eta'),
        |    (2000002, 'alpha beta gamma delta epsilon theta'))
        |    v(doc_id, text)
        |), toks AS (
        |  SELECT doc_id,
        |    list_filter(regexp_split_to_array(lower(text), '[^\p{L}\p{N}]+'),
        |                t -> length(t) > 0) AS tokens
        |  FROM docs2
        |), sh AS (
        |  SELECT doc_id,
        |    list_distinct(CASE WHEN len(tokens) >= 3 THEN
        |      list_transform(range(1, len(tokens) - 1),
        |                     i -> concat_ws(' ', tokens[i], tokens[i+1], tokens[i+2]))
        |      ELSE tokens END) AS sh
        |  FROM toks WHERE len(tokens) > 0
        |), edges AS (
        |  SELECT p.id_a, p.id_b
        |  FROM (SELECT doc_id AS id_a, doc_id + 1 AS id_b FROM docs2) p
        |  JOIN sh a ON a.doc_id = p.id_a
        |  JOIN sh b ON b.doc_id = p.id_b
        |  WHERE CASE WHEN len(list_distinct(list_concat(a.sh, b.sh))) = 0 THEN 0.0
        |    ELSE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        |         / len(list_distinct(list_concat(a.sh, b.sh))) END >= 0.5
        |), sym AS (
        |  SELECT id_a AS src, id_b AS dst FROM edges
        |  UNION
        |  SELECT id_b AS src, id_a AS dst FROM edges
        |), reach AS (
        |  SELECT DISTINCT src AS id, src AS comp FROM sym
        |  UNION
        |  SELECT s.dst AS id, r.comp FROM reach r JOIN sym s ON s.src = r.id
        |)
        |SELECT id, min(comp) AS component FROM reach GROUP BY id""".stripMargin,

    // BRUTE-FORCE embedding oracles: all-pairs cosine ground truth the
    // seeded sign-LSH must find (miss probability ~1e-8 per ≥0.99 pair
    // at 4×12-bit tables; deterministic seed ⇒ stable). Planted CTEs
    // replicate the Spark side's in-flight vectors bit-for-bit (same
    // IEEE literals, same single-op arithmetic); thresholds sit far
    // from every pair's cosine, so engine summation-order ulps cannot
    // flip a classification.
    "dedup_embedding_pairs" ->
      """WITH base AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
        |  UNION ALL
        |  SELECT CAST(900000 AS BIGINT), list_prepend(e[1] + 1e-4, e[2:])
        |  FROM (SELECT CAST(embedding AS DOUBLE[]) AS e
        |        FROM embeddings WHERE vec_id = 0)
        |)
        |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |  ROUND(list_cosine_similarity(a.e, b.e), 6) AS cosine
        |FROM base a JOIN base b ON a.vec_id < b.vec_id
        |WHERE list_cosine_similarity(a.e, b.e) >= 0.99""".stripMargin,

    "dedup_embedding_incremental" ->
      """WITH base AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
        |), hist AS (SELECT vec_id, e FROM base WHERE vec_id % 10 < 8),
        |batch AS (
        |  SELECT vec_id, e FROM base WHERE vec_id % 10 >= 8
        |  UNION ALL
        |  SELECT CAST(900001 AS BIGINT), list_prepend(e[1] + 1e-4, e[2:])
        |  FROM hist WHERE vec_id = 0
        |  UNION ALL
        |  SELECT CAST(900002 AS BIGINT), list_transform(e, x -> -x)
        |  FROM hist WHERE vec_id = 5
        |  UNION ALL
        |  SELECT CAST(900003 AS BIGINT),
        |    list_prepend(-e[1] + 1e-4, list_transform(e[2:], x -> -x))
        |  FROM hist WHERE vec_id = 5
        |), cross_losers AS (
        |  SELECT DISTINCT b.vec_id FROM batch b JOIN hist h
        |  ON list_cosine_similarity(b.e, h.e) >= 0.99
        |), within_losers AS (
        |  SELECT DISTINCT y.vec_id FROM batch x JOIN batch y
        |  ON x.vec_id < y.vec_id AND list_cosine_similarity(x.e, y.e) >= 0.99
        |)
        |SELECT vec_id FROM batch
        |WHERE vec_id NOT IN (SELECT vec_id FROM cross_losers)
        |  AND vec_id NOT IN (SELECT vec_id FROM within_losers)""".stripMargin,

    // SemDeDup oracle: the hash-init assignment chain (same draw rule
    // and multiplier as similarity_ivf's twin, over the corpus PLUS
    // the planted near-copy) followed by in-cell pair cosines at 6dp
    // and the keep-smallest-id flag — the whole semantic-dedup
    // pipeline re-derived in SQL.
    "dedup_semantic" ->
      """WITH wf AS MATERIALIZED (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
        |  FROM embeddings WHERE len(embedding) = 64
        |  UNION ALL
        |  SELECT CAST(900000 AS BIGINT), list_prepend(e[1] + 1e-4, e[2:])
        |  FROM (SELECT CAST(embedding AS DOUBLE[]) AS e
        |        FROM embeddings WHERE vec_id = 0)
        |), vals AS MATERIALIZED (
        |  SELECT vec_id, unnest(range(0, len(e))) AS i, unnest(e) AS x
        |  FROM wf
        |), norms AS MATERIALIZED (
        |  SELECT vec_id, sqrt(SUM(x * x)) AS nrm FROM vals GROUP BY 1
        |), ivf_rows AS (
        |  SELECT vec_id, e, row_number() OVER (
        |    ORDER BY (vec_id % 1048573) * 2246822519 % 1048573, vec_id
        |  ) - 1 AS cell
        |  FROM wf WHERE len(list_filter(e, x -> x IS NULL)) = 0
        |  QUALIFY cell < (SELECT CAST(CEIL(COUNT(*) / 32.0) AS BIGINT)
        |                  FROM wf)
        |), centv AS (
        |  SELECT cell, unnest(range(0, len(e))) AS i, unnest(e) AS v
        |  FROM ivf_rows
        |), cent AS MATERIALIZED (
        |  SELECT cell, i,
        |    v / sqrt(SUM(v * v) OVER (PARTITION BY cell)) AS cv
        |  FROM centv
        |), centnorm AS (
        |  SELECT cell, sqrt(SUM(cv * cv)) AS cnrm FROM cent GROUP BY 1
        |), rowdot AS (
        |  SELECT v.vec_id, c.cell, SUM(v.x * c.cv) AS dot
        |  FROM vals v JOIN cent c USING (i)
        |  GROUP BY 1, 2
        |), rowcos AS (
        |  SELECT d.vec_id, d.cell,
        |    CASE WHEN n.nrm > 0 THEN d.dot / (n.nrm * cn.cnrm)
        |      ELSE -1 END AS cos
        |  FROM rowdot d
        |  JOIN norms n ON n.vec_id = d.vec_id
        |  JOIN centnorm cn USING (cell)
        |), assign AS (
        |  SELECT vec_id, cell FROM rowcos
        |  QUALIFY row_number() OVER (
        |    PARTITION BY vec_id ORDER BY cos DESC, cell DESC) = 1
        |), paircos AS (
        |  SELECT a.vec_id, ROUND(CASE WHEN na.nrm > 0 AND nb.nrm > 0
        |      THEN SUM(va.x * vb.x) / (na.nrm * nb.nrm)
        |      ELSE -1 END, 6) AS cos
        |  FROM assign a
        |  JOIN assign b ON a.cell = b.cell AND b.vec_id < a.vec_id
        |  JOIN vals va ON va.vec_id = a.vec_id
        |  JOIN vals vb ON vb.vec_id = b.vec_id AND vb.i = va.i
        |  JOIN norms na ON na.vec_id = a.vec_id
        |  JOIN norms nb ON nb.vec_id = b.vec_id
        |  GROUP BY a.vec_id, b.vec_id, na.nrm, nb.nrm, a.cell
        |), best AS (
        |  SELECT vec_id, MAX(cos) AS max_cos FROM paircos GROUP BY 1
        |)
        |SELECT a.vec_id, CAST(a.cell AS INT) AS cell, b.max_cos,
        |  CASE WHEN b.max_cos >= 0.8 THEN 1 ELSE 0 END AS is_dup
        |FROM assign a LEFT JOIN best b USING (vec_id)""".stripMargin,

    // mixture-sampling oracle: the md5-bucket thresholds are the same
    // plan literals the Scala side computes (0.5→'8000', 0.25→'4000',
    // 0.1→'199a'; 1.0→'g' which sorts above every hex char); md5 hex
    // parity across engines is already proven by dedup_exact's sha256.
    "llm_mix_corpus" ->
      """SELECT doc_id, source FROM documents
        |WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) <
        |  CASE source WHEN 'src0' THEN 'g' WHEN 'src1' THEN '8000'
        |              WHEN 'src2' THEN '4000' WHEN 'src3' THEN '199a'
        |  END""".stripMargin,

    // snapshot diff (r15): both sides' fingerprints re-derived with
    // the same planted refresh arithmetic; chr(1) == the Scala side's
    // U+0001 separator, and both engines' concat_ws skips NULLs, so
    // the md5s agree byte-for-byte. concat_ws never returns NULL ⇒ a
    // NULL fingerprint marks a full-outer join miss, exactly like the
    // Spark side.
    "llm_snapshot_diff" ->
      """WITH prev AS (
        |  SELECT doc_id,
        |    md5(concat_ws(chr(1), CAST(text AS VARCHAR),
        |                  CAST(source AS VARCHAR))) AS fp
        |  FROM documents
        |), curr AS (
        |  SELECT doc_id,
        |    md5(concat_ws(chr(1),
        |      CASE WHEN doc_id % 13 = 0 THEN text || ' v2' ELSE text END,
        |      CAST(source AS VARCHAR))) AS fp
        |  FROM documents WHERE doc_id % 17 <> 0
        |  UNION ALL
        |  SELECT doc_id + 900000,
        |    md5(concat_ws(chr(1), CAST(text AS VARCHAR),
        |                  CAST(source AS VARCHAR)))
        |  FROM documents WHERE doc_id % 23 = 0
        |)
        |SELECT COALESCE(p.doc_id, c.doc_id) AS doc_id,
        |  CASE WHEN p.fp IS NULL THEN 'added'
        |       WHEN c.fp IS NULL THEN 'removed'
        |       WHEN p.fp = c.fp THEN 'unchanged'
        |       ELSE 'changed' END AS status
        |FROM prev p FULL OUTER JOIN curr c ON p.doc_id = c.doc_id""".stripMargin,

    // token-budget mix (r15): the inclusive per-source running token
    // total in md5-hash-rank order, filtered by the same literal
    // budgets the Scala side bakes in. Integer token counts sum
    // exactly, so the running totals — and the kept prefix — are
    // bit-identical across engines. SUM(BIGINT) is HUGEINT in this
    // dialect: cast back so the dtype matches Spark's long.
    "llm_token_budget_mix" ->
      """WITH t AS (
        |  SELECT doc_id, source,
        |    CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens,
        |    md5(CAST(doc_id AS VARCHAR)) AS shuffle_key
        |  FROM documents
        |  WHERE source IN ('src0', 'src1', 'src5', 'src7')
        |), r AS (
        |  SELECT doc_id, source, n_tokens,
        |    CAST(SUM(n_tokens) OVER (
        |      PARTITION BY source ORDER BY shuffle_key, doc_id
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS tokens_through
        |  FROM t
        |)
        |SELECT doc_id, source, n_tokens, tokens_through
        |FROM r
        |WHERE tokens_through <= CASE source
        |  WHEN 'src0' THEN 800 WHEN 'src1' THEN 1200
        |  WHEN 'src5' THEN 100000 ELSE 0 END""".stripMargin,

    // contrastive-pairs oracle: planted-chain edges via the
    // dedup_components shingle/Jaccard restatement, then the full
    // negative-sampler chain — md5 doc buckets, salted target bucket,
    // md5(anchor|cand) pair rank, both-orientation exclusion,
    // row_number ≤ 2 (INT-cast to match Spark's row_number type).
    "llm_contrastive_pairs" ->
      """WITH docs2 AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT CAST(v.doc_id AS BIGINT), v.text FROM (VALUES
        |    (2000000, 'alpha beta gamma delta epsilon zeta'),
        |    (2000001, 'alpha beta gamma delta epsilon eta'),
        |    (2000002, 'alpha beta gamma delta epsilon theta'))
        |    v(doc_id, text)
        |), toks AS (
        |  SELECT doc_id,
        |    list_filter(regexp_split_to_array(lower(text), '[^\p{L}\p{N}]+'),
        |                t -> length(t) > 0) AS tokens
        |  FROM docs2
        |), sh AS (
        |  SELECT doc_id,
        |    list_distinct(CASE WHEN len(tokens) >= 3 THEN
        |      list_transform(range(1, len(tokens) - 1),
        |                     i -> concat_ws(' ', tokens[i], tokens[i+1], tokens[i+2]))
        |      ELSE tokens END) AS sh
        |  FROM toks WHERE len(tokens) > 0
        |), edges AS (
        |  SELECT p.id_a, p.id_b
        |  FROM (SELECT doc_id AS id_a, doc_id + 1 AS id_b FROM docs2) p
        |  JOIN sh a ON a.doc_id = p.id_a
        |  JOIN sh b ON b.doc_id = p.id_b
        |  WHERE CASE WHEN len(list_distinct(list_concat(a.sh, b.sh))) = 0 THEN 0.0
        |    ELSE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        |         / len(list_distinct(list_concat(a.sh, b.sh))) END >= 0.5
        |), bkt AS (
        |  SELECT doc_id AS neg_id,
        |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
        |      % 16 AS b
        |  FROM docs2
        |), tgt AS (
        |  SELECT DISTINCT id_a AS anchor_id,
        |    ('0x' || substr(md5(CAST(id_a AS VARCHAR) || '#neg'), 1, 15))
        |      ::BIGINT % 16 AS tb
        |  FROM edges
        |), exclb AS (
        |  SELECT id_a, id_b FROM edges
        |  UNION SELECT id_b, id_a FROM edges
        |), ranked AS (
        |  SELECT anchor_id, neg_id,
        |    CAST(row_number() OVER (PARTITION BY anchor_id
        |      ORDER BY rk, neg_id) AS INT) AS neg_rank
        |  FROM (
        |    SELECT t.anchor_id, c.neg_id,
        |      ('0x' || substr(md5(CAST(t.anchor_id AS VARCHAR) || '|' ||
        |        CAST(c.neg_id AS VARCHAR)), 1, 15))::BIGINT AS rk
        |    FROM tgt t JOIN bkt c ON c.b = t.tb
        |    WHERE c.neg_id != t.anchor_id
        |      AND NOT EXISTS (SELECT 1 FROM exclb e
        |        WHERE e.id_a = t.anchor_id AND e.id_b = c.neg_id))
        |)
        |SELECT e.id_a AS anchor_id, e.id_b AS pos_id,
        |  r.neg_id, r.neg_rank
        |FROM edges e JOIN ranked r ON r.anchor_id = e.id_a
        |WHERE r.neg_rank <= 2""".stripMargin,

    // up-sampling oracle: the same per-source factor CASE, expanded by
    // range/unnest — a factor-0 source yields an empty range and drops.
    "llm_upsample" ->
      """SELECT doc_id, source,
        |  CAST(unnest(range(0,
        |    CASE source WHEN 'src1' THEN 2 WHEN 'src2' THEN 3
        |                WHEN 'src3' THEN 0 ELSE 1 END)) AS INT)
        |    AS copy_idx
        |FROM documents""".stripMargin,

    // temperature-mix oracle: derived skewed domain → per-domain
    // counts → (n_min/n)^(1−α) → round(f · 65536) hex threshold (the
    // mixCorpus quantization, 'g' for f ≥ 1 since 'g' sorts above
    // every hex char) → md5 filter. Same arithmetic order as Scala —
    // including the exponent: Scala computes pow(x, 1.0 - 0.7) and
    // 1.0 - 0.7 = 0.30000000000000004 in IEEE double, NOT the literal
    // 0.3, so the SQL spells the exponent as (1.0 - 0.7) to hand both
    // engines the bit-identical second argument (round-11 ADVICE).
    "llm_temperature_mix" ->
      """WITH docs2 AS (
        |  SELECT doc_id, lang, n_chars,
        |    CASE WHEN doc_id % 8 < 5 THEN 'web'
        |         WHEN doc_id % 8 < 7 THEN 'books'
        |         ELSE 'code' END AS domain
        |  FROM documents
        |), counts AS (
        |  SELECT domain, COUNT(*) AS n FROM docs2 GROUP BY 1
        |), mn AS (
        |  SELECT MIN(n) AS nmin FROM counts
        |), thr AS (
        |  SELECT domain,
        |    CASE WHEN pow(CAST(mn.nmin AS DOUBLE) / n, 1.0 - 0.7) >= 1.0
        |      THEN 'g'
        |      ELSE printf('%04x', LEAST(65535,
        |        CAST(round(pow(CAST(mn.nmin AS DOUBLE) / n, 1.0 - 0.7)
        |          * 65536) AS BIGINT))) END AS t
        |  FROM counts, mn
        |)
        |SELECT d.doc_id, d.domain, d.lang, d.n_chars
        |FROM docs2 d JOIN thr USING (domain)
        |WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < thr.t""".stripMargin,

    // quota oracle: the proven text_quality score arithmetic + a
    // row_number over (source, 6dp-rounded score desc, id) — rounding
    // BEFORE ranking keeps the sort key identical across engines.
    "llm_source_quota" ->
      """WITH raw AS (
        |  SELECT doc_id, source, text,
        |    regexp_extract_all(lower(text), '[\p{L}]+') AS words,
        |    GREATEST(length(text), 1) AS n_chars
        |  FROM documents
        |), d AS (
        |  SELECT doc_id, source,
        |    CAST(len(words) AS INT) AS n_words,
        |    CAST(len(list_filter(words, w -> list_contains(
        |      ['the','of','and','to','in','is','that','it','was','for','on','are','with','as','this'], w))) AS DOUBLE)
        |      / GREATEST(len(words), 1) AS stop_ratio,
        |    CAST(length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')) AS DOUBLE) / n_chars AS p_ratio,
        |    CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS DOUBLE) / n_chars AS d_ratio
        |  FROM raw
        |), q AS (
        |  SELECT doc_id, source,
        |    ROUND(
        |      LEAST(1.0, CAST(n_words AS DOUBLE) / 20.0)
        |      * LEAST(1.0, stop_ratio * 5.0)
        |      * (1.0 - LEAST(1.0, p_ratio * 3.0))
        |      * (1.0 - LEAST(1.0, d_ratio * 3.0)), 6) AS quality_score
        |  FROM d
        |)
        |SELECT doc_id, source, quality_score,
        |  CAST(quota_rank AS INT) AS quota_rank
        |FROM (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY source
        |    ORDER BY quality_score DESC, doc_id) AS quota_rank
        |  FROM q)
        |WHERE quota_rank <= 5""".stripMargin,

    // decontamination oracle: tokenize/8-gram parity with the proven
    // dedup_ngram_jaccard pattern; the planted-copy CTE replicates the
    // Spark side's in-flight contamination verbatim.
    "llm_decontaminate" ->
      """WITH base AS (SELECT doc_id, text FROM documents),
        |bench AS (SELECT doc_id, text FROM base WHERE doc_id % 41 = 0),
        |train AS (
        |  SELECT doc_id, text FROM base WHERE doc_id % 41 <> 0
        |  UNION ALL
        |  SELECT doc_id + 1000000,
        |         concat('zz planted contamination prefix ', text)
        |  FROM bench
        |), ttoks AS (
        |  SELECT doc_id,
        |    list_filter(regexp_split_to_array(lower(text), '[^\p{L}\p{N}]+'),
        |                t -> length(t) > 0) AS tokens
        |  FROM train
        |), tgrams AS (
        |  SELECT doc_id, unnest(list_distinct(
        |    CASE WHEN len(tokens) >= 8 THEN
        |      list_transform(range(1, len(tokens) - 6),
        |        i -> concat_ws(' ', tokens[i], tokens[i+1], tokens[i+2],
        |                       tokens[i+3], tokens[i+4], tokens[i+5],
        |                       tokens[i+6], tokens[i+7]))
        |    ELSE [concat_ws(' ', tokens)] END)) AS g
        |  FROM ttoks WHERE len(tokens) > 0
        |), btoks AS (
        |  SELECT doc_id,
        |    list_filter(regexp_split_to_array(lower(text), '[^\p{L}\p{N}]+'),
        |                t -> length(t) > 0) AS tokens
        |  FROM bench
        |), bgrams AS (
        |  SELECT DISTINCT unnest(
        |    CASE WHEN len(tokens) >= 8 THEN
        |      list_transform(range(1, len(tokens) - 6),
        |        i -> concat_ws(' ', tokens[i], tokens[i+1], tokens[i+2],
        |                       tokens[i+3], tokens[i+4], tokens[i+5],
        |                       tokens[i+6], tokens[i+7]))
        |    ELSE [concat_ws(' ', tokens)] END) AS g
        |  FROM btoks WHERE len(tokens) > 0
        |)
        |SELECT t.doc_id, count(*) AS shared_ngrams
        |FROM tgrams t JOIN bgrams b ON t.g = b.g
        |GROUP BY t.doc_id""".stripMargin,

    // keep-side oracle: the llm_decontaminate CTE with the final select
    // flipped to NOT IN — every train doc whose doc_id is absent from
    // the contaminated set survives.
    // near-decontamination oracle: brute-force cross-corpus shingle
    // Jaccard (same 3-gram/fallback shingling as dedup_minhash_pairs)
    // at 0.5 over the prefix-mangled planted fixture, NOT IN keep side.
    "llm_decontaminate_near" ->
      """WITH base AS (SELECT doc_id, text FROM documents),
        |bench AS (SELECT doc_id, text FROM base WHERE doc_id % 41 = 0),
        |train AS (
        |  SELECT doc_id, text FROM base WHERE doc_id % 41 <> 0
        |  UNION ALL
        |  SELECT doc_id + 1000000 AS doc_id,
        |    'zz planted near copy ' || text AS text FROM bench
        |), tt AS (
        |  SELECT doc_id,
        |    list_filter(regexp_split_to_array(lower(text), '[^\p{L}\p{N}]+'),
        |                t -> length(t) > 0) AS tokens
        |  FROM train
        |), bt AS (
        |  SELECT doc_id,
        |    list_filter(regexp_split_to_array(lower(text), '[^\p{L}\p{N}]+'),
        |                t -> length(t) > 0) AS tokens
        |  FROM bench
        |), sht AS (
        |  SELECT doc_id,
        |    list_distinct(CASE WHEN len(tokens) >= 3 THEN
        |      list_transform(range(1, len(tokens) - 1),
        |                     i -> concat_ws(' ', tokens[i], tokens[i+1], tokens[i+2]))
        |      ELSE tokens END) AS sh
        |  FROM tt WHERE len(tokens) > 0
        |), shb AS (
        |  SELECT doc_id,
        |    list_distinct(CASE WHEN len(tokens) >= 3 THEN
        |      list_transform(range(1, len(tokens) - 1),
        |                     i -> concat_ws(' ', tokens[i], tokens[i+1], tokens[i+2]))
        |      ELSE tokens END) AS sh
        |  FROM bt WHERE len(tokens) > 0
        |), hits AS (
        |  SELECT DISTINCT t.doc_id
        |  FROM sht t, shb b
        |  WHERE CAST(len(list_intersect(t.sh, b.sh)) AS DOUBLE)
        |    / GREATEST(len(t.sh) + len(b.sh)
        |        - len(list_intersect(t.sh, b.sh)), 1) >= 0.5
        |)
        |SELECT doc_id FROM train
        |WHERE doc_id NOT IN (SELECT doc_id FROM hits)""".stripMargin,

    "llm_decontaminate_kept" ->
      """WITH base AS (SELECT doc_id, text FROM documents),
        |bench AS (SELECT doc_id, text FROM base WHERE doc_id % 41 = 0),
        |train AS (
        |  SELECT doc_id, text FROM base WHERE doc_id % 41 <> 0
        |  UNION ALL
        |  SELECT doc_id + 1000000,
        |         concat('zz planted contamination prefix ', text)
        |  FROM bench
        |), ttoks AS (
        |  SELECT doc_id,
        |    list_filter(regexp_split_to_array(lower(text), '[^\p{L}\p{N}]+'),
        |                t -> length(t) > 0) AS tokens
        |  FROM train
        |), tgrams AS (
        |  SELECT doc_id, unnest(list_distinct(
        |    CASE WHEN len(tokens) >= 8 THEN
        |      list_transform(range(1, len(tokens) - 6),
        |        i -> concat_ws(' ', tokens[i], tokens[i+1], tokens[i+2],
        |                       tokens[i+3], tokens[i+4], tokens[i+5],
        |                       tokens[i+6], tokens[i+7]))
        |    ELSE [concat_ws(' ', tokens)] END)) AS g
        |  FROM ttoks WHERE len(tokens) > 0
        |), btoks AS (
        |  SELECT doc_id,
        |    list_filter(regexp_split_to_array(lower(text), '[^\p{L}\p{N}]+'),
        |                t -> length(t) > 0) AS tokens
        |  FROM bench
        |), bgrams AS (
        |  SELECT DISTINCT unnest(
        |    CASE WHEN len(tokens) >= 8 THEN
        |      list_transform(range(1, len(tokens) - 6),
        |        i -> concat_ws(' ', tokens[i], tokens[i+1], tokens[i+2],
        |                       tokens[i+3], tokens[i+4], tokens[i+5],
        |                       tokens[i+6], tokens[i+7]))
        |    ELSE [concat_ws(' ', tokens)] END) AS g
        |  FROM btoks WHERE len(tokens) > 0
        |), contaminated AS (
        |  SELECT DISTINCT t.doc_id FROM tgrams t JOIN bgrams b ON t.g = b.g
        |)
        |SELECT doc_id FROM train
        |WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)""".stripMargin,

    // bit-identical to the exact kept-side (bloom FPs re-verified), so
    // the oracle is the same NOT IN query
    "llm_decontaminate_bloom" ->
      """WITH base AS (SELECT doc_id, text FROM documents),
        |bench AS (SELECT doc_id, text FROM base WHERE doc_id % 41 = 0),
        |train AS (
        |  SELECT doc_id, text FROM base WHERE doc_id % 41 <> 0
        |  UNION ALL
        |  SELECT doc_id + 1000000,
        |         concat('zz planted contamination prefix ', text)
        |  FROM bench
        |), ttoks AS (
        |  SELECT doc_id,
        |    list_filter(regexp_split_to_array(lower(text), '[^\p{L}\p{N}]+'),
        |                t -> length(t) > 0) AS tokens
        |  FROM train
        |), tgrams AS (
        |  SELECT doc_id, unnest(list_distinct(
        |    CASE WHEN len(tokens) >= 8 THEN
        |      list_transform(range(1, len(tokens) - 6),
        |        i -> concat_ws(' ', tokens[i], tokens[i+1], tokens[i+2],
        |                       tokens[i+3], tokens[i+4], tokens[i+5],
        |                       tokens[i+6], tokens[i+7]))
        |    ELSE [concat_ws(' ', tokens)] END)) AS g
        |  FROM ttoks WHERE len(tokens) > 0
        |), btoks AS (
        |  SELECT doc_id,
        |    list_filter(regexp_split_to_array(lower(text), '[^\p{L}\p{N}]+'),
        |                t -> length(t) > 0) AS tokens
        |  FROM bench
        |), bgrams AS (
        |  SELECT DISTINCT unnest(
        |    CASE WHEN len(tokens) >= 8 THEN
        |      list_transform(range(1, len(tokens) - 6),
        |        i -> concat_ws(' ', tokens[i], tokens[i+1], tokens[i+2],
        |                       tokens[i+3], tokens[i+4], tokens[i+5],
        |                       tokens[i+6], tokens[i+7]))
        |    ELSE [concat_ws(' ', tokens)] END) AS g
        |  FROM btoks WHERE len(tokens) > 0
        |), contaminated AS (
        |  SELECT DISTINCT t.doc_id FROM tgrams t JOIN bgrams b ON t.g = b.g
        |)
        |SELECT doc_id FROM train
        |WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)""".stripMargin,

    // composed curation oracle: mirrors the proven text_quality,
    // text_language, and dedup_exact pieces stage by stage.
    "llm_curate" ->
      (curateScoredCtesSql + """
        |, kept AS (
        |  SELECT doc_id, text, quality_score,
        |    CASE WHEN b.score >= 0.05 THEN b.lang ELSE 'und' END AS lang_pred
        |  FROM scored
        |  WHERE quality_score >= 0.1
        |), hashed AS (
        |  SELECT doc_id, lang_pred, quality_score,
        |    sha256(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS content_hash
        |  FROM kept WHERE lang_pred = 'en'
        |)
        |SELECT doc_id, lang_pred, ROUND(quality_score, 6) AS quality_score, content_hash
        |FROM (SELECT *, row_number() OVER (PARTITION BY content_hash ORDER BY doc_id) AS rn
        |      FROM hashed)
        |WHERE rn = 1""".stripMargin),

    // The attrition report rides the SAME scoring chain (shared CTE
    // prefix), so the stage definitions cannot drift from llm_curate:
    // sequential-funnel conditional counts + a distinct-hash count,
    // three stage rows unioned out of one stats row.
    "llm_attrition_report" ->
      (curateScoredCtesSql + """
        |, flags AS (
        |  SELECT quality_score >= 0.1 AS q_ok,
        |    (CASE WHEN b.score >= 0.05 THEN b.lang ELSE 'und' END) = 'en'
        |      AS l_ok,
        |    sha256(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS h
        |  FROM scored
        |), stats AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_total,
        |    CAST(COUNT(*) FILTER (WHERE NOT q_ok) AS BIGINT) AS q_drop,
        |    CAST(COUNT(*) FILTER (WHERE q_ok AND NOT l_ok) AS BIGINT)
        |      AS l_drop,
        |    CAST(COUNT(*) FILTER (WHERE q_ok AND l_ok) AS BIGINT) AS n_pre,
        |    CAST(COUNT(DISTINCT CASE WHEN q_ok AND l_ok THEN h END)
        |      AS BIGINT) AS n_groups
        |  FROM flags
        |), stages AS (
        |  SELECT 1 AS stage_idx, 'quality' AS stage,
        |    n_total AS n_in, q_drop AS n_dropped FROM stats
        |  UNION ALL SELECT 2, 'language', n_total - q_drop, l_drop FROM stats
        |  UNION ALL SELECT 3, 'exact_dedup', n_pre, n_pre - n_groups
        |    FROM stats
        |)
        |SELECT stage_idx, stage, n_in, n_dropped,
        |  n_in - n_dropped AS n_out,
        |  ROUND(CAST(n_dropped AS DOUBLE) / CAST(n_in AS DOUBLE), 6)
        |    AS drop_share
        |FROM stages""".stripMargin),

    // Per-doc trigram novelty: distinct (doc, gram), gram df, share
    // with corpus df = 1. Same WordNgrams tokenization as the
    // heavy-hitters family; docs under 3 words have no grams and no
    // row in either engine.
    "text_gram_novelty" ->
      """WITH toks AS (
        |  SELECT doc_id, regexp_extract_all(lower(text), '[\p{L}\p{N}]+') AS w
        |  FROM documents
        |), g AS (
        |  SELECT DISTINCT doc_id,
        |    ('0x' || substr(md5(gram), 1, 15))::BIGINT AS gh
        |  FROM (
        |    SELECT doc_id, unnest(list_transform(range(1, len(w) - 1),
        |      i -> w[i] || ' ' || w[i + 1] || ' ' || w[i + 2])) AS gram
        |    FROM toks WHERE len(w) >= 3)
        |), dfg AS (
        |  SELECT gh, COUNT(*) AS df_grams FROM g GROUP BY 1
        |)
        |SELECT g.doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
        |  CAST(COUNT(*) FILTER (WHERE dfg.df_grams = 1) AS BIGINT) AS n_novel,
        |  ROUND(CAST(COUNT(*) FILTER (WHERE dfg.df_grams = 1) AS DOUBLE)
        |    / CAST(COUNT(*) AS DOUBLE), 6) AS novelty
        |FROM g JOIN dfg USING (gh)
        |GROUP BY 1""".stripMargin,

    "text_token_stats" ->
      """SELECT doc_id,
        |  CAST(length(text) AS INT) AS n_chars_calc,
        |  CAST(len(regexp_extract_all(text, '\S+')) AS INT) AS ws_token_count,
        |  CAST(len(regexp_extract_all(text, '[\p{L}]+|[\p{N}]+|[^\p{L}\p{N}\s]')) AS INT) AS bpe_token_count
        |FROM documents""".stripMargin,

    "text_normalize" ->
      """SELECT doc_id,
        |  trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS norm_text
        |FROM documents""".stripMargin,

    "text_quality" ->
      """WITH raw AS (
        |  SELECT doc_id, text,
        |    regexp_extract_all(lower(text), '[\p{L}]+') AS words,
        |    GREATEST(length(text), 1) AS n_chars
        |  FROM documents
        |), d AS (
        |  SELECT doc_id,
        |    CAST(len(words) AS INT) AS n_words,
        |    GREATEST(len(words), 1) AS nw,
        |    length(regexp_replace(lower(text), '[^\p{L}]', '', 'g')) AS n_letters,
        |    CAST(len(list_filter(words, w -> list_contains(
        |      ['the','of','and','to','in','is','that','it','was','for','on','are','with','as','this'], w))) AS DOUBLE)
        |      / GREATEST(len(words), 1) AS stop_ratio,
        |    CAST(length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')) AS DOUBLE) / n_chars AS p_ratio,
        |    CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS DOUBLE) / n_chars AS d_ratio,
        |    CAST(length(text) - length(regexp_replace(text, '[A-Z]', '', 'g')) AS DOUBLE) / n_chars AS u_ratio
        |  FROM raw
        |)
        |SELECT doc_id, n_words,
        |  ROUND(CAST(n_letters AS DOUBLE) / nw, 6) AS mean_word_len,
        |  ROUND(stop_ratio, 6) AS stopword_ratio,
        |  ROUND(p_ratio, 6) AS punct_ratio,
        |  ROUND(d_ratio, 6) AS digit_ratio,
        |  ROUND(u_ratio, 6) AS upper_ratio,
        |  ROUND(
        |    LEAST(1.0, CAST(n_words AS DOUBLE) / 20.0)
        |    * LEAST(1.0, stop_ratio * 5.0)
        |    * (1.0 - LEAST(1.0, p_ratio * 3.0))
        |    * (1.0 - LEAST(1.0, d_ratio * 3.0)), 6) AS quality_score
        |FROM d""".stripMargin,

    "text_entropy" ->
      """SELECT doc_id, ROUND(ent, 6) AS char_entropy FROM (
        |  SELECT doc_id, entropy(c) AS ent FROM (
        |    SELECT doc_id, unnest(regexp_extract_all(text, '[\s\S]')) AS c
        |    FROM documents)
        |  GROUP BY doc_id)""".stripMargin,

    "text_source_profile" ->
      """WITH raw AS (
        |  SELECT source, lang, text,
        |    regexp_extract_all(lower(text), '[\p{L}]+') AS words,
        |    GREATEST(length(text), 1) AS n_chars
        |  FROM documents
        |), q AS (
        |  SELECT source, lang,
        |    COALESCE(ROUND(
        |      LEAST(1.0, CAST(len(words) AS DOUBLE) / 20.0)
        |      * LEAST(1.0, (CAST(len(list_filter(words, w -> list_contains(
        |          ['the','of','and','to','in','is','that','it','was','for','on','are','with','as','this'], w))) AS DOUBLE)
        |          / GREATEST(len(words), 1)) * 5.0)
        |      * (1.0 - LEAST(1.0, (CAST(length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')) AS DOUBLE) / n_chars) * 3.0))
        |      * (1.0 - LEAST(1.0, (CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS DOUBLE) / n_chars) * 3.0)), 6), 0.0) AS q
        |  FROM raw
        |)
        |SELECT source, COUNT(*) AS n_docs,
        |  CAST(COUNT(DISTINCT lang) AS INT) AS n_langs,
        |  ROUND(AVG(q), 6) AS avg_quality,
        |  ROUND(AVG(CASE WHEN q < 0.1 THEN 1.0 ELSE 0.0 END), 6) AS junk_share
        |FROM q GROUP BY 1""".stripMargin,

    // argmax over (score, lang) structs: list_reverse_sort = Spark's
    // sort_array(desc) — both compare score first, tie-break lang desc.
    "text_language" ->
      (langIdCtesSql + """
        |SELECT doc_id, lang,
        |  CASE WHEN b.score >= 0.05 THEN b.lang ELSE 'und' END AS lang_pred
        |FROM best""".stripMargin),

    // Confusion matrix over the same chain: per (label, predicted)
    // counts + within-label share (the window total is the tiny
    // |langs|^2 frame).
    "text_language_confusion" ->
      (langIdCtesSql + """
        |, pred AS (
        |  SELECT lang,
        |    CASE WHEN b.score >= 0.05 THEN b.lang ELSE 'und' END AS lang_pred
        |  FROM best
        |)
        |SELECT lang, lang_pred, CAST(COUNT(*) AS BIGINT) AS n,
        |  ROUND(CAST(COUNT(*) AS DOUBLE)
        |    / CAST(SUM(COUNT(*)) OVER (PARTITION BY lang) AS DOUBLE), 6)
        |    AS share
        |FROM pred GROUP BY 1, 2""".stripMargin),

    // Gopher repetition twin: per-doc top gram via unnest+count+
    // row_number (count desc, gram asc = the Spark fold's first-max-
    // in-sorted-order tie-break); fractions are exact-int ratios.
    "text_repetition" ->
      """WITH toks AS (
        |  SELECT doc_id, text,
        |    list_filter(regexp_split_to_array(lower(text), '[^\p{L}\p{N}]+'),
        |                t -> length(t) > 0) AS tokens
        |  FROM documents
        |), g AS (
        |  SELECT doc_id, text,
        |    CASE WHEN len(tokens) >= 2 THEN
        |      list_transform(range(1, len(tokens)),
        |                     i -> concat_ws(' ', tokens[i], tokens[i+1]))
        |    ELSE CAST([] AS VARCHAR[]) END AS grams
        |  FROM toks
        |), top AS (
        |  SELECT doc_id, gram, cnt FROM (
        |    SELECT doc_id, gram, count(*) AS cnt,
        |      row_number() OVER (PARTITION BY doc_id
        |                         ORDER BY count(*) DESC, gram) AS rn
        |    FROM (SELECT doc_id, unnest(grams) AS gram FROM g)
        |    GROUP BY doc_id, gram
        |  ) WHERE rn = 1
        |)
        |SELECT g.doc_id,
        |  CAST(len(grams) AS INT) AS ngram_total,
        |  CAST(len(list_distinct(grams)) AS INT) AS ngram_distinct,
        |  ROUND(CASE WHEN len(grams) = 0 THEN 0.0
        |    ELSE 1.0 - CAST(len(list_distinct(grams)) AS DOUBLE) / len(grams)
        |  END, 6) AS dup_ngram_frac,
        |  COALESCE(top.gram, '') AS top_ngram,
        |  CAST(COALESCE(top.cnt, 0) AS INT) AS top_ngram_count,
        |  ROUND(CASE WHEN len(grams) = 0 THEN 0.0
        |    ELSE CAST(COALESCE(top.cnt, 0) * length(COALESCE(top.gram, ''))
        |              AS DOUBLE) / GREATEST(length(g.text), 1)
        |  END, 6) AS top_ngram_char_frac
        |FROM g LEFT JOIN top ON g.doc_id = top.doc_id""".stripMargin,

    // PII twins: identical lookaround-free regexes run under RE2 here
    // and Java there (greedy char-class patterns are leftmost-identical
    // in both); the planted fixture rows use the same literals.
    "text_pii" ->
      """WITH base AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 2000000,
        |    text || ' mail alice.smith@example.com call +49-151-1234-5678 host 192.168.10.42 ssn 123-45-6789'
        |  FROM documents WHERE doc_id < 3
        |)
        |SELECT doc_id, n_emails, n_phones, n_ipv4, n_ids,
        |  CASE WHEN n_emails + n_phones + n_ipv4 + n_ids > 0
        |       THEN 1 ELSE 0 END AS has_pii
        |FROM (
        |  SELECT doc_id,
        |    CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INT) AS n_emails,
        |    CAST(len(regexp_extract_all(text, '\+[0-9][0-9\-]{7,}[0-9]')) AS INT) AS n_phones,
        |    CAST(len(regexp_extract_all(text, '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}')) AS INT) AS n_ipv4,
        |    CAST(len(regexp_extract_all(text, '[0-9]{3}-[0-9]{2}-[0-9]{4}')) AS INT) AS n_ids
        |  FROM base
        |)""".stripMargin,

    "text_redact" ->
      """WITH base AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 2000000,
        |    text || ' mail alice.smith@example.com call +49-151-1234-5678 host 192.168.10.42 ssn 123-45-6789'
        |  FROM documents WHERE doc_id < 3
        |)
        |SELECT doc_id,
        |  regexp_replace(regexp_replace(regexp_replace(regexp_replace(text,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
        |    '\+[0-9][0-9\-]{7,}[0-9]', '[PHONE]', 'g'),
        |    '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}', '[IP]', 'g'),
        |    '[0-9]{3}-[0-9]{2}-[0-9]{4}', '[ID]', 'g') AS redacted
        |FROM base""".stripMargin,

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
    "text_bm25_write" -> bm25WriteOracle,

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

    "multimodal_profile" ->
      """SELECT d.doc_id, d.lang, d.source,
        |  CAST(length(d.text) AS INT) AS n_chars_calc,
        |  CAST(len(regexp_extract_all(d.text, '\S+')) AS INT) AS ws_token_count,
        |  CAST(len(regexp_extract_all(d.text, '[\p{L}]+|[\p{N}]+|[^\p{L}\p{N}\s]')) AS INT) AS bpe_token_count,
        |  e.label,
        |  CAST(len(e.embedding) AS INT) AS emb_dim,
        |  ROUND(sqrt(list_sum(list_transform(CAST(e.embedding AS DOUBLE[]), x -> x * x))), 6) AS emb_norm
        |FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id""".stripMargin,

    "multimodal_binary_stats" ->
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS INT) AS byte_len,
        |  md5(text) AS content_md5
        |FROM documents""".stripMargin,

    // byte slicing via the hex string (2 chars/byte): frame i covers
    // bytes [i*stride, i*stride+16) with stride = floor(len/4) bytes,
    // exactly Spark's substring-on-binary offsets.
    "multimodal_frame_sample" ->
      """WITH b AS (
        |  SELECT doc_id, hex(encode(text)) AS h,
        |    GREATEST(octet_length(encode(text)) // 4, 1) AS stride
        |  FROM documents
        |)
        |SELECT doc_id,
        |  substring(h, 0 * stride * 2 + 1, 32) AS frame_0,
        |  substring(h, 1 * stride * 2 + 1, 32) AS frame_1,
        |  substring(h, 2 * stride * 2 + 1, 32) AS frame_2,
        |  substring(h, 3 * stride * 2 + 1, 32) AS frame_3
        |FROM b""".stripMargin,

    // nearest-neighbor twin: same integer index formula, char-based
    // substr/rpad semantics identical across engines on the ASCII
    // fixture (p: x = p%8, y = p//8; src = (y*8//4)*16 + x*16//8).
    "multimodal_resize" ->
      """WITH r AS (
        |  SELECT doc_id, rpad(substr(text, 1, 128), 128, 'x') AS raster
        |  FROM documents
        |)
        |SELECT doc_id,
        |  array_to_string(list_transform(range(0, 32),
        |    p -> substr(raster,
        |      ((p // 8) * 8 // 4) * 16 + ((p % 8) * 16 // 8) + 1, 1)),
        |    '') AS resized
        |FROM r""".stripMargin,

    "multimodal_payload_meta" ->
      """WITH b AS (
        |  SELECT doc_id, encode(text) AS payload,
        |    substring(hex(encode(text)), 1, 8) AS head_hex
        |  FROM documents
        |)
        |SELECT doc_id, head_hex,
        |  CASE WHEN starts_with(head_hex, '89504E47') THEN 'image/png'
        |       WHEN starts_with(head_hex, 'FFD8FF') THEN 'image/jpeg'
        |       WHEN starts_with(head_hex, '52494646') THEN 'audio/wav'
        |       ELSE 'application/octet-stream' END AS mime,
        |  CAST(octet_length(payload) AS INT) AS bytes
        |FROM b""".stripMargin,

    // The oracle recomputes the PLANTED values from the source columns
    // (mediaFixture's arithmetic), never touching bytes — the Spark
    // side must recover the same numbers by parsing the headers it
    // built, so agreement proves the byte-level decode.
    "multimodal_decode" ->
      """WITH m AS (
        |  SELECT doc_id,
        |    CAST(doc_id % 4 AS INT) AS kind,
        |    CAST(doc_id % 797 + 1 AS INT) AS w,
        |    CAST(n_chars % 613 + 1 AS INT) AS h,
        |    CAST(doc_id % 5 AS INT) AS m5
        |  FROM documents)
        |SELECT doc_id,
        |  CASE kind WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg'
        |    WHEN 2 THEN 'wav' ELSE 'unknown' END AS format,
        |  CAST(CASE WHEN kind IN (0, 1) THEN w END AS INT) AS width,
        |  CAST(CASE WHEN kind IN (0, 1) THEN h END AS INT) AS height,
        |  CAST(CASE WHEN kind IN (0, 1) THEN 8
        |    WHEN kind = 2 THEN 16 END AS INT) AS bit_depth,
        |  CAST(CASE
        |    WHEN kind = 0 THEN
        |      CASE m5 WHEN 0 THEN 1 WHEN 1 THEN 3 WHEN 2 THEN 1
        |        WHEN 3 THEN 2 ELSE 4 END
        |    WHEN kind = 1 THEN CASE WHEN doc_id % 8 = 1 THEN 1 ELSE 3 END
        |    WHEN kind = 2 THEN CASE WHEN doc_id % 16 = 2 THEN 1 ELSE 2 END
        |  END AS INT) AS channels
        |FROM m""".stripMargin,

    // PPM pixel-path oracle (round 12): recompute the 4×4 thumbnail
    // channel stats from the fixture CONSTRUCTION — geometry from
    // (doc_id, n_chars), pixel bytes from the ASCII text (unicode(ch)
    // == byte, the pinned charset) padded with 'x', thumbnail source
    // index ⌊y·h/4⌋·w + ⌊x·w/4⌋, channel byte at src·3 + c. The Spark
    // side reads geometry and bytes from the ACTUAL payload, so the
    // hash proves the header parse and byte-offset arithmetic.
    "multimodal_ppm_stats" ->
      """WITH ppm AS (
        |  SELECT doc_id,
        |    CAST(doc_id % 7 + 2 AS INT) AS w,
        |    CAST(n_chars % 5 + 2 AS INT) AS h,
        |    rpad(text, 144, 'x') AS padded
        |  FROM documents
        |), pix AS (
        |  SELECT doc_id, w, h, c.cc,
        |    unicode(substr(padded,
        |      CAST((((y.yy * h) // 4) * w + ((x.xx * w) // 4)) * 3
        |        + c.cc + 1 AS INT), 1)) AS v
        |  FROM ppm
        |  CROSS JOIN (SELECT unnest(range(0, 4)) AS yy) y
        |  CROSS JOIN (SELECT unnest(range(0, 4)) AS xx) x
        |  CROSS JOIN (SELECT unnest(range(0, 3)) AS cc) c
        |)
        |SELECT doc_id, CAST(1 AS INT) AS is_ppm, w AS width, h AS height,
        |  ROUND(AVG(CASE WHEN cc = 0 THEN v END), 6) AS r_mean,
        |  CAST(MIN(CASE WHEN cc = 0 THEN v END) AS INT) AS r_min,
        |  CAST(MAX(CASE WHEN cc = 0 THEN v END) AS INT) AS r_max,
        |  ROUND(AVG(CASE WHEN cc = 1 THEN v END), 6) AS g_mean,
        |  CAST(MIN(CASE WHEN cc = 1 THEN v END) AS INT) AS g_min,
        |  CAST(MAX(CASE WHEN cc = 1 THEN v END) AS INT) AS g_max,
        |  ROUND(AVG(CASE WHEN cc = 2 THEN v END), 6) AS b_mean,
        |  CAST(MIN(CASE WHEN cc = 2 THEN v END) AS INT) AS b_min,
        |  CAST(MAX(CASE WHEN cc = 2 THEN v END) AS INT) AS b_max
        |FROM pix GROUP BY doc_id, w, h""".stripMargin,

    // BMP pixel-path oracle (round 13): recompute the 4×4 thumbnail
    // stats from the fixture CONSTRUCTION — geometry from (n_chars,
    // doc_id), and the bottom-up + BGR layout folded into the TEXT
    // index formula: image pixel (sx, sy) file-channel fc lives at
    // text byte ((h−1−sy)·w + sx)·3 + fc (file row h−1−sy carries
    // text slice h−1−sy). Output r/g/b = file channels 2/1/0. The
    // Spark side reads LE header fields, data offset, stride and flip
    // from the ACTUAL bytes — two independent paths to one answer.
    "multimodal_phash" -> dhashOracle,
    "multimodal_phash_pairs" -> dhashPairsOracle,
    "multimodal_phash_clusters" -> dhashClustersOracle,

    // Trailing 1-hour RANGE frame on the integer epoch-µs key — both
    // engines share RANGE peer semantics on an exact key, so frames
    // are identical; COUNT exact, value sum 6dp.
    "events_rolling_window" ->
      """SELECT event_id, event_type, epoch_us(ts) AS t,
        |  COUNT(*) OVER w AS n_window,
        |  ROUND(SUM(value) OVER w, 6) AS sum_window
        |FROM events
        |WINDOW w AS (PARTITION BY event_type ORDER BY epoch_us(ts)
        |  RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)""".stripMargin,

    "multimodal_bmp_stats" ->
      """WITH bmp AS (
        |  SELECT doc_id,
        |    CAST(n_chars % 7 + 2 AS INT) AS w,
        |    CAST(doc_id % 5 + 2 AS INT) AS h,
        |    rpad(text, 144, 'x') AS padded
        |  FROM documents
        |), pix AS (
        |  SELECT doc_id, w, h, c.fc,
        |    unicode(substr(padded,
        |      CAST(((h - 1 - ((y.yy * h) // 4)) * w + ((x.xx * w) // 4)) * 3
        |        + c.fc + 1 AS INT), 1)) AS v
        |  FROM bmp
        |  CROSS JOIN (SELECT unnest(range(0, 4)) AS yy) y
        |  CROSS JOIN (SELECT unnest(range(0, 4)) AS xx) x
        |  CROSS JOIN (SELECT unnest(range(0, 3)) AS fc) c
        |)
        |SELECT doc_id, CAST(1 AS INT) AS is_bmp, w AS width, h AS height,
        |  ROUND(AVG(CASE WHEN fc = 2 THEN v END), 6) AS r_mean,
        |  CAST(MIN(CASE WHEN fc = 2 THEN v END) AS INT) AS r_min,
        |  CAST(MAX(CASE WHEN fc = 2 THEN v END) AS INT) AS r_max,
        |  ROUND(AVG(CASE WHEN fc = 1 THEN v END), 6) AS g_mean,
        |  CAST(MIN(CASE WHEN fc = 1 THEN v END) AS INT) AS g_min,
        |  CAST(MAX(CASE WHEN fc = 1 THEN v END) AS INT) AS g_max,
        |  ROUND(AVG(CASE WHEN fc = 0 THEN v END), 6) AS b_mean,
        |  CAST(MIN(CASE WHEN fc = 0 THEN v END) AS INT) AS b_min,
        |  CAST(MAX(CASE WHEN fc = 0 THEN v END) AS INT) AS b_max
        |FROM pix GROUP BY doc_id, w, h""".stripMargin,

    // WAV sample-path oracle (round 13): recompute the k=8 sampled
    // per-channel stats from the fixture CONSTRUCTION — geometry from
    // (doc_id, n_chars), sample i of channel cc at text bytes
    // ((⌊i·nf/8⌋·ch + cc)·2, +1) as signed LE int16. The Spark side
    // chunk-walks the ACTUAL bytes (junk chunk ⇒ variable data
    // offset) — two independent paths to one answer. A mono doc's
    // channel-2 aggregates run over zero rows ⇒ NULL, matching the
    // operator's null c2 contract.
    "multimodal_wav_stats" ->
      """WITH wav AS (
        |  SELECT doc_id,
        |    CAST(doc_id % 2 + 1 AS INT) AS ch,
        |    CAST(n_chars % 9 + 4 AS INT) AS nf,
        |    CAST(doc_id % 1000 + 8000 AS INT) AS sr,
        |    rpad(text, 48, 'x') AS padded
        |  FROM documents
        |), smp AS (
        |  SELECT doc_id, ch, nf, sr, c.cc,
        |    unicode(substr(padded,
        |      CAST((((i.ii * nf) // 8) * ch + c.cc) * 2 + 1 AS INT), 1))
        |    + 256 * unicode(substr(padded,
        |      CAST((((i.ii * nf) // 8) * ch + c.cc) * 2 + 2 AS INT), 1)) AS u
        |  FROM wav
        |  CROSS JOIN (SELECT unnest(range(0, 8)) AS ii) i
        |  CROSS JOIN (SELECT unnest(range(0, 2)) AS cc) c
        |  WHERE c.cc < ch
        |), sgn AS (
        |  SELECT doc_id, ch, nf, sr, cc,
        |    CASE WHEN u >= 32768 THEN u - 65536 ELSE u END AS s
        |  FROM smp
        |)
        |SELECT doc_id, CAST(1 AS INT) AS is_wav, ch AS channels,
        |  sr AS sample_rate, CAST(nf AS BIGINT) AS n_frames,
        |  ROUND(AVG(CASE WHEN cc = 0 THEN s END), 6) AS c1_mean,
        |  CAST(MIN(CASE WHEN cc = 0 THEN s END) AS INT) AS c1_min,
        |  CAST(MAX(CASE WHEN cc = 0 THEN s END) AS INT) AS c1_max,
        |  ROUND(AVG(CASE WHEN cc = 1 THEN s END), 6) AS c2_mean,
        |  CAST(MIN(CASE WHEN cc = 1 THEN s END) AS INT) AS c2_min,
        |  CAST(MAX(CASE WHEN cc = 1 THEN s END) AS INT) AS c2_max
        |FROM sgn GROUP BY doc_id, ch, nf, sr""".stripMargin,

    // FULL-FIDELITY HashingTF oracle: murmur3_x86_32 (Spark's
    // hashUnsafeBytes2 variant — 4-byte LE blocks, remaining tail bytes
    // folded into ONE word mixed without the h1 rotation, seed 42)
    // re-derived in HUGEINT mod-2^32 SQL, then signed-mod 1024 bucketing,
    // per-bucket tf, the smoothed idf ln((m+1)/(df+1)), and the doc-level
    // nnz / l2 summary. Validated byte-for-byte against ml.HashingTF
    // (the one-byte-at-a-time hashUnsafeBytes variant differs on 21 of
    // the 31 corpus tokens and was rejected empirically).
    "text_tfidf" ->
      """WITH toks AS MATERIALIZED (
        |  SELECT doc_id,
        |    list_filter(regexp_split_to_array(lower(text), '[^\p{L}\p{N}]+'),
        |                t -> length(t) > 0) AS tokens
        |  FROM documents
        |), tok AS (
        |  SELECT doc_id, unnest(tokens) AS t FROM toks WHERE len(tokens) > 0
        |), t0 AS (
        |  SELECT doc_id, t, length(t) AS l, 42::HUGEINT AS h FROM tok
        |), m0a AS (
        |  SELECT * EXCLUDE (h), CASE WHEN l >= 4
        |    THEN xor(h, (((((((unicode(t[1]) + unicode(t[1+1]) * 256 + unicode(t[1+2]) * 65536 + unicode(t[1+3]) * 16777216)::HUGEINT) * 3432918353::HUGEINT) % 4294967296::HUGEINT * 32768::HUGEINT) % 4294967296::HUGEINT + ((((unicode(t[1]) + unicode(t[1+1]) * 256 + unicode(t[1+2]) * 65536 + unicode(t[1+3]) * 16777216)::HUGEINT) * 3432918353::HUGEINT) % 4294967296::HUGEINT // 131072::HUGEINT))) * 461845907::HUGEINT) % 4294967296::HUGEINT) ELSE h END AS h FROM t0
        |), m0 AS (
        |  SELECT * EXCLUDE (h), CASE WHEN l >= 4
        |    THEN ((((h * 8192::HUGEINT) % 4294967296::HUGEINT + (h // 524288::HUGEINT))) * 5 + 3864292196::HUGEINT) % 4294967296::HUGEINT ELSE h END AS h
        |  FROM m0a
        |), m1a AS (
        |  SELECT * EXCLUDE (h), CASE WHEN l >= 8
        |    THEN xor(h, (((((((unicode(t[5]) + unicode(t[5+1]) * 256 + unicode(t[5+2]) * 65536 + unicode(t[5+3]) * 16777216)::HUGEINT) * 3432918353::HUGEINT) % 4294967296::HUGEINT * 32768::HUGEINT) % 4294967296::HUGEINT + ((((unicode(t[5]) + unicode(t[5+1]) * 256 + unicode(t[5+2]) * 65536 + unicode(t[5+3]) * 16777216)::HUGEINT) * 3432918353::HUGEINT) % 4294967296::HUGEINT // 131072::HUGEINT))) * 461845907::HUGEINT) % 4294967296::HUGEINT) ELSE h END AS h FROM m0
        |), m1 AS (
        |  SELECT * EXCLUDE (h), CASE WHEN l >= 8
        |    THEN ((((h * 8192::HUGEINT) % 4294967296::HUGEINT + (h // 524288::HUGEINT))) * 5 + 3864292196::HUGEINT) % 4294967296::HUGEINT ELSE h END AS h
        |  FROM m1a
        |), m2a AS (
        |  SELECT * EXCLUDE (h), CASE WHEN l >= 12
        |    THEN xor(h, (((((((unicode(t[9]) + unicode(t[9+1]) * 256 + unicode(t[9+2]) * 65536 + unicode(t[9+3]) * 16777216)::HUGEINT) * 3432918353::HUGEINT) % 4294967296::HUGEINT * 32768::HUGEINT) % 4294967296::HUGEINT + ((((unicode(t[9]) + unicode(t[9+1]) * 256 + unicode(t[9+2]) * 65536 + unicode(t[9+3]) * 16777216)::HUGEINT) * 3432918353::HUGEINT) % 4294967296::HUGEINT // 131072::HUGEINT))) * 461845907::HUGEINT) % 4294967296::HUGEINT) ELSE h END AS h FROM m1
        |), m2 AS (
        |  SELECT * EXCLUDE (h), CASE WHEN l >= 12
        |    THEN ((((h * 8192::HUGEINT) % 4294967296::HUGEINT + (h // 524288::HUGEINT))) * 5 + 3864292196::HUGEINT) % 4294967296::HUGEINT ELSE h END AS h
        |  FROM m2a
        |), tl AS (
        |  SELECT * EXCLUDE (h), CASE WHEN l % 4 > 0
        |    THEN xor(h, (((((((CASE WHEN l % 4 >= 1 THEN unicode(t[(l // 4) * 4 + 1]) ELSE 0 END + CASE WHEN l % 4 >= 2 THEN unicode(t[(l // 4) * 4 + 2]) * 256 ELSE 0 END + CASE WHEN l % 4 >= 3 THEN unicode(t[(l // 4) * 4 + 3]) * 65536 ELSE 0 END)::HUGEINT) * 3432918353::HUGEINT) % 4294967296::HUGEINT * 32768::HUGEINT) % 4294967296::HUGEINT + ((((CASE WHEN l % 4 >= 1 THEN unicode(t[(l // 4) * 4 + 1]) ELSE 0 END + CASE WHEN l % 4 >= 2 THEN unicode(t[(l // 4) * 4 + 2]) * 256 ELSE 0 END + CASE WHEN l % 4 >= 3 THEN unicode(t[(l // 4) * 4 + 3]) * 65536 ELSE 0 END)::HUGEINT) * 3432918353::HUGEINT) % 4294967296::HUGEINT // 131072::HUGEINT))) * 461845907::HUGEINT) % 4294967296::HUGEINT) ELSE h END AS h FROM m2
        |), f0 AS (
        |  SELECT doc_id, t, xor(h, l::HUGEINT) AS h FROM tl
        |), f1 AS (
        |  SELECT doc_id, t, (xor(h, h // 65536::HUGEINT) * 2246822507::HUGEINT) % 4294967296::HUGEINT AS h FROM f0
        |), f2 AS (
        |  SELECT doc_id, t, (xor(h, h // 8192::HUGEINT) * 3266489909::HUGEINT) % 4294967296::HUGEINT AS h FROM f1
        |), hashed AS (
        |  SELECT doc_id, t,
        |    CAST(CASE WHEN xor(h, h // 65536::HUGEINT) >= 2147483648::HUGEINT
        |      THEN xor(h, h // 65536::HUGEINT) - 4294967296::HUGEINT
        |      ELSE xor(h, h // 65536::HUGEINT) END AS BIGINT) AS hs
        |  FROM f2
        |), bucketed AS (
        |  SELECT doc_id, ((hs % 1024) + 1024) % 1024 AS b FROM hashed
        |), tf AS MATERIALIZED (
        |  SELECT doc_id, b, COUNT(*) AS tf FROM bucketed GROUP BY 1, 2
        |), dfreq AS (
        |  SELECT b, COUNT(*) AS df FROM tf GROUP BY 1
        |), m AS (
        |  SELECT COUNT(*) AS m FROM documents
        |), w AS (
        |  SELECT tf.doc_id, tf.b, tf.tf * ln((m.m + 1.0) / (dfreq.df + 1.0)) AS w
        |  FROM tf JOIN dfreq USING (b) CROSS JOIN m
        |), agg AS (
        |  SELECT doc_id,
        |    ROUND(COALESCE(SUM(CASE WHEN b = 1 THEN w END), 0.0), 6) AS tfidf_1,
        |    ROUND(COALESCE(SUM(CASE WHEN b = 69 THEN w END), 0.0), 6) AS tfidf_69,
        |    ROUND(COALESCE(SUM(CASE WHEN b = 386 THEN w END), 0.0), 6) AS tfidf_386,
        |    ROUND(COALESCE(SUM(CASE WHEN b = 534 THEN w END), 0.0), 6) AS tfidf_534,
        |    ROUND(COALESCE(SUM(CASE WHEN b = 640 THEN w END), 0.0), 6) AS tfidf_640,
        |    CAST(COUNT(*) AS INT) AS nnz,
        |    ROUND(sqrt(SUM(w * w)), 6) AS l2_norm
        |  FROM w GROUP BY doc_id
        |)
        |SELECT d.doc_id,
        |  COALESCE(a.tfidf_1, 0.0) AS tfidf_1,
        |  COALESCE(a.tfidf_69, 0.0) AS tfidf_69,
        |  COALESCE(a.tfidf_386, 0.0) AS tfidf_386,
        |  COALESCE(a.tfidf_534, 0.0) AS tfidf_534,
        |  COALESCE(a.tfidf_640, 0.0) AS tfidf_640,
        |  COALESCE(a.nnz, 0) AS nnz,
        |  COALESCE(a.l2_norm, 0.0) AS l2_norm
        |FROM documents d
        |LEFT JOIN agg a ON a.doc_id = d.doc_id""".stripMargin,

    "skew_salted_agg" ->
      """SELECT event_type, COUNT(*) AS n_events
        |FROM events GROUP BY 1""".stripMargin,

    "skew_salted_join" ->
      """WITH f AS (
        |  SELECT l_orderkey, l_linenumber,
        |    CASE WHEN l_orderkey % 4 = 0 THEN 1 ELSE l_partkey END
        |      AS p_partkey
        |  FROM lineitem)
        |SELECT f.p_partkey, f.l_orderkey, f.l_linenumber, p.p_brand
        |FROM f JOIN part p USING (p_partkey)""".stripMargin,

    // MERGE oracle: the same union + row_number-over-priority
    // formulation the operator uses, restated in SQL — updates (pri 1)
    // beat target rows (pri 0), winning deletes drop the key.
    "llm_merge_upsert" ->
      """WITH upd AS (
        |  SELECT doc_id, 'v2: ' || text AS text, source, FALSE AS del
        |  FROM documents WHERE doc_id % 7 = 0 AND doc_id % 13 <> 5
        |  UNION ALL
        |  SELECT doc_id + 3000000, 'new: ' || text, source, FALSE
        |  FROM documents WHERE doc_id % 11 = 3
        |  UNION ALL
        |  SELECT doc_id, text, source, TRUE
        |  FROM documents WHERE doc_id % 13 = 5
        |), unioned AS (
        |  SELECT doc_id, text, source, FALSE AS del, 0 AS pri
        |  FROM documents
        |  UNION ALL
        |  SELECT doc_id, text, source, del, 1 FROM upd
        |), ranked AS (
        |  SELECT *, row_number() OVER
        |    (PARTITION BY doc_id ORDER BY pri DESC) AS rn
        |  FROM unioned
        |)
        |SELECT doc_id, md5(text) AS text_md5, source
        |FROM ranked WHERE rn = 1 AND NOT del""".stripMargin,

    // SCD2 oracle: the same two-window formulation — null-safe lag
    // comparison (IS DISTINCT FROM ≡ Spark's !(a <=> b)) suppresses
    // no-op changes, lead over the survivors closes intervals; both
    // windows order by (ts, event_id), the same total order as the
    // Scala side's tieBreak.
    "merge_scd2" ->
      """WITH ordered AS (
        |  SELECT user_id, ts, event_id, event_type,
        |    lag(event_type) OVER (
        |      PARTITION BY user_id ORDER BY ts, event_id) AS prev
        |  FROM events
        |), runs AS (
        |  SELECT user_id, ts, event_id, event_type FROM ordered
        |  WHERE event_type IS DISTINCT FROM prev
        |), hist AS (
        |  SELECT user_id, event_type, ts AS valid_from,
        |    lead(ts) OVER (
        |      PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
        |  FROM runs
        |)
        |SELECT user_id, event_type,
        |  strftime(valid_from, '%Y-%m-%d %H:%M:%S.%f') AS valid_from,
        |  strftime(valid_to, '%Y-%m-%d %H:%M:%S.%f') AS valid_to,
        |  CASE WHEN valid_to IS NULL THEN 1 ELSE 0 END AS is_current
        |FROM hist""".stripMargin,

    // incremental SCD2 oracle: the FULL-log rebuild, stated without the
    // event_id tie (the incremental path orders by ts alone; (user_id,
    // ts) is unique at every SF, pinned by the row itself matching) —
    // history-fold + batch must reproduce it row-for-row.
    "merge_scd2_incremental" ->
      """WITH ordered AS (
        |  SELECT user_id, ts, event_type,
        |    lag(event_type) OVER (
        |      PARTITION BY user_id ORDER BY ts) AS prev
        |  FROM events
        |), runs AS (
        |  SELECT user_id, ts, event_type FROM ordered
        |  WHERE event_type IS DISTINCT FROM prev
        |), hist AS (
        |  SELECT user_id, event_type, ts AS valid_from,
        |    lead(ts) OVER (
        |      PARTITION BY user_id ORDER BY ts) AS valid_to
        |  FROM runs
        |)
        |SELECT user_id, event_type,
        |  strftime(valid_from, '%Y-%m-%d %H:%M:%S.%f') AS valid_from,
        |  strftime(valid_to, '%Y-%m-%d %H:%M:%S.%f') AS valid_to,
        |  CASE WHEN valid_to IS NULL THEN 1 ELSE 0 END AS is_current
        |FROM hist""".stripMargin,

    // z-order oracle: the identical 4-step shift-OR-mask spread on both
    // 16-bit dimensions (masks 0x00FF00FF, 0x0F0F0F0F, 0x33333333,
    // 0x55555555 in decimal), interleaved x-even / y-odd. The linear
    // quantizer repeats the same IEEE op sequence (sub, div, mul,
    // floor, clamp), so the grid cell is cross-engine exact.
    "layout_zorder" ->
      """WITH base AS (
        |  SELECT event_id, user_id % 65536 AS x,
        |    CAST(LEAST(GREATEST(
        |      FLOOR((value - 0.0) / 500.0 * 65535.0), 0.0), 65535.0)
        |      AS BIGINT) AS y
        |  FROM events
        |), s1 AS (
        |  SELECT event_id, x, y,
        |    ((x & 65535) | ((x & 65535) << 8)) & 16711935 AS ax,
        |    ((y & 65535) | ((y & 65535) << 8)) & 16711935 AS ay
        |  FROM base
        |), s2 AS (
        |  SELECT event_id, x, y,
        |    ((ax | (ax << 4)) & 252645135) AS ax,
        |    ((ay | (ay << 4)) & 252645135) AS ay
        |  FROM s1
        |), s3 AS (
        |  SELECT event_id, x, y,
        |    ((ax | (ax << 2)) & 858993459) AS ax,
        |    ((ay | (ay << 2)) & 858993459) AS ay
        |  FROM s2
        |), s4 AS (
        |  SELECT event_id, x, y,
        |    ((ax | (ax << 1)) & 1431655765) AS ax,
        |    ((ay | (ay << 1)) & 1431655765) AS ay
        |  FROM s3
        |)
        |SELECT event_id, x, y, (ax | (ay << 1)) AS zval FROM s4""".stripMargin,

    // perplexity oracle: same model definition end-to-end — [\p{L}]+
    // tokens of lower(text), context counts over bigrams, corpus
    // distinct-token V, p = (c12 + 0.5) / (c1 + 0.5·V), per-doc
    // ppl = exp(−avg ln p) rounded to 6dp (short docs NULL).
    "text_perplexity" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    regexp_extract_all(lower(text), '[\p{L}]+') AS ws
        |  FROM documents
        |), big AS (
        |  SELECT doc_id, ws[i] AS w1, ws[i + 1] AS w2
        |  FROM (SELECT doc_id, ws, unnest(range(1, len(ws))) AS i
        |        FROM toks)
        |), ctx AS (
        |  SELECT w1, COUNT(*) AS c1 FROM big GROUP BY w1
        |), pair AS (
        |  SELECT w1, w2, COUNT(*) AS c12 FROM big GROUP BY w1, w2
        |), voc AS (
        |  SELECT COUNT(DISTINCT w) AS v
        |  FROM (SELECT unnest(ws) AS w FROM toks)
        |), model AS (
        |  SELECT p.w1, p.w2,
        |    (p.c12 + 0.5) / (c.c1 + 0.5 * voc.v) AS p
        |  FROM pair p JOIN ctx c USING (w1), voc
        |), scored AS (
        |  SELECT b.doc_id, ln(m.p) AS lp
        |  FROM big b JOIN model m ON b.w1 = m.w1 AND b.w2 = m.w2
        |), agg AS (
        |  SELECT doc_id, COUNT(*) AS n_bigrams, EXP(-AVG(lp)) AS ppl
        |  FROM scored GROUP BY doc_id
        |)
        |SELECT d.doc_id,
        |  COALESCE(a.n_bigrams, 0) AS n_bigrams,
        |  ROUND(a.ppl, 6) AS ppl
        |FROM documents d LEFT JOIN agg a USING (doc_id)""".stripMargin,

    // cross-perplexity oracle: model CTEs restricted to the en slice,
    // scoring over every doc with BOTH smoothing fallbacks restated —
    // COALESCE(model p, 0.5 / (COALESCE(c1, 0) + 0.5·V)) covers the
    // known-context-unseen-pair AND the unknown-context branches in
    // one expression, exactly perplexityAgainst's coalesce chain.
    "text_perplexity_persisted" -> crossPerplexityOracle,
    "text_perplexity_cross" -> crossPerplexityOracle,

    // boilerplate oracle: same planted fixture (banner on doc_id%3=0,
    // per-source footer, blank separator), same semantics — a non-blank
    // line in ≥ 10 distinct docs is dropped, order-preserving rebuild,
    // all-boilerplate docs come back empty (not missing).
    "text_boilerplate" ->
      """WITH fix AS (
        |  SELECT doc_id,
        |    concat_ws(chr(10),
        |      CASE WHEN doc_id % 3 = 0
        |        THEN 'Subscribe to our newsletter today' END,
        |      text, '', 'Copyright ' || source) AS text
        |  FROM documents
        |), lines AS (
        |  SELECT doc_id, i AS line_idx, parts[i] AS line,
        |    len(parts) AS n_lines
        |  FROM (SELECT doc_id, split(text, chr(10)) AS parts,
        |          unnest(range(1, len(parts) + 1)) AS i
        |        FROM fix)
        |), boiler AS (
        |  SELECT line
        |  FROM (SELECT DISTINCT doc_id, line FROM lines
        |        WHERE trim(line) <> '')
        |  GROUP BY line HAVING COUNT(*) >= 10
        |), kept AS (
        |  SELECT * FROM lines
        |  WHERE line NOT IN (SELECT line FROM boiler)
        |), rebuilt AS (
        |  SELECT doc_id,
        |    string_agg(line, chr(10) ORDER BY line_idx) AS clean_text,
        |    COUNT(*) AS n_kept
        |  FROM kept GROUP BY doc_id
        |)
        |SELECT f.doc_id, md5(COALESCE(r.clean_text, '')) AS text_md5,
        |  n.n_lines, n.n_lines - COALESCE(r.n_kept, 0) AS n_removed
        |FROM fix f
        |JOIN (SELECT DISTINCT doc_id, n_lines FROM lines) n USING (doc_id)
        |LEFT JOIN rebuilt r USING (doc_id)""".stripMargin,

    "dedup_lines" ->
      """WITH fix AS (
        |  SELECT doc_id,
        |    concat_ws(chr(10),
        |      CASE WHEN doc_id % 3 = 0
        |        THEN 'Subscribe to our newsletter today' END,
        |      text, '', 'Copyright ' || source) AS text
        |  FROM documents
        |), lines AS (
        |  SELECT doc_id, i AS line_idx, parts[i] AS line,
        |    len(parts) AS n_lines
        |  FROM (SELECT doc_id, split(text, chr(10)) AS parts,
        |          unnest(range(1, len(parts) + 1)) AS i
        |        FROM fix)
        |), kept AS (
        |  SELECT doc_id, line_idx, line FROM (
        |    SELECT doc_id, line_idx, line,
        |      row_number() OVER (
        |        PARTITION BY line ORDER BY doc_id, line_idx) AS rn
        |    FROM lines WHERE trim(line) <> '')
        |  WHERE rn = 1
        |  UNION ALL
        |  SELECT doc_id, line_idx, line FROM lines WHERE trim(line) = ''
        |), rebuilt AS (
        |  SELECT doc_id,
        |    string_agg(line, chr(10) ORDER BY line_idx) AS clean_text,
        |    COUNT(*) AS n_kept
        |  FROM kept GROUP BY doc_id
        |)
        |SELECT f.doc_id, md5(COALESCE(r.clean_text, '')) AS text_md5,
        |  n.n_lines, n.n_lines - COALESCE(r.n_kept, 0) AS n_removed
        |FROM fix f
        |JOIN (SELECT DISTINCT doc_id, n_lines FROM lines) n USING (doc_id)
        |LEFT JOIN rebuilt r USING (doc_id)""".stripMargin,

    "dedup_substring" ->
      """WITH fix AS (
        |  SELECT doc_id,
        |    text || CASE WHEN doc_id % 7 = 0
        |      THEN ' Quarterly results were strong across all segments according to the annual report summary'
        |      ELSE '' END AS text
        |  FROM documents
        |), toks AS MATERIALIZED (
        |  SELECT doc_id,
        |    list_filter(regexp_split_to_array(text, '\s+'),
        |                t -> length(t) > 0) AS ws
        |  FROM fix
        |), wins AS (
        |  SELECT doc_id, i - 1 AS pos,
        |    array_to_string(ws[i : i + 7], ' ') AS g
        |  FROM (SELECT doc_id, ws, unnest(range(1, len(ws) - 6)) AS i
        |        FROM toks WHERE len(ws) >= 8)
        |), losers AS (
        |  SELECT doc_id, pos FROM (
        |    SELECT doc_id, pos,
        |      row_number() OVER (PARTITION BY g ORDER BY doc_id, pos) AS rn
        |    FROM wins)
        |  WHERE rn > 1
        |), covered AS (
        |  SELECT DISTINCT doc_id, unnest(range(pos, pos + 8)) AS tokpos
        |  FROM losers
        |), tokpos AS (
        |  SELECT doc_id, i - 1 AS tokpos, ws[i] AS tok, len(ws) AS n_tokens
        |  FROM (SELECT doc_id, ws, unnest(range(1, len(ws) + 1)) AS i
        |        FROM toks)
        |), kept AS (
        |  SELECT t.doc_id, t.tokpos, t.tok
        |  FROM tokpos t ANTI JOIN covered c
        |    ON t.doc_id = c.doc_id AND t.tokpos = c.tokpos
        |), rebuilt AS (
        |  SELECT doc_id,
        |    string_agg(tok, ' ' ORDER BY tokpos) AS clean_text,
        |    COUNT(*) AS n_kept
        |  FROM kept GROUP BY doc_id
        |)
        |SELECT f.doc_id, md5(COALESCE(r.clean_text, '')) AS text_md5,
        |  COALESCE(n.n_tokens, 0) AS n_tokens,
        |  COALESCE(n.n_tokens, 0) - COALESCE(r.n_kept, 0) AS n_removed
        |FROM fix f
        |LEFT JOIN (SELECT DISTINCT doc_id, n_tokens FROM tokpos) n
        |  USING (doc_id)
        |LEFT JOIN rebuilt r USING (doc_id)""".stripMargin,

    "revenue_by_nation" ->
      """SELECT r.r_name, n.n_name,
        |  COUNT(*) AS n_lineitems,
        |  ROUND(SUM(l.l_extendedprice * (1.0 - l.l_discount)), 2) AS revenue
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |JOIN region r ON n.n_regionkey = r.r_regionkey
        |WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
        |GROUP BY 1, 2""".stripMargin,

    "events_window" -> eventsWindowOracle,
    // Round 11: the streaming twin shares the batch oracle VERBATIM —
    // complete-mode foreachBatch materialization makes the final sink
    // state the full aggregate, so stream == batch is itself under the
    // hash compare.
    "stream_window_counts" -> eventsWindowOracle,
    // append-mode streaming dedup projected to its key columns — the
    // sink is exactly the distinct key set, whichever arrival won.
    "stream_dedup_keys" ->
      "SELECT DISTINCT user_id, event_type FROM events",
    // streaming CDC merge snapshot: the final state must equal the
    // batch rule "latest event per key by seq" (tombstones flagged).
    "stream_merge_snapshot" ->
      """SELECT user_id AS key, event_type AS payload,
        |  CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS deleted
        |FROM events
        |QUALIFY row_number() OVER (
        |  PARTITION BY user_id ORDER BY ts DESC) = 1""".stripMargin,

    "events_props_agg" ->
      """SELECT event_type, COUNT(*) AS n_events,
        |  ROUND(AVG(CAST(json_extract_string(props, '$.k') AS INT)), 6) AS avg_k
        |FROM events GROUP BY 1""".stripMargin,

    // floor(epoch) mirrors Spark's cast(timestamp as long) second
    // truncation — events carry microsecond precision.
    // the streaming sessionizer's oracle IS the batch sessionize SQL:
    // same gap rule, same (ts, event_id) order, same session_idx
    // numbering — the state-store path must land on the identical
    // frame.
    "stream_sessionize" -> eventsSessionizeOracle,

    "events_sessionize" -> eventsSessionizeOracle,

    // session-summary oracle: the proven sessionize CTE grouped per
    // (user, session); duration = second-truncated epoch diff, the
    // same integer arithmetic the gap rule uses.
    "events_sessions" ->
      """WITH sess AS (
        |  SELECT event_id, user_id, ts,
        |    CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS session_idx
        |  FROM (
        |    SELECT event_id, user_id, ts,
        |      CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
        |             OR CAST(floor(epoch(ts)) AS BIGINT)
        |                - CAST(floor(epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))) AS BIGINT) > 1800
        |           THEN 1 ELSE 0 END AS is_new
        |    FROM events)
        |)
        |SELECT user_id, session_idx,
        |  strftime(MIN(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
        |  strftime(MAX(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_end,
        |  COUNT(*) AS n_events,
        |  CAST(floor(epoch(MAX(ts))) AS BIGINT)
        |    - CAST(floor(epoch(MIN(ts))) AS BIGINT) AS duration_sec
        |FROM sess GROUP BY 1, 2""".stripMargin,

    // DuckDB's native ASOF JOIN is the ground truth for the composed
    // union+window operator; right-side (user_id, ts) ties collapse to
    // max(value) = the struct-max the Spark window sort picks.
    "events_asof" ->
      """WITH l AS (
        |  SELECT event_id, user_id, ts, value FROM events
        |  WHERE event_type = 'purchase'
        |), r AS (
        |  SELECT user_id, ts, max(value) AS value FROM events
        |  WHERE event_type = 'click' GROUP BY 1, 2
        |)
        |SELECT l.event_id, l.user_id,
        |  strftime(l.ts, '%Y-%m-%d %H:%M:%S.%f') AS ts, l.value,
        |  strftime(r.ts, '%Y-%m-%d %H:%M:%S.%f') AS asof_time,
        |  r.value AS asof_value
        |FROM l ASOF LEFT JOIN r
        |  ON l.user_id = r.user_id AND l.ts >= r.ts""".stripMargin,

    // Plain inequality join is fine at oracle scale; the Spark side's
    // bucketed equi-join must produce the identical pair set.
    "events_range_join" ->
      """WITH c AS (
        |  SELECT event_id AS click_id, user_id, epoch_us(ts) AS click_us
        |  FROM events WHERE event_type = 'click'
        |), p AS (
        |  SELECT event_id AS purchase_id, user_id, epoch_us(ts) AS lo_us
        |  FROM events WHERE event_type = 'purchase'
        |)
        |SELECT c.user_id, c.click_id, p.purchase_id, c.click_us, p.lo_us
        |FROM c JOIN p ON c.user_id = p.user_id
        |  AND c.click_us >= p.lo_us
        |  AND c.click_us <= p.lo_us + 21600000000""".stripMargin,

    // Attribution pairs compared on epoch micros inside the join (same
    // integer-domain discipline as events_range_join), timestamps
    // formatted for the registered shape.
    // the stream-stream join's oracle IS the batch attribution SQL:
    // identical join condition, identical output shape — the join
    // state store must land on the identical pair set.
    "stream_attribution" -> eventsAttributionOracle,

    "events_attribution" -> eventsAttributionOracle,

    "text_chunk" ->
      """WITH t AS (
        |  SELECT doc_id, regexp_extract_all(text, '\S+') AS toks FROM documents
        |)
        |SELECT doc_id,
        |  CAST(start // 24 AS INT) AS chunk_idx,
        |  CAST(LEAST(32, len(toks) - start) AS INT) AS chunk_tokens,
        |  array_to_string(toks[start + 1 : start + 32], ' ') AS chunk
        |FROM (SELECT doc_id, toks, unnest(range(0, len(toks), 24)) AS start
        |      FROM t)""".stripMargin,

    "text_tfidf_exact" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    list_filter(regexp_split_to_array(lower(text), '[^\p{L}\p{N}]+'),
        |                t -> length(t) > 0) AS tokens
        |  FROM documents
        |), terms AS (
        |  SELECT doc_id, unnest(tokens) AS term FROM toks
        |), tfc AS (
        |  SELECT doc_id, term, COUNT(*) AS tf FROM terms GROUP BY 1, 2
        |), dfx AS (
        |  SELECT term, COUNT(*) AS df_docs FROM tfc GROUP BY 1
        |), n AS (SELECT COUNT(*) AS n FROM documents)
        |SELECT doc_id, term, tf, df_docs,
        |  ROUND(tf * (ln((n + 1.0) / (df_docs + 1.0)) + 1.0), 6) AS tfidf,
        |  CAST(rank AS INT) AS rank
        |FROM (
        |  SELECT tfc.doc_id, tfc.term, tfc.tf, dfx.df_docs, n.n,
        |    row_number() OVER (PARTITION BY tfc.doc_id
        |      ORDER BY tfc.tf DESC, dfx.df_docs ASC, tfc.term ASC) AS rank
        |  FROM tfc JOIN dfx USING (term) CROSS JOIN n)
        |WHERE rank <= 3""".stripMargin,

    // BM25 oracle: same tokenization as text_tfidf_exact, Lucene idf
    // ln(1 + (N − df + .5)/(df + .5)), k1 = 1.2, b = 0.75, per-doc
    // length normalization against the corpus avgdl, DISTINCT query
    // terms, self-matches excluded, 6dp round before the rank window.
    // Shared verbatim by text_bm25_persisted: the postings write →
    // reload → probe round-trip must be the identity, so persistence
    // itself is under the oracle (the similarity_ivf_persisted
    // pattern).
    "text_bm25" -> bm25Oracle,
    "text_bm25_persisted" -> bm25Oracle,
    // The living-index legs (r15) share the SAME twin: an appended
    // index must score identically to a from-scratch build, so the
    // full-corpus oracle adjudicates both the batch merge and the
    // streamed-delta merge.
    "text_bm25_append" -> bm25Oracle,
    "stream_bm25_append" -> bm25Oracle,

    // Reciprocal-rank fusion of the two PROVEN rankings (text_bm25 +
    // the similarity_topk cosine ranks restricted to the same query
    // ids): score = Σ 1/(60 + rank), 6dp round, doc-id ties. Rank
    // arithmetic only — the fused list is exactly derivable from the
    // two parent oracles, restated here end to end.
    "retrieval_hybrid" ->
      (bm25CtesSql +
        """, cos_scored AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS doc_id,
        |    ROUND(list_cosine_similarity(
        |      CAST(q.embedding AS DOUBLE[]),
        |      CAST(c.embedding AS DOUBLE[])), 6) AS cosine
        |  FROM embeddings q CROSS JOIN embeddings c
        |  WHERE q.vec_id < 5 AND c.vec_id <> q.vec_id
        |), cos_ranked AS (
        |  SELECT query_id, doc_id, rn AS rank FROM (
        |    SELECT *, row_number() OVER (
        |      PARTITION BY query_id ORDER BY cosine DESC, doc_id) AS rn
        |    FROM cos_scored
        |  ) WHERE rn <= 10
        |), bm25_ranked AS (
        |  SELECT query_id, doc_id, rnk AS rank FROM (
        |    SELECT *, row_number() OVER (
        |      PARTITION BY query_id ORDER BY bm25 DESC, doc_id) AS rnk
        |    FROM scored
        |  ) WHERE rnk <= 10
        |), unioned AS (
        |  SELECT query_id, doc_id, rank FROM bm25_ranked
        |  UNION ALL
        |  SELECT query_id, doc_id, rank FROM cos_ranked
        |), fused AS (
        |  SELECT query_id, doc_id,
        |    ROUND(SUM(1.0 / (60.0 + rank)), 6) AS rrf
        |  FROM unioned GROUP BY 1, 2
        |)
        |SELECT query_id, doc_id, CAST(rnk AS INT) AS rank, rrf
        |FROM (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY query_id ORDER BY rrf DESC, doc_id) AS rnk
        |  FROM fused
        |) WHERE rnk <= 10""").stripMargin,

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

    "text_pack_bins" ->
      """SELECT doc_id, source,
        |  CAST(n_tokens AS INT) AS n_tokens,
        |  CAST(tokens_before AS BIGINT) AS tokens_before,
        |  CAST(tokens_before // 512 AS BIGINT) AS bin_id,
        |  CAST(tokens_before % 512 AS BIGINT) AS bin_offset
        |FROM (
        |  SELECT doc_id, source,
        |    len(regexp_extract_all(text, '\S+')) AS n_tokens,
        |    COALESCE(SUM(len(regexp_extract_all(text, '\S+'))) OVER (
        |      PARTITION BY source ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS tokens_before
        |  FROM documents)""".stripMargin,

    "orders_top_revenue" ->
      """WITH per_order AS (
        |  SELECT l_orderkey,
        |    SUM(l_extendedprice * (1 - l_discount)) AS order_rev
        |  FROM lineitem
        |  WHERE l_shipdate > TIMESTAMP '1998-06-01'
        |  GROUP BY 1
        |)
        |SELECT o.o_orderkey,
        |  strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate,
        |  o.o_orderpriority,
        |  ROUND(p.order_rev, 2) AS revenue
        |FROM per_order p
        |JOIN orders o ON p.l_orderkey = o.o_orderkey
        |  AND o.o_orderdate < TIMESTAMP '1998-06-01'
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |  AND c.c_mktsegment = 'BUILDING'
        |ORDER BY revenue DESC, o.o_orderkey
        |LIMIT 10""".stripMargin,

    "orders_large_customers" ->
      """WITH big AS (
        |  SELECT l_orderkey, ROUND(SUM(l_quantity), 2) AS total_qty
        |  FROM lineitem GROUP BY 1
        |  HAVING ROUND(SUM(l_quantity), 2) > 300
        |)
        |SELECT c.c_custkey, c.c_name, o.o_orderkey,
        |  strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate,
        |  ROUND(o.o_totalprice, 2) AS o_totalprice, b.total_qty
        |FROM big b
        |JOIN orders o ON b.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey""".stripMargin,

    "events_cardinality" ->
      """SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
        |  COUNT(*) AS n_events,
        |  COUNT(DISTINCT user_id) AS n_users
        |FROM events GROUP BY 1, 2""".stripMargin,

    // The sketch row's oracle restates only the EXACT legs (volume,
    // distinct) and pins within_tol TRUE — a DataSketches estimate
    // outside the 3 % gate hash-mismatches the boolean column.
    "events_cardinality_sketch" ->
      """SELECT event_type, COUNT(*) AS n_events,
        |  COUNT(DISTINCT user_id) AS n_exact,
        |  TRUE AS within_tol
        |FROM events GROUP BY 1""".stripMargin,

    // KMV oracle: FULL restatement of the estimator — 60-bit md5
    // hashes (the mixCorpus parity recipe), k-th smallest per group,
    // (k−1)·2⁶⁰/h₍ₖ₎ spelled operand-for-operand like
    // BottomK.estimateDistinct so the Doubles are bit-identical.
    // Merge-order independence (min-k of a set) is what makes the
    // split/persist/merge Spark plan equal this one-shot SQL.
    "events_cardinality_kmv" ->
      """WITH h AS (
        |  SELECT DISTINCT event_type,
        |    ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS hv
        |  FROM events WHERE user_id IS NOT NULL
        |), r AS (
        |  SELECT event_type, hv,
        |    row_number() OVER (PARTITION BY event_type ORDER BY hv) AS rn,
        |    COUNT(*) OVER (PARTITION BY event_type) AS nd
        |  FROM h
        |), est AS (
        |  SELECT event_type,
        |    CASE WHEN nd < 64 THEN CAST(nd AS DOUBLE)
        |         ELSE (64 - 1) * pow(2.0, 60) / CAST(hv AS DOUBLE) END
        |      AS n_users_est
        |  FROM r WHERE rn = LEAST(nd, 64)
        |), ex AS (
        |  SELECT event_type, COUNT(*) AS n_events,
        |    COUNT(DISTINCT user_id) AS n_exact
        |  FROM events WHERE user_id IS NOT NULL GROUP BY 1
        |)
        |SELECT ex.event_type, ex.n_events, est.n_users_est, ex.n_exact
        |FROM ex JOIN est USING (event_type)""".stripMargin,

    // Overlap oracle: bottom-64 per side, union re-truncated to 64,
    // membership count in both sides, then the same estimate chain —
    // (m/|U|)·est(U) with each CASE/regime mirrored from kmvOverlap.
    "events_overlap_kmv" ->
      """WITH h AS (
        |  SELECT DISTINCT event_type,
        |    ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS hv
        |  FROM events
        |  WHERE user_id IS NOT NULL AND event_type IN ('click', 'view')
        |), ka AS (SELECT hv FROM h WHERE event_type = 'click'
        |          ORDER BY hv LIMIT 64),
        |   kb AS (SELECT hv FROM h WHERE event_type = 'view'
        |          ORDER BY hv LIMIT 64),
        |   u AS (SELECT hv FROM
        |           (SELECT hv FROM ka UNION SELECT hv FROM kb)
        |         ORDER BY hv LIMIT 64),
        |   stats AS (
        |     SELECT (SELECT COUNT(*) FROM ka) AS na,
        |            (SELECT MAX(hv) FROM ka) AS kth_a,
        |            (SELECT COUNT(*) FROM kb) AS nb,
        |            (SELECT MAX(hv) FROM kb) AS kth_b,
        |            (SELECT COUNT(*) FROM u) AS nu,
        |            (SELECT MAX(hv) FROM u) AS kth_u,
        |            (SELECT COUNT(*) FROM u
        |             WHERE hv IN (SELECT hv FROM ka)
        |               AND hv IN (SELECT hv FROM kb)) AS m,
        |            (SELECT COUNT(*) FROM
        |              (SELECT DISTINCT user_id FROM events
        |               WHERE event_type = 'click' AND user_id IS NOT NULL
        |               INTERSECT
        |               SELECT DISTINCT user_id FROM events
        |               WHERE event_type = 'view' AND user_id IS NOT NULL))
        |              AS n_inter_exact
        |   )
        |SELECT 'click' AS group_a, 'view' AS group_b,
        |  CASE WHEN na < 64 THEN CAST(na AS DOUBLE)
        |       ELSE (64 - 1) * pow(2.0, 60) / CAST(kth_a AS DOUBLE) END
        |    AS n_a_est,
        |  CASE WHEN nb < 64 THEN CAST(nb AS DOUBLE)
        |       ELSE (64 - 1) * pow(2.0, 60) / CAST(kth_b AS DOUBLE) END
        |    AS n_b_est,
        |  CASE WHEN nu < 64 THEN CAST(nu AS DOUBLE)
        |       ELSE (64 - 1) * pow(2.0, 60) / CAST(kth_u AS DOUBLE) END
        |    AS n_union_est,
        |  CAST(m AS DOUBLE) / CAST(nu AS DOUBLE) AS jaccard_est,
        |  CAST(m AS DOUBLE) / CAST(nu AS DOUBLE) *
        |    CASE WHEN nu < 64 THEN CAST(nu AS DOUBLE)
        |         ELSE (64 - 1) * pow(2.0, 60) / CAST(kth_u AS DOUBLE) END
        |    AS n_inter_est,
        |  n_inter_exact
        |FROM stats""".stripMargin,

    "text_length_quantiles" ->
      """WITH n AS (
        |  SELECT source,
        |    CAST(len(regexp_extract_all(text, '\S+')) AS DOUBLE) AS n_tokens
        |  FROM documents
        |)
        |SELECT source, COUNT(*) AS n_docs,
        |  ROUND(quantile_cont(n_tokens, 0.25), 6) AS p25,
        |  ROUND(quantile_cont(n_tokens, 0.50), 6) AS p50,
        |  ROUND(quantile_cont(n_tokens, 0.75), 6) AS p75,
        |  ROUND(quantile_cont(n_tokens, 0.95), 6) AS p95
        |FROM n GROUP BY 1""".stripMargin,

    // Sample-quantile oracle: the bottom-16 rows per source by md5
    // hash rank (deterministic, no RNG) re-selected in SQL, both
    // sample and exact legs through the proven percentile ==
    // quantile_cont parity, 6dp-rounded. Assumes distinct 60-bit
    // hashes per group (collision odds ~2⁻⁶⁰·n²; a collision would
    // dedupe in the sketch but not in this rank restatement).
    "text_sample_quantiles" -> sampleQuantilesOracle,
    // The persisted-merge lifecycle row (r15) shares the one-shot twin
    // VERBATIM: bottom-16 of (batch-1 sketch ∪ batch-2 sketch) is
    // bottom-16 of the whole corpus (min-k of a set union), so
    // split / persist / reload / merge / re-answer must be the
    // identity — which is exactly what the shared oracle pins.
    "text_sample_quantiles_merged" -> sampleQuantilesOracle,

    "text_bpe_merges" -> bpeOracle(
      """SELECT 1 AS step, l AS merge_left, r AS merge_right,
        |  pc AS pair_count FROM b1
        |UNION ALL SELECT 2, l, r, pc FROM b2
        |UNION ALL SELECT 3, l, r, pc FROM b3""".stripMargin),

    "text_bpe_segment" -> bpeOracle(
      """SELECT word, cnt AS n_word,
        |  string_agg(s, ' ' ORDER BY i) AS seg
        |FROM syms3 GROUP BY word, cnt""".stripMargin),

    // encode oracle: symbol counts per vocab word from the shared
    // chain, every corpus word LEFT-joined (char-count fallback),
    // doc-keyed sums (BIGINT-cast: DuckDB SUM returns HUGEINT).
    "text_bpe_encode" -> bpeOracle(
      """, vocab AS (
        |  SELECT word, COUNT(*) AS n_syms FROM syms3 GROUP BY word
        |), cw AS (
        |  SELECT doc_id, t.w AS word
        |  FROM documents,
        |    unnest(regexp_extract_all(lower(text), '[\p{L}]+')) AS t(w)
        |)
        |SELECT doc_id,
        |  CAST(SUM(COALESCE(v.n_syms, length(word))) AS BIGINT)
        |    AS n_bpe_tokens,
        |  COUNT(*) AS n_words
        |FROM cw LEFT JOIN vocab v USING (word)
        |GROUP BY doc_id""".stripMargin),

    // the persisted round-trip must be lossless — same oracle.
    "text_bpe_encode_persisted" -> bpeOracle(
      """, vocab AS (
        |  SELECT word, COUNT(*) AS n_syms FROM syms3 GROUP BY word
        |), cw AS (
        |  SELECT doc_id, t.w AS word
        |  FROM documents,
        |    unnest(regexp_extract_all(lower(text), '[\p{L}]+')) AS t(w)
        |)
        |SELECT doc_id,
        |  CAST(SUM(COALESCE(v.n_syms, length(word))) AS BIGINT)
        |    AS n_bpe_tokens,
        |  COUNT(*) AS n_words
        |FROM cw LEFT JOIN vocab v USING (word)
        |GROUP BY doc_id""".stripMargin),

    "dedup_edit_similarity" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    substr(trim(regexp_replace(lower(text), '\s+', ' ', 'g')),
        |           1, 100) AS t
        |  FROM documents
        |)
        |SELECT p.id_a, p.id_b,
        |  CAST(levenshtein(a.t, b.t) AS INT) AS edit_dist,
        |  CASE WHEN greatest(length(a.t), length(b.t)) = 0 THEN 1.0
        |    ELSE ROUND(1.0 - CAST(levenshtein(a.t, b.t) AS DOUBLE)
        |      / greatest(length(a.t), length(b.t)), 6) END AS similarity
        |FROM (SELECT doc_id AS id_a, doc_id + 1 AS id_b FROM documents) p
        |JOIN t a ON a.doc_id = p.id_a
        |JOIN t b ON b.doc_id = p.id_b""".stripMargin,

    // FULL-FIDELITY CDC oracle: re-implements RollingChunkHashes in
    // pure SQL — the splitmix64 gear table, the shift-add rolling gear
    // hash, FNV-1a chunk fingerprints and the 16-byte minimum, via a
    // recursive per-byte state scan (MATERIALIZED keeps the byte table
    // from re-inlining per iteration: 107s -> 5s). Candidates = pairs
    // sharing >= 1 distinct chunk hash, exactly passagePairs(minShared=1).
    "dedup_passage_pairs" ->
      """WITH RECURSIVE gear AS MATERIALIZED (
        |  SELECT i, xor(z2, z2 // 2147483648::HUGEINT) AS g FROM (
        |    SELECT i, (((xor(z1, z1 // 134217728::HUGEINT)) % 4294967296::HUGEINT * (10723151780598845931::HUGEINT) % 18446744073709551616::HUGEINT + ((xor(z1, z1 // 134217728::HUGEINT)) // 4294967296::HUGEINT * (10723151780598845931::HUGEINT) % 4294967296::HUGEINT) * 4294967296::HUGEINT) % 18446744073709551616::HUGEINT) AS z2 FROM (
        |      SELECT i, (((xor(x, x // 1073741824::HUGEINT)) % 4294967296::HUGEINT * (13787848793156543929::HUGEINT) % 18446744073709551616::HUGEINT + ((xor(x, x // 1073741824::HUGEINT)) // 4294967296::HUGEINT * (13787848793156543929::HUGEINT) % 4294967296::HUGEINT) * 4294967296::HUGEINT) % 18446744073709551616::HUGEINT) AS z1 FROM (
        |        SELECT i, ((i + 1) * 11400714819323198485::HUGEINT) % 18446744073709551616::HUGEINT AS x
        |        FROM range(256) r(i))))
        |), norm AS MATERIALIZED (
        |  SELECT doc_id,
        |    trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS t
        |  FROM documents
        |), bytes AS MATERIALIZED (
        |  SELECT doc_id, ip AS pos, unicode(t[ip]) AS b, g.g
        |  FROM norm, LATERAL (SELECT unnest(range(1, length(t) + 1)) AS ip)
        |  JOIN gear g ON g.i = unicode(t[ip])
        |), state(doc_id, pos, gr, chunk, clen, hashes) AS (
        |  SELECT doc_id, 0, 0::HUGEINT, 14695981039346656037::HUGEINT, 0, []::HUGEINT[]
        |  FROM norm WHERE length(t) > 0
        |  UNION ALL
        |  SELECT doc_id, pos, ng,
        |    CASE WHEN bnd THEN 14695981039346656037::HUGEINT ELSE nc END,
        |    CASE WHEN bnd THEN 0 ELSE clen + 1 END,
        |    CASE WHEN bnd THEN list_append(hashes, nc) ELSE hashes END
        |  FROM (
        |    SELECT s.doc_id, b.pos, s.clen, s.hashes,
        |      ((s.gr * 2) % 18446744073709551616::HUGEINT + b.g) % 18446744073709551616::HUGEINT AS ng,
        |      (((xor(s.chunk, b.b)) % 4294967296::HUGEINT * (1099511628211::HUGEINT) % 18446744073709551616::HUGEINT + ((xor(s.chunk, b.b)) // 4294967296::HUGEINT * (1099511628211::HUGEINT) % 4294967296::HUGEINT) * 4294967296::HUGEINT) % 18446744073709551616::HUGEINT) AS nc,
        |      (s.clen + 1 >= 16 AND ((s.gr * 2) % 18446744073709551616::HUGEINT + b.g) % 18446744073709551616::HUGEINT % 64 = 0) AS bnd
        |    FROM state s
        |    JOIN bytes b ON b.doc_id = s.doc_id AND b.pos = s.pos + 1
        |  )
        |), final AS (
        |  SELECT s.doc_id,
        |    CASE WHEN s.clen > 0 THEN list_append(s.hashes, s.chunk)
        |      ELSE s.hashes END AS hashes
        |  FROM state s
        |  JOIN norm n ON n.doc_id = s.doc_id AND s.pos = length(n.t)
        |), ch AS (
        |  SELECT DISTINCT doc_id, unnest(hashes) AS h FROM final
        |), rare AS (
        |  SELECT h FROM ch GROUP BY h HAVING COUNT(*) <= 1000
        |), kept AS (
        |  SELECT ch.doc_id, ch.h FROM ch JOIN rare USING (h)
        |)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS shared_chunks
        |FROM kept a JOIN kept b ON a.h = b.h AND a.doc_id < b.doc_id
        |GROUP BY 1, 2 HAVING COUNT(*) >= 1""".stripMargin,

    // brute-force ground truth: ALL pairs sharing >= 10 distinct word
    // 8-grams (the llm_decontaminate tokenization) — the registered
    // query must find every one of them through CDC candidates
    "dedup_passage_verified" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    list_filter(regexp_split_to_array(lower(text), '[^\p{L}\p{N}]+'),
        |                t -> length(t) > 0) AS tokens
        |  FROM documents
        |), g AS (
        |  SELECT doc_id, unnest(list_distinct(
        |    CASE WHEN len(tokens) >= 8 THEN
        |      list_transform(range(1, len(tokens) - 6),
        |        i -> concat_ws(' ', tokens[i], tokens[i+1], tokens[i+2],
        |                       tokens[i+3], tokens[i+4], tokens[i+5],
        |                       tokens[i+6], tokens[i+7]))
        |    ELSE [concat_ws(' ', tokens)] END)) AS g
        |  FROM toks WHERE len(tokens) > 0
        |)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  CAST(COUNT(*) AS INT) AS shared_ngrams
        |FROM g a JOIN g b ON a.g = b.g AND a.doc_id < b.doc_id
        |GROUP BY 1, 2 HAVING COUNT(*) >= 10""".stripMargin,

    // thresholds = cumulative weights on the 16-bit bucket:
    // round(0.90 * 65536) = 58982 = e666, round(0.95 * 65536) = 62259
    // = f333 — the same literals hashSplit bakes into the Spark plan
    "llm_hash_split" ->
      """SELECT doc_id, source,
        |  CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < 'e666'
        |         THEN 'train'
        |       WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < 'f333'
        |         THEN 'val'
        |       ELSE 'test' END AS split
        |FROM documents""".stripMargin,

    "llm_shuffle_pack" ->
      """SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS shuffle_key,
        |  CAST(n_tokens AS INT) AS n_tokens,
        |  CAST(tokens_before AS BIGINT) AS tokens_before,
        |  CAST(tokens_before // 512 AS BIGINT) AS bin_id,
        |  CAST(tokens_before % 512 AS BIGINT) AS bin_offset
        |FROM (
        |  SELECT doc_id,
        |    len(regexp_extract_all(text, '\S+')) AS n_tokens,
        |    COALESCE(SUM(len(regexp_extract_all(text, '\S+'))) OVER (
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS tokens_before
        |  FROM documents)""".stripMargin,

    "llm_split_contamination" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 2000000, text FROM documents WHERE doc_id % 10 = 0
        |), s AS (
        |  SELECT doc_id, text,
        |    CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < 'e666'
        |           THEN 'train'
        |         WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < 'f333'
        |           THEN 'val'
        |         ELSE 'test' END AS split
        |  FROM corpus
        |), ttoks AS (
        |  SELECT doc_id,
        |    list_filter(regexp_split_to_array(lower(text), '[^\p{L}\p{N}]+'),
        |                t -> length(t) > 0) AS tokens
        |  FROM s WHERE split = 'train'
        |), tgrams AS (
        |  SELECT DISTINCT unnest(
        |    CASE WHEN len(tokens) >= 8 THEN
        |      list_transform(range(1, len(tokens) - 6),
        |        i -> concat_ws(' ', tokens[i], tokens[i+1], tokens[i+2],
        |                       tokens[i+3], tokens[i+4], tokens[i+5],
        |                       tokens[i+6], tokens[i+7]))
        |    ELSE [concat_ws(' ', tokens)] END) AS g
        |  FROM ttoks WHERE len(tokens) > 0
        |), etoks AS (
        |  SELECT doc_id,
        |    list_filter(regexp_split_to_array(lower(text), '[^\p{L}\p{N}]+'),
        |                t -> length(t) > 0) AS tokens
        |  FROM s WHERE split <> 'train'
        |), egrams AS (
        |  SELECT doc_id, unnest(list_distinct(
        |    CASE WHEN len(tokens) >= 8 THEN
        |      list_transform(range(1, len(tokens) - 6),
        |        i -> concat_ws(' ', tokens[i], tokens[i+1], tokens[i+2],
        |                       tokens[i+3], tokens[i+4], tokens[i+5],
        |                       tokens[i+6], tokens[i+7]))
        |    ELSE [concat_ws(' ', tokens)] END)) AS g
        |  FROM etoks WHERE len(tokens) > 0
        |), hits AS (
        |  SELECT DISTINCT e.doc_id FROM egrams e JOIN tgrams t ON e.g = t.g
        |)
        |SELECT split, COUNT(*) AS n_docs,
        |  COUNT(*) FILTER (WHERE doc_id IN (SELECT doc_id FROM hits))
        |    AS n_contaminated
        |FROM s WHERE split <> 'train'
        |GROUP BY split""".stripMargin,

    "llm_global_shuffle" ->
      """SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS shuffle_key,
        |  row_number() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
        |    - 1 AS pos
        |FROM documents""".stripMargin,

    // Per-returnflag OLS of extendedprice on quantity through the
    // shared REGR_ tail; null-free fixture, so the Spark side's
    // pairwise-complete guards reduce to these plain sums.
    "lineitem_price_regression" ->
      ("""WITH xy AS (
        |  SELECT l_returnflag, CAST(l_quantity AS DOUBLE) AS x,
        |    CAST(l_extendedprice AS DOUBLE) AS y
        |  FROM lineitem
        |), s AS (
        |  SELECT l_returnflag,
        |    CAST(COUNT(*) AS BIGINT) AS n_rows, CAST(COUNT(*) AS DOUBLE) AS n,
        |    SUM(x) AS sx, SUM(y) AS sy, SUM(x * y) AS sxy,
        |    SUM(x * x) AS sxx, SUM(y * y) AS syy
        |  FROM xy GROUP BY 1
        |)
        |""".stripMargin + olsTailSql("l_returnflag")),

    "lineitem_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  ROUND(SUM(l_quantity), 2) AS sum_qty,
        |  ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
        |  ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |  ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)
        |    AS sum_charge,
        |  ROUND(AVG(l_quantity), 6) AS avg_qty,
        |  ROUND(AVG(l_extendedprice), 6) AS avg_price,
        |  ROUND(AVG(l_discount), 6) AS avg_disc,
        |  COUNT(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01'
        |GROUP BY 1, 2""".stripMargin,

    "events_funnel" ->
      """WITH f AS (
        |  SELECT user_id,
        |    min(ts) FILTER (WHERE event_type = 'click') AS first_from
        |  FROM events GROUP BY 1
        |), c AS (
        |  SELECT e.user_id, min(e.ts) AS first_to
        |  FROM events e JOIN f ON e.user_id = f.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts >= f.first_from
        |  GROUP BY 1
        |)
        |SELECT f.user_id,
        |  strftime(f.first_from, '%Y-%m-%d %H:%M:%S.%f') AS first_from,
        |  strftime(c.first_to, '%Y-%m-%d %H:%M:%S.%f') AS first_to,
        |  CAST(CASE WHEN c.first_to IS NOT NULL
        |    AND epoch_us(c.first_to) - epoch_us(f.first_from) <= 3600000000
        |    THEN 1 ELSE 0 END AS INT) AS converted
        |FROM f LEFT JOIN c ON f.user_id = c.user_id
        |WHERE f.first_from IS NOT NULL""".stripMargin,

    // transition oracle: lead over the same (ts, event_id) order.
    "events_transitions" ->
      """SELECT event_type, next_type, COUNT(*) AS n FROM (
        |  SELECT event_type,
        |    COALESCE(lead(event_type) OVER (
        |      PARTITION BY user_id ORDER BY ts, event_id), '__end__')
        |      AS next_type
        |  FROM events
        |) GROUP BY 1, 2""".stripMargin,

    // Weighted PageRank, 3 iterations unrolled (the kmeans_lloyd
    // treatment): edges/out-weights re-derived from the same lead()
    // window, each step = mass join + floor6 — the rank vector is
    // floor-rounded to 6dp BEFORE the next step in BOTH engines, so
    // the trajectory iterates on bit-identical doubles. Literals are
    // spelled 0.15 / 0.85 on both sides (decimal→double conversion
    // agrees; 1.0−0.85 would NOT — last-ulp difference).
    "events_pagerank" -> pageRankOracle,

    // volume-anomaly oracle: same two-level aggregate; stddev_samp ==
    // DuckDB stddev_samp, z rounded 6dp before the |z| > 3 compare.
    "events_volume_anomaly" ->
      """WITH daily AS (
        |  SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
        |    COUNT(*) AS n_events
        |  FROM events GROUP BY 1, 2
        |), m AS (
        |  SELECT event_type, AVG(n_events) AS mu,
        |    stddev_samp(n_events) AS sigma
        |  FROM daily GROUP BY 1
        |)
        |SELECT d.event_type, d.day, d.n_events,
        |  CASE WHEN m.sigma > 0
        |    THEN ROUND((d.n_events - m.mu) / m.sigma, 6) END AS z,
        |  CAST(CASE WHEN m.sigma > 0
        |      AND abs(ROUND((d.n_events - m.mu) / m.sigma, 6)) > 3.0
        |    THEN 1 ELSE 0 END AS INT) AS is_anomaly
        |FROM daily d JOIN m USING (event_type)""".stripMargin,

    // K-step funnel oracle: the chained earliest-qualifying-time
    // recurrence as explicit LEFT JOIN + MIN stages; NULL t2 nulls the
    // t3 comparison (e.ts >= NULL is never true) exactly like the
    // Spark side's null-propagating `when`.
    "events_funnel_steps" ->
      """WITH u1 AS (
        |  SELECT user_id, MIN(ts) AS t1
        |  FROM events WHERE event_type = 'view' GROUP BY 1
        |), u2 AS (
        |  SELECT u1.user_id, u1.t1, MIN(e.ts) AS t2
        |  FROM u1 LEFT JOIN events e
        |    ON e.user_id = u1.user_id AND e.event_type = 'click'
        |    AND e.ts >= u1.t1
        |  GROUP BY 1, 2
        |), u3 AS (
        |  SELECT u2.user_id, u2.t1, u2.t2, MIN(e.ts) AS t3
        |  FROM u2 LEFT JOIN events e
        |    ON e.user_id = u2.user_id AND e.event_type = 'purchase'
        |    AND e.ts >= u2.t2
        |  GROUP BY 1, 2, 3
        |)
        |SELECT user_id,
        |  strftime(t1, '%Y-%m-%d %H:%M:%S.%f') AS t1,
        |  strftime(t2, '%Y-%m-%d %H:%M:%S.%f') AS t2,
        |  strftime(t3, '%Y-%m-%d %H:%M:%S.%f') AS t3,
        |  CAST(CAST(t1 IS NOT NULL AS INT) + CAST(t2 IS NOT NULL AS INT)
        |    + CAST(t3 IS NOT NULL AS INT) AS INT) AS depth,
        |  CAST(CASE WHEN t3 IS NOT NULL
        |    AND epoch_us(t3) - epoch_us(t1) <= 86400000000
        |    THEN 1 ELSE 0 END AS INT) AS converted
        |FROM u3""".stripMargin,

    // weighted-sample oracle: the md5 16-bit bucket folded to an
    // integer by hex-digit positions, centered uniform, key = u^(1/w)
    // rounded 6dp, global top-100 by (key desc, id).
    "llm_weighted_sample" ->
      """WITH h AS (
        |  SELECT doc_id, source, n_chars,
        |    substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS hx
        |  FROM documents
        |), keyed AS (
        |  SELECT doc_id, source, n_chars,
        |    ROUND(pow(
        |      ((strpos('0123456789abcdef', hx[1]) - 1) * 4096.0
        |       + (strpos('0123456789abcdef', hx[2]) - 1) * 256.0
        |       + (strpos('0123456789abcdef', hx[3]) - 1) * 16.0
        |       + (strpos('0123456789abcdef', hx[4]) - 1) + 0.5) / 65536.0,
        |      1.0 / GREATEST(CAST(n_chars AS DOUBLE), 1e-9)), 6)
        |      AS sample_key
        |  FROM h
        |)
        |SELECT doc_id, source, n_chars, sample_key FROM keyed
        |ORDER BY sample_key DESC, doc_id LIMIT 100""".stripMargin,

    "revenue_rollup" ->
      """WITH per_order AS (
        |  SELECT l_orderkey,
        |    SUM(l_extendedprice * (1 - l_discount)) AS order_rev
        |  FROM lineitem WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  GROUP BY 1
        |)
        |SELECT COALESCE(n2.r_name, 'ALL') AS r_name,
        |  COALESCE(n2.n_name, 'ALL') AS n_name,
        |  CAST(2 * GROUPING(n2.r_name) + GROUPING(n2.n_name) AS INT)
        |    AS grouping_id,
        |  ROUND(SUM(n2.order_rev), 2) AS revenue,
        |  COUNT(*) AS n_orders
        |FROM (
        |  SELECT r.r_name, n.n_name, p.order_rev
        |  FROM per_order p
        |  JOIN orders o ON p.l_orderkey = o.o_orderkey
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN nation n ON c.c_nationkey = n.n_nationkey
        |  JOIN region r ON n.n_regionkey = r.r_regionkey
        |) n2
        |GROUP BY ROLLUP(n2.r_name, n2.n_name)""".stripMargin,

    "events_pivot" ->
      """SELECT strftime(ts, '%Y-%m-%d') AS day,
        |  COUNT(*) FILTER (WHERE event_type = 'click') AS click,
        |  COUNT(*) FILTER (WHERE event_type = 'view') AS view,
        |  COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
        |  COUNT(*) FILTER (WHERE event_type = 'signup') AS signup,
        |  COUNT(*) FILTER (WHERE event_type = 'error') AS error
        |FROM events GROUP BY 1""".stripMargin,

    // same scored CTE as llm_source_quota (oracle-proven 6dp quality
    // arithmetic); ntile over the identical total order
    "llm_quality_quartiles" ->
      """WITH raw AS (
        |  SELECT doc_id, source, text,
        |    regexp_extract_all(lower(text), '[\p{L}]+') AS words,
        |    GREATEST(length(text), 1) AS n_chars
        |  FROM documents
        |), d AS (
        |  SELECT doc_id, source,
        |    CAST(len(words) AS INT) AS n_words,
        |    CAST(len(list_filter(words, w -> list_contains(
        |      ['the','of','and','to','in','is','that','it','was','for','on','are','with','as','this'], w))) AS DOUBLE)
        |      / GREATEST(len(words), 1) AS stop_ratio,
        |    CAST(length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')) AS DOUBLE) / n_chars AS p_ratio,
        |    CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS DOUBLE) / n_chars AS d_ratio
        |  FROM raw
        |), q AS (
        |  SELECT doc_id, source,
        |    ROUND(
        |      LEAST(1.0, CAST(n_words AS DOUBLE) / 20.0)
        |      * LEAST(1.0, stop_ratio * 5.0)
        |      * (1.0 - LEAST(1.0, p_ratio * 3.0))
        |      * (1.0 - LEAST(1.0, d_ratio * 3.0)), 6) AS quality_score
        |  FROM d
        |)
        |SELECT doc_id, source, quality_score,
        |  CAST(ntile(4) OVER (
        |    PARTITION BY source
        |    ORDER BY quality_score DESC, doc_id) AS INT) AS quartile
        |FROM q""".stripMargin,

    "llm_sample_by_source" ->
      """SELECT doc_id, source, sample_key,
        |  CAST(sample_rank AS INT) AS sample_rank
        |FROM (
        |  SELECT doc_id, source,
        |    substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS sample_key,
        |    row_number() OVER (
        |      PARTITION BY source
        |      ORDER BY substr(md5(CAST(doc_id AS VARCHAR)), 1, 4), doc_id)
        |      AS sample_rank
        |  FROM documents)
        |WHERE sample_rank <= 3""".stripMargin,

    "events_retention" ->
      """WITH c AS (
        |  SELECT user_id,
        |    min(ts) FILTER (WHERE event_type = 'signup') AS cohort_ts
        |  FROM events GROUP BY 1
        |)
        |SELECT strftime(c.cohort_ts, '%Y-%m-%d') AS cohort_day,
        |  CAST(datediff('day', CAST(c.cohort_ts AS DATE),
        |                CAST(e.ts AS DATE)) AS INT) AS day_offset,
        |  COUNT(DISTINCT e.user_id) AS n_users
        |FROM events e JOIN c ON e.user_id = c.user_id
        |WHERE c.cohort_ts IS NOT NULL
        |  AND CAST(e.ts AS DATE) >= CAST(c.cohort_ts AS DATE)
        |GROUP BY 1, 2""".stripMargin,

    // One SELECT per profiled column; the CASE mirrors the in-flight
    // planted-null column. min/max casts render identically: BIGINTs
    // have one decimal form, timestamps are midnight-only (no
    // fractional seconds) and both sessions run UTC.
    // histogram oracle: same bounds, same single-op bucket assignment,
    // same half-away-from-zero 6dp edge rounding, spine from range().
    "profile_histogram" ->
      """WITH b AS (
        |  SELECT MIN(l_extendedprice) AS mn, MAX(l_extendedprice) AS mx
        |  FROM lineitem WHERE l_extendedprice IS NOT NULL
        |), binned AS (
        |  SELECT LEAST(19, CAST(floor(
        |    (l_extendedprice - b.mn) / ((b.mx - b.mn) / 20)) AS INT))
        |    AS bin_id
        |  FROM lineitem, b WHERE l_extendedprice IS NOT NULL
        |), cnt AS (
        |  SELECT bin_id, COUNT(*) AS n FROM binned GROUP BY 1
        |), spine AS (
        |  SELECT unnest(range(0, 20)) AS bin_id
        |)
        |SELECT CAST(s.bin_id AS INT) AS bin_id,
        |  ROUND(b.mn + s.bin_id * ((b.mx - b.mn) / 20), 6) AS lo,
        |  ROUND(b.mn + (s.bin_id + 1) * ((b.mx - b.mn) / 20), 6) AS hi,
        |  COALESCE(c.n, 0) AS n
        |FROM spine s CROSS JOIN b LEFT JOIN cnt c USING (bin_id)""".stripMargin,

    // equi-depth twin: octile cuts via quantile_cont over integer
    // cents (every interpolated cut is an exact multiple of 1/8 in
    // double — see Profile.equidepth scaladoc), then the same
    // 1 + SUM(x > cut) bin rule. No rounding anywhere.
    "profile_equidepth" ->
      """WITH c AS (
        |  SELECT CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS cents
        |  FROM lineitem WHERE l_extendedprice IS NOT NULL
        |), q AS (
        |  SELECT quantile_cont(cents, 0.125) AS q1,
        |         quantile_cont(cents, 0.250) AS q2,
        |         quantile_cont(cents, 0.375) AS q3,
        |         quantile_cont(cents, 0.500) AS q4,
        |         quantile_cont(cents, 0.625) AS q5,
        |         quantile_cont(cents, 0.750) AS q6,
        |         quantile_cont(cents, 0.875) AS q7
        |  FROM c
        |), binned AS (
        |  SELECT CAST(1
        |    + CAST(cents > q.q1 AS INT) + CAST(cents > q.q2 AS INT)
        |    + CAST(cents > q.q3 AS INT) + CAST(cents > q.q4 AS INT)
        |    + CAST(cents > q.q5 AS INT) + CAST(cents > q.q6 AS INT)
        |    + CAST(cents > q.q7 AS INT) AS INT) AS bin_id,
        |    CAST(cents AS DOUBLE) AS x
        |  FROM c CROSS JOIN q
        |)
        |SELECT bin_id, COUNT(*) AS n, MIN(x) AS min_val, MAX(x) AS max_val
        |FROM binned GROUP BY 1""".stripMargin,

    "profile_table" ->
      """WITH o AS (
        |  SELECT *,
        |    CASE WHEN o_orderkey % 7 = 0 THEN NULL
        |         ELSE o_orderstatus END AS o_status_sparse
        |  FROM orders
        |)
        |SELECT 'o_orderkey' AS column_name, count(*) AS n_rows,
        |  count(*) - count(o_orderkey) AS n_nulls,
        |  count(DISTINCT o_orderkey) AS n_distinct,
        |  CAST(min(o_orderkey) AS VARCHAR) AS min_val,
        |  CAST(max(o_orderkey) AS VARCHAR) AS max_val
        |FROM o
        |UNION ALL
        |SELECT 'o_custkey', count(*), count(*) - count(o_custkey),
        |  count(DISTINCT o_custkey),
        |  CAST(min(o_custkey) AS VARCHAR), CAST(max(o_custkey) AS VARCHAR)
        |FROM o
        |UNION ALL
        |SELECT 'o_orderstatus', count(*), count(*) - count(o_orderstatus),
        |  count(DISTINCT o_orderstatus),
        |  CAST(min(o_orderstatus) AS VARCHAR),
        |  CAST(max(o_orderstatus) AS VARCHAR)
        |FROM o
        |UNION ALL
        |SELECT 'o_orderpriority', count(*),
        |  count(*) - count(o_orderpriority),
        |  count(DISTINCT o_orderpriority),
        |  CAST(min(o_orderpriority) AS VARCHAR),
        |  CAST(max(o_orderpriority) AS VARCHAR)
        |FROM o
        |UNION ALL
        |SELECT 'o_orderdate', count(*), count(*) - count(o_orderdate),
        |  count(DISTINCT o_orderdate),
        |  CAST(min(o_orderdate) AS VARCHAR),
        |  CAST(max(o_orderdate) AS VARCHAR)
        |FROM o
        |UNION ALL
        |SELECT 'o_status_sparse', count(*),
        |  count(*) - count(o_status_sparse),
        |  count(DISTINCT o_status_sparse),
        |  CAST(min(o_status_sparse) AS VARCHAR),
        |  CAST(max(o_status_sparse) AS VARCHAR)
        |FROM o""".stripMargin,

    // Same tokenization as word_ngrams (lowercase, [\p{L}\p{N}]+ runs);
    // bigrams via 1-indexed sliding windows. Docs under 2 tokens
    // contribute nothing on either side.
    "text_top_ngrams" ->
      """WITH toks AS (
        |  SELECT regexp_extract_all(lower(text), '[\p{L}\p{N}]+') AS w
        |  FROM documents
        |), g AS (
        |  SELECT unnest(list_transform(range(1, len(w)),
        |                               i -> w[i] || ' ' || w[i + 1])) AS gram
        |  FROM toks WHERE len(w) >= 2
        |)
        |SELECT gram, count(*) AS cnt FROM g GROUP BY gram
        |ORDER BY cnt DESC, gram LIMIT 50""".stripMargin,

    // Misra-Gries in its exact regime equals the exact GROUP BY twin;
    // max_error = 0 is pinned as an output column — any sketch
    // overflow would both perturb cnt (lower bound < true) and raise
    // max_error, failing the hash twice over.
    // the incremental row shares the one-shot sketch's oracle verbatim:
    // history-sketch -> persist -> reload -> merge with the new batch
    // must land on the same exact top-50 as one pass over everything.
    "text_heavy_hitters_incremental" -> heavyHittersOracle,

    // PMI collocations re-derived end-to-end: distinct (doc, term),
    // df, top-30 head, doc-keyed pair self-join with t1 < t2, exact
    // counts, ln of the all-double ratio (BIGINT c_x·c_y would
    // overflow at web scale — both engines spell double products),
    // 6dp pre-rank, (pmi DESC, t1, t2) total order.
    "text_pmi_collocations" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    list_filter(regexp_split_to_array(lower(text), '[^\p{L}\p{N}]+'),
        |                t -> length(t) > 0) AS tokens
        |  FROM documents
        |), dt AS (
        |  SELECT DISTINCT doc, term FROM (
        |    SELECT doc_id AS doc, unnest(tokens) AS term FROM toks)
        |), nd AS (
        |  SELECT CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS n FROM documents
        |), dfx AS (
        |  SELECT term, COUNT(*) AS df_docs FROM dt GROUP BY 1
        |), head AS (
        |  SELECT term, df_docs FROM dfx ORDER BY df_docs DESC, term LIMIT 30
        |), hd AS (
        |  SELECT dt.doc, dt.term, h.df_docs FROM dt JOIN head h USING (term)
        |), pairs AS (
        |  SELECT a.term AS t1, b.term AS t2,
        |    a.df_docs AS c_x, b.df_docs AS c_y, COUNT(*) AS c_xy
        |  FROM hd a JOIN hd b ON a.doc = b.doc AND a.term < b.term
        |  GROUP BY 1, 2, 3, 4
        |  HAVING COUNT(*) >= 2
        |), scored AS (
        |  SELECT t1, t2, c_x, c_y, c_xy,
        |    ROUND(ln(n.n * c_xy
        |      / (CAST(c_x AS DOUBLE) * CAST(c_y AS DOUBLE))), 6) AS pmi
        |  FROM pairs CROSS JOIN nd n
        |)
        |SELECT t1, t2, c_x, c_y, c_xy, pmi, CAST(rnk AS INT) AS rank
        |FROM (
        |  SELECT *, row_number() OVER (ORDER BY pmi DESC, t1, t2) AS rnk
        |  FROM scored
        |) WHERE rnk <= 50""".stripMargin,

    // PSI drift re-derived end-to-end: integer-µs time split, the
    // same precomputed-width binning values (a/(b/10.0) divides to
    // the identical double), spine LEFT JOIN so empty bins surface,
    // eps-floored shares, (p_a−p_b)·ln(p_a/p_b) terms + the window
    // total.
    "events_value_drift" ->
      """WITH base AS (
        |  SELECT CAST(value AS DOUBLE) AS v, epoch_us(ts) AS t
        |  FROM events WHERE value IS NOT NULL AND ts IS NOT NULL
        |), st AS (
        |  SELECT MIN(v) AS vmin, MAX(v) AS vmax,
        |    MIN(t) AS tlo, MAX(t) AS thi FROM base
        |), binned AS (
        |  SELECT LEAST(9, CAST(FLOOR(
        |      (b.v - st.vmin) / ((st.vmax - st.vmin) / 10.0)) AS INT)) AS bin,
        |    b.t < st.tlo + (st.thi - st.tlo) // 2 AS first_half
        |  FROM base b CROSS JOIN st
        |), counts AS (
        |  SELECT bin,
        |    CAST(COUNT(*) FILTER (WHERE first_half) AS BIGINT) AS n_a,
        |    CAST(COUNT(*) FILTER (WHERE NOT first_half) AS BIGINT) AS n_b
        |  FROM binned GROUP BY 1
        |), spine AS (
        |  SELECT unnest(range(10)) AS bin
        |), filled AS (
        |  SELECT CAST(s.bin AS INT) AS bin,
        |    COALESCE(c.n_a, 0) AS n_a, COALESCE(c.n_b, 0) AS n_b
        |  FROM spine s LEFT JOIN counts c ON s.bin = c.bin
        |), tot AS (
        |  SELECT CAST(SUM(n_a) AS BIGINT) AS tot_a,
        |    CAST(SUM(n_b) AS BIGINT) AS tot_b FROM filled
        |), shares AS (
        |  SELECT bin, n_a, n_b,
        |    GREATEST(CAST(n_a AS DOUBLE) / CAST(tot_a AS DOUBLE), 0.0001)
        |      AS pa,
        |    GREATEST(CAST(n_b AS DOUBLE) / CAST(tot_b AS DOUBLE), 0.0001)
        |      AS pb
        |  FROM filled CROSS JOIN tot
        |), terms AS (
        |  SELECT bin, n_a, n_b, pa, pb, (pa - pb) * ln(pa / pb) AS term
        |  FROM shares
        |)
        |SELECT bin, n_a, n_b, ROUND(pa, 6) AS p_a, ROUND(pb, 6) AS p_b,
        |  ROUND(term, 6) AS psi_term,
        |  ROUND(SUM(term) OVER (), 6) AS psi_total
        |FROM terms""".stripMargin,

    // Key-skew profile: integer count legs (per-key counts, top-10
    // mass via the same (cnt DESC, key) order, totals) with the three
    // derived shares divided in the spelled order.
    "profile_key_skew" ->
      """WITH counts AS (
        |  SELECT user_id, COUNT(*) AS cnt FROM events
        |  WHERE user_id IS NOT NULL GROUP BY 1
        |), t10 AS (
        |  SELECT CAST(SUM(cnt) AS BIGINT) AS top10_cnt FROM (
        |    SELECT cnt FROM counts ORDER BY cnt DESC, user_id LIMIT 10)
        |), s AS (
        |  SELECT CAST(SUM(cnt) AS BIGINT) AS n_rows,
        |    CAST(COUNT(*) AS BIGINT) AS n_keys,
        |    CAST(MAX(cnt) AS BIGINT) AS max_cnt
        |  FROM counts
        |)
        |SELECT n_rows, n_keys, max_cnt,
        |  ROUND(CAST(max_cnt AS DOUBLE) / CAST(n_rows AS DOUBLE), 6)
        |    AS top1_share,
        |  ROUND(CAST(top10_cnt AS DOUBLE) / CAST(n_rows AS DOUBLE), 6)
        |    AS top10_share,
        |  ROUND(CAST(max_cnt AS DOUBLE)
        |    / (CAST(n_rows AS DOUBLE) / CAST(n_keys AS DOUBLE)), 6)
        |    AS skew_ratio
        |FROM s CROSS JOIN t10""".stripMargin,

    "text_heavy_hitters_sketch" -> heavyHittersOracle,

    // Count-Min build row and its persist/merge lifecycle twin share
    // one oracle — see [[countMinOracle]] for why the merge is the
    // identity.
    "text_count_min" -> countMinOracle,
    "text_count_min_merged" -> countMinOracle,
    // ... and the streaming twin: counter addition is
    // batch-split-invariant, so the streamed sketch IS the batch
    // sketch and the same oracle adjudicates all three.
    "stream_count_min" -> countMinOracle,

    // Zipf head fit: top-500 by (cnt DESC, term), ln/ln OLS through
    // the shared REGR_ tail.
    "text_zipf_fit" ->
      ("""WITH toks AS (
        |  SELECT list_filter(regexp_split_to_array(lower(text), '[^\p{L}\p{N}]+'),
        |                     t -> length(t) > 0) AS tokens
        |  FROM documents
        |), terms AS (
        |  SELECT unnest(tokens) AS term FROM toks
        |), cnts AS (
        |  SELECT term, COUNT(*) AS cnt FROM terms GROUP BY 1
        |), head AS (
        |  SELECT term, cnt FROM cnts ORDER BY cnt DESC, term LIMIT 500
        |), ranked AS (
        |  SELECT
        |    ln(CAST(row_number() OVER (ORDER BY cnt DESC, term) AS DOUBLE)) AS x,
        |    ln(CAST(cnt AS DOUBLE)) AS y
        |  FROM head
        |), s AS (
        |  SELECT 'all' AS group_key,
        |    CAST(COUNT(*) AS BIGINT) AS n_rows, CAST(COUNT(*) AS DOUBLE) AS n,
        |    SUM(x) AS sx, SUM(y) AS sy, SUM(x * y) AS sxy,
        |    SUM(x * x) AS sxx, SUM(y * y) AS syy
        |  FROM ranked
        |)
        |""".stripMargin + olsTailSql("group_key")),

    // The streaming MG aggregate's final COMPLETE-mode sketch equals
    // the batch sketch (exact regime ⇒ merge-order-independent), so it
    // shares the same exact-GROUP-BY oracle.
    "stream_heavy_hitters" -> heavyHittersOracle,

    // The streaming KMV final state is micro-batch-split-independent
    // in EVERY regime (min-k of a set), so the stream shares the
    // batch estimator restatement — estimate included, not gated.
    "stream_cardinality_kmv" ->
      """WITH h AS (
        |  SELECT DISTINCT event_type,
        |    ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS hv
        |  FROM events WHERE user_id IS NOT NULL
        |), r AS (
        |  SELECT event_type, hv,
        |    row_number() OVER (PARTITION BY event_type ORDER BY hv) AS rn,
        |    COUNT(*) OVER (PARTITION BY event_type) AS nd
        |  FROM h
        |), est AS (
        |  SELECT event_type,
        |    CASE WHEN nd < 64 THEN CAST(nd AS DOUBLE)
        |         ELSE (64 - 1) * pow(2.0, 60) / CAST(hv AS DOUBLE) END
        |      AS n_users_est
        |  FROM r WHERE rn = LEAST(nd, 64)
        |), ex AS (
        |  SELECT event_type, COUNT(*) AS n_events
        |  FROM events WHERE user_id IS NOT NULL GROUP BY 1
        |)
        |SELECT ex.event_type, ex.n_events, est.n_users_est
        |FROM ex JOIN est USING (event_type)""".stripMargin,

    // Planted-orphan referential check (literal twin of the in-flight
    // +900M re-keying).
    "quality_orphans" ->
      """WITH li AS (
        |  SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        |  UNION ALL
        |  SELECT l_orderkey + 900000000, l_linenumber, l_quantity
        |  FROM lineitem WHERE l_orderkey % 97 = 0
        |)
        |SELECT l_orderkey, l_linenumber, l_quantity
        |FROM li
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM orders o WHERE o.o_orderkey = li.l_orderkey)""".stripMargin,
  )
}
