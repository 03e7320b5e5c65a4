package graft

/** Shared CTE constants and SQL helpers for the family-split oracle
  * registry (r15 verdict item 7: OracleSql.scala passed 4,500 lines).
  * Each arithmetic derivation that several oracle twins restate lives
  * here exactly once; the per-family OracleSql* objects import this
  * wholesale so entry text is unchanged from the single-file layout.
  * Scala constants both engines interpolate (frozen scoring
  * coefficients, PCA loadings) stay in [[SparkEntry]] and are
  * referenced from here so the two sides cannot drift. */
private[graft] object OracleSqlShared {
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
  private[graft] val ivfAssignCtesSql: String =
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
  private[graft] val similarityIvfBuildOracle: String =
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
  private[graft] val ivfProbeScoredCtesSql: String =
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

  private[graft] val ivfHashInitOracle: String =
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
  private[graft] def annRecallTailSql(scoreCol: String): String =
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

  private[graft] val ivfRecallOracle: String =
    ivfAssignCtesSql + ivfProbeScoredCtesSql + annRecallTailSql("cosine")

  /** Shared by text_perplexity_cross and text_perplexity_persisted (the
    * model write → reload → score round-trip must be the identity). */
  private[graft] val crossPerplexityOracle: String =
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
  private[graft] val bm25CtesSql: String =
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
  private[graft] val eventsSessionizeOracle: String =
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

  private[graft] val eventsAttributionOracle: String =
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
  private[graft] def bpeOracle(finalSelect: String): String = {
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

  private[graft] val heavyHittersOracle: String =
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

  private[graft] val eventsWindowOracle: String =
    """SELECT strftime(time_bucket(INTERVAL 1 HOUR, ts), '%Y-%m-%d %H:%M:%S') AS window_start,
      |  strftime(time_bucket(INTERVAL 1 HOUR, ts) + INTERVAL 1 HOUR, '%Y-%m-%d %H:%M:%S') AS window_end,
      |  event_type, COUNT(*) AS n_events,
      |  ROUND(SUM(value), 6) AS total_value
      |FROM events GROUP BY 1, 2, 3""".stripMargin

  private[graft] val bm25Oracle: String =
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
  private[graft] val bm25WriteOracle: String =
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
  private[graft] val ivfPqAssignCtesSql: String =
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

  private[graft] val similarityIvfPqBuildOracle: String =
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
  private[graft] val ivfPqProbeScoredCtesSql: String =
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
  private[graft] val ivfPqRecallOracle: String =
    ivfPqAssignCtesSql + ivfPqProbeScoredCtesSql + annRecallTailSql("pq_score")

  /** The full SQ8 index re-derived in SQL up to its `scored` CTE:
    * per-dim exact min/max bounds, half-UP quantize to 0..255
    * (floor(v + 0.5) — spelled identically in SqEncode.compute),
    * reconstruction, ADC dot against the raw query,
    * reconstructed-norm cosine, 6dp pre-rank rounding. Shared by the
    * top-10 row (`similarity_sq8`) and its recall row (r15). */
  private[graft] val sq8ScoredCtesSql: String =
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
  private[graft] val pqScoredCtesSql: String =
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
  private[graft] def sqlD(d: Double): String = d.toString
  private[graft] val customerXs = Seq("CAST(c_acctbal AS DOUBLE)",
    "CAST(c_nationkey AS DOUBLE)", "CAST(c_custkey AS DOUBLE)")

  private[graft] val pcaScoringOracle: String = {
    val projs = PcaScoringLoadings.zipWithIndex.map { case (w, j) =>
      val sum = customerXs.zip(w)
        .map { case (x, wi) => s"$x * ${sqlD(wi)}" }.mkString(" + ")
      s"ROUND($sum, 6) AS pca_$j"
    }
    s"""SELECT c_custkey, c_acctbal, c_nationkey,
       |  ${projs.mkString(",\n  ")}
       |FROM customer""".stripMargin
  }

  private[graft] val probabilityScoringOracle: String = {
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

  private[graft] val kmeansHashInitOracle: String = {
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
  private[graft] def kmeansLloydOracle(steps: Int): String = {
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
  private[graft] val simhashPairsOracle: String =
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
  private[graft] val simhashFpCtesSql: String =
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
  private[graft] def simhashStarLinkCtesSql(bands: Int): String = {
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
  private[graft] val simhashMultiprobeLinkCtesSql: String =
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

  private[graft] val simhashStarOracle: String =
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
  private[graft] def simhashSurvivorCtesSql(collapseHamming: Int): String =
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
  private[graft] val sampleQuantilesOracle: String =
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
  private[graft] val pageRankOracle: String = {
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
        |  SELECT node, CAST(1000000 AS BIGINT) AS pri FROM nodes
        |)""".stripMargin
    base + pageRankStepsSql + pageRankTailSql("event_type")
  }

  /** The FIXED-POINT PageRank iteration (r16, shared by the events
    * and corpus rows): micro-rank BIGINTs, per-edge floor
    * contributions, INTEGER mass sums (associative — summation order
    * cannot move them), and one spelled double expression per step
    * over bit-identical integer inputs. The double-mass recipe broke
    * at corpus scale: multi-term sums of 6dp short decimals sit ON
    * the 6dp half boundary where cross-engine summation order flips
    * the round. */
  private[graft] def pageRankStepsSql: String =
    (1 to 3).map { t =>
      s""", m$t AS (
         |  SELECT we.dst AS node,
         |    CAST(SUM(CAST(floor(p.pri * we.n / we.w_out) AS BIGINT))
         |      AS BIGINT) AS mass
         |  FROM pr${t - 1} p JOIN we ON p.node = we.src GROUP BY 1
         |), pr$t AS (
         |  SELECT n.node,
         |    CAST(floor((0.15 + 0.85 * (COALESCE(m.mass, 0) / 1000000.0))
         |      * 1000000.0 + 0.5) AS BIGINT) AS pri
         |  FROM nodes n LEFT JOIN m$t m USING (node)
         |)""".stripMargin
    }.mkString

  private[graft] def pageRankTailSql(nodeAlias: String): String =
    s"""
       |SELECT p0.node AS $nodeAlias,
       |  p0.pri / 1000000.0 AS pr_0, p1.pri / 1000000.0 AS pr_1,
       |  p2.pri / 1000000.0 AS pr_2, p3.pri / 1000000.0 AS pr_3
       |FROM pr0 p0 JOIN pr1 p1 USING (node) JOIN pr2 p2 USING (node)
       |  JOIN pr3 p3 USING (node)""".stripMargin

  /** Count-Min sketch re-derived end-to-end: same tokenization as
    * text_tfidf_exact, the d=4 hash rows from the shared 60-bit md5
    * recipe ("i:term") mod w=128, counters by (depth, bucket) GROUP
    * BY, probes = top-20 exact terms, estimate = MIN over the 4
    * counters with absent cells reading 0. Shared VERBATIM by
    * text_count_min_merged: counter matrices add and group-sums of a
    * disjoint split equal the total sums, so the persist/merge
    * lifecycle must reproduce the one-shot build exactly. */
  private[graft] val countMinOracle: String =
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
  private[graft] val randomProjectionOracle: String = {
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
  private[graft] def olsTailSql(groupCol: String): String =
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
  private[graft] val curateScoredCtesSql: String =
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
  private[graft] val langIdCtesSql: String =
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
  private[graft] val mmrOracle: String = {
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
  private[graft] val dhashRowsCtesSql: String = {
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

  private[graft] val dhashOracle: String =
    dhashRowsCtesSql + """
      |SELECT b.doc_id, CAST(1 AS INT) AS is_bmp, b.w AS width,
      |  b.h AS height, h.d0, h.d1, h.d2, h.d3, h.d4, h.d5, h.d6, h.d7
      |FROM hashes h JOIN bmp b USING (doc_id)""".stripMargin

  private[graft] val dhashPairsCtesSql: String = {
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

  private[graft] val dhashPairsOracle: String =
    dhashPairsCtesSql + """
      |SELECT id_a, id_b, hamming FROM phpairs""".stripMargin

  /** Components over the star+near edge set: the dedup_components
    * recursive-closure recipe (min label over transitive reach) on
    * the image modality. */
  private[graft] val dhashClustersOracle: String =
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
}
