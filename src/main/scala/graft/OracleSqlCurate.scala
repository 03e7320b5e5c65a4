package graft

/** Oracle SQL for the llm_* curation family (mixing, quotas, decontamination, splits, attrition).
  * Split from the single-file registry (r15 verdict item 7); every key
  * mirrors a [[SparkEntry.queries]] registration with IDENTICAL column
  * names/aliases. Shared CTE derivations live in [[OracleSqlShared]]. */
private[graft] object OracleSqlCurate {
  import OracleSqlShared._
  import SparkEntry.{ScoringCoefficients, ScoringIntercepts, PcaScoringLoadings}
  import graft.features.DimReduction

  // Seq, not Map (r17 advice #5 applied to the oracle registry too):
  // a within-family duplicate key survives to OracleSql.all's
  // duplicate require instead of last-wins-collapsing silently.
  val entries: Seq[(String, String)] = Seq(
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
  )
}
