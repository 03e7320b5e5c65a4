package graft

/** Oracle SQL for the text analysis/features family (stats, quality, tfidf, bm25, bpe, perplexity, sketches) and its streaming twins.
  * Split from the single-file registry (r15 verdict item 7); every key
  * mirrors a [[SparkEntry.queries]] registration with IDENTICAL column
  * names/aliases. Shared CTE derivations live in [[OracleSqlShared]]. */
private[graft] object OracleSqlText {
  import OracleSqlShared._
  import SparkEntry.{ScoringCoefficients, ScoringIntercepts, PcaScoringLoadings}
  import graft.features.DimReduction

  // Seq, not Map (r17 advice #5 applied to the oracle registry too):
  // a within-family duplicate key survives to OracleSql.all's
  // duplicate require instead of last-wins-collapsing silently.
  val entries: Seq[(String, String)] = Seq(
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

    "text_bm25_write" -> bm25WriteOracle,

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

    // the streaming scorer leg answers the same oracle verbatim: the
    // streamed stream-static joins + complete-mode aggregate compose
    // the identical frames as the batch train-then-score path
    "stream_perplexity" -> crossPerplexityOracle,

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

    // The DELETE leg (round 18): the same bm25 chain with the
    // CORPUS-side CTEs (dl, tfc — hence stats/dfx downstream)
    // restricted to survivors while the query CTE keeps the full doc
    // set (a taken-down doc may still be used as a query). Surgical
    // edits of the shared chain so the scoring arithmetic is stated
    // once; delete-then-score must equal build-on-survivors.
    "text_bm25_delete" -> (bm25CtesSql
      .replace("  SELECT doc_id, len(ws) AS dl FROM toks\n",
        "  SELECT doc_id, len(ws) AS dl FROM toks" +
          " WHERE doc_id % 7 <> 3\n")
      .replace("  FROM (SELECT doc_id, unnest(ws) AS term FROM toks)\n",
        "  FROM (SELECT doc_id, unnest(ws) AS term FROM toks\n" +
          "        WHERE doc_id % 7 <> 3)\n") + """
      |SELECT query_id, doc_id, CAST(rnk AS INT) AS rank, bm25
      |FROM (
      |  SELECT *, row_number() OVER (
      |    PARTITION BY query_id ORDER BY bm25 DESC, doc_id) AS rnk
      |  FROM scored
      |) WHERE rnk <= 10""".stripMargin),

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
  )
}
