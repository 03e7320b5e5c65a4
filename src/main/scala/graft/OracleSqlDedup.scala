package graft

/** Oracle SQL for the dedup family (exact/minhash/simhash/embedding/passage/edit) and its streaming twins.
  * Split from the single-file registry (r15 verdict item 7); every key
  * mirrors a [[SparkEntry.queries]] registration with IDENTICAL column
  * names/aliases. Shared CTE derivations live in [[OracleSqlShared]]. */
private[graft] object OracleSqlDedup {
  import OracleSqlShared._
  import SparkEntry.{ScoringCoefficients, ScoringIntercepts, PcaScoringLoadings}
  import graft.features.DimReduction

  // Seq, not Map (r17 advice #5 applied to the oracle registry too):
  // a within-family duplicate key survives to OracleSql.all's
  // duplicate require instead of last-wins-collapsing silently.
  val entries: Seq[(String, String)] = Seq(
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

    // soft-dedup weights: the clusters row's edge set + recursive
    // closure, then a per-component size fold — weight = 1/size in the
    // family's half-safe floor-6dp form (identical IEEE arithmetic on
    // the exact integer size in both engines). Docs outside every
    // cluster are their own singleton at weight 1.
    "dedup_cluster_weights" ->
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
        |), sizes AS (
        |  SELECT component, CAST(COUNT(*) AS BIGINT) AS csize
        |  FROM comps GROUP BY 1
        |)
        |SELECT d.doc_id,
        |  COALESCE(c.component, d.doc_id) AS cluster,
        |  COALESCE(s.csize, 1) AS cluster_size,
        |  floor(1.0 / COALESCE(s.csize, 1) * 1000000.0 + 0.5) / 1000000.0
        |    AS weight
        |FROM documents d
        |LEFT JOIN comps c ON c.id = d.doc_id
        |LEFT JOIN sizes s ON s.component = c.component""".stripMargin,

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

    // Incremental simhash dedup (r16): brute-force NOT EXISTS rules
    // over the re-derived fingerprints — a batch doc survives iff no
    // history doc and no smaller-id batch doc sits within hamming 3.
    // Exact because the Spark side's unsalted multiprobe banding has
    // guaranteed recall to hamming <= 7. Output carries the
    // fingerprint itself, so the row also re-proves the fp arithmetic.
    "dedup_simhash_incremental" -> (simhashFpCtesSql + """
      |, batch AS (
      |  SELECT doc_id, fp FROM fpl WHERE doc_id % 10 >= 8
      |), hist AS (
      |  SELECT doc_id, fp FROM fpl WHERE doc_id % 10 < 8
      |)
      |SELECT b.doc_id, b.fp AS simhash
      |FROM batch b
      |WHERE NOT EXISTS (
      |    SELECT 1 FROM hist h WHERE bit_count(xor(b.fp, h.fp)) <= 3)
      |  AND NOT EXISTS (
      |    SELECT 1 FROM batch b2 WHERE b2.doc_id < b.doc_id
      |      AND bit_count(xor(b.fp, b2.fp)) <= 3)""".stripMargin),

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

    // Streaming cosine keeper (r16): brute-force keep-min survivors
    // at cosine >= 0.99 over the corpus + the three in-flight planted
    // vectors — exact on this fixture for the dedup_embedding_pairs
    // reasons (seeded LSH recall, thresholds far from every cosine).
    "stream_embed_near" ->
      """WITH base AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
        |), planted AS (
        |  SELECT vec_id, e FROM base
        |  UNION ALL
        |  SELECT CAST(900001 AS BIGINT), list_prepend(e[1] + 1e-4, e[2:])
        |  FROM base WHERE vec_id = 0
        |  UNION ALL
        |  SELECT CAST(900002 AS BIGINT), list_transform(e, x -> -x)
        |  FROM base WHERE vec_id = 5
        |  UNION ALL
        |  SELECT CAST(900003 AS BIGINT),
        |    list_prepend(-e[1] + 1e-4, list_transform(e[2:], x -> -x))
        |  FROM base WHERE vec_id = 5
        |), drops AS (
        |  SELECT DISTINCT b.vec_id FROM planted a JOIN planted b
        |  ON a.vec_id < b.vec_id
        |    AND list_cosine_similarity(a.e, b.e) >= 0.99
        |)
        |SELECT vec_id FROM planted
        |WHERE vec_id NOT IN (SELECT vec_id FROM drops)""".stripMargin,

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

    // Incremental SemDeDup oracle (r17): the same hash-init chain with
    // the centroid draw and cell count frozen on the HISTORY slice,
    // assignment over hist ∪ batch (+ the three planted in-flight
    // vectors), and the pair rule split per the incremental contract —
    // a batch row pairs against every history row in its cell and
    // every SMALLER-id batch row in its cell.
    "dedup_semantic_incremental" ->
      """WITH wf AS MATERIALIZED (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
        |  FROM embeddings WHERE len(embedding) = 64
        |), hist AS MATERIALIZED (
        |  SELECT vec_id, e FROM wf WHERE vec_id % 10 < 8
        |), batch AS MATERIALIZED (
        |  SELECT vec_id, e FROM wf WHERE vec_id % 10 >= 8
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
        |), allr AS MATERIALIZED (
        |  SELECT vec_id, e, 0 AS is_batch FROM hist
        |  UNION ALL
        |  SELECT vec_id, e, 1 AS is_batch FROM batch
        |), vals AS MATERIALIZED (
        |  SELECT vec_id, unnest(range(0, len(e))) AS i, unnest(e) AS x
        |  FROM allr
        |), norms AS MATERIALIZED (
        |  SELECT vec_id, sqrt(SUM(x * x)) AS nrm FROM vals GROUP BY 1
        |), ivf_rows AS (
        |  SELECT vec_id, e, row_number() OVER (
        |    ORDER BY (vec_id % 1048573) * 2246822519 % 1048573, vec_id
        |  ) - 1 AS cell
        |  FROM hist WHERE len(list_filter(e, x -> x IS NULL)) = 0
        |  QUALIFY cell < (SELECT CAST(CEIL(COUNT(*) / 32.0) AS BIGINT)
        |                  FROM hist)
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
        |  SELECT r.vec_id, r.cell, a.is_batch FROM rowcos r
        |  JOIN allr a ON a.vec_id = r.vec_id
        |  QUALIFY row_number() OVER (
        |    PARTITION BY r.vec_id ORDER BY r.cos DESC, r.cell DESC) = 1
        |), paircos AS (
        |  SELECT a.vec_id, ROUND(CASE WHEN na.nrm > 0 AND nb.nrm > 0
        |      THEN SUM(va.x * vb.x) / (na.nrm * nb.nrm)
        |      ELSE -1 END, 6) AS cos
        |  FROM assign a
        |  JOIN assign b ON a.cell = b.cell AND a.is_batch = 1
        |    AND (b.is_batch = 0 OR b.vec_id < a.vec_id)
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
        |FROM assign a LEFT JOIN best b USING (vec_id)
        |WHERE a.is_batch = 1""".stripMargin,

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

    // append-mode streaming dedup projected to its key columns — the
    // sink is exactly the distinct key set, whichever arrival won.
    "stream_dedup_keys" ->
      "SELECT DISTINCT user_id, event_type FROM events",

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

    // CDC incremental oracle (r17): the dedup_passage_pairs recursive
    // gear-hash chunker over hist ∪ batch ∪ the planted lifted-prefix
    // doc — at the FINE recall knobs the registration uses (min chunk
    // 8, boundary mod 16; the registration scaladoc explains why) —
    // then the incremental contract's two loser rules: df pruning
    // PER SIDE (history at ingest, batch at refresh), cross pairs drop
    // the batch doc, within pairs drop the larger id. Survivors =
    // batch docs in neither loser set (chunkless docs survive).
    "dedup_passage_incremental" ->
      """WITH RECURSIVE gear AS MATERIALIZED (
        |  SELECT i, xor(z2, z2 // 2147483648::HUGEINT) AS g FROM (
        |    SELECT i, (((xor(z1, z1 // 134217728::HUGEINT)) % 4294967296::HUGEINT * (10723151780598845931::HUGEINT) % 18446744073709551616::HUGEINT + ((xor(z1, z1 // 134217728::HUGEINT)) // 4294967296::HUGEINT * (10723151780598845931::HUGEINT) % 4294967296::HUGEINT) * 4294967296::HUGEINT) % 18446744073709551616::HUGEINT) AS z2 FROM (
        |      SELECT i, (((xor(x, x // 1073741824::HUGEINT)) % 4294967296::HUGEINT * (13787848793156543929::HUGEINT) % 18446744073709551616::HUGEINT + ((xor(x, x // 1073741824::HUGEINT)) // 4294967296::HUGEINT * (13787848793156543929::HUGEINT) % 4294967296::HUGEINT) * 4294967296::HUGEINT) % 18446744073709551616::HUGEINT) AS z1 FROM (
        |        SELECT i, ((i + 1) * 11400714819323198485::HUGEINT) % 18446744073709551616::HUGEINT AS x
        |        FROM range(256) r(i))))
        |), docs_all AS MATERIALIZED (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT CAST(900001 AS BIGINT),
        |    substr(text, 1, 600) ||
        |    ' entirely novel trailing prose closes the lifted excerpt'
        |  FROM documents WHERE doc_id = 0
        |), norm AS MATERIALIZED (
        |  SELECT doc_id,
        |    trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS t
        |  FROM docs_all
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
        |      (s.clen + 1 >= 8 AND ((s.gr * 2) % 18446744073709551616::HUGEINT + b.g) % 18446744073709551616::HUGEINT % 16 = 0) AS bnd
        |    FROM state s
        |    JOIN bytes b ON b.doc_id = s.doc_id AND b.pos = s.pos + 1
        |  )
        |), final AS (
        |  SELECT s.doc_id,
        |    CASE WHEN s.clen > 0 THEN list_append(s.hashes, s.chunk)
        |      ELSE s.hashes END AS hashes
        |  FROM state s
        |  JOIN norm n ON n.doc_id = s.doc_id AND s.pos = length(n.t)
        |), ch AS MATERIALIZED (
        |  SELECT DISTINCT doc_id, unnest(hashes) AS h FROM final
        |), hist_ch AS (
        |  SELECT * FROM ch WHERE doc_id % 10 < 8 AND doc_id <> 900001
        |), batch_ch AS (
        |  SELECT * FROM ch WHERE doc_id % 10 >= 8 OR doc_id = 900001
        |), hist_kept AS (
        |  SELECT doc_id, h FROM hist_ch
        |  WHERE h IN (SELECT h FROM hist_ch GROUP BY h
        |              HAVING COUNT(*) <= 1000)
        |), batch_kept AS (
        |  SELECT doc_id, h FROM batch_ch
        |  WHERE h IN (SELECT h FROM batch_ch GROUP BY h
        |              HAVING COUNT(*) <= 1000)
        |), cross_losers AS (
        |  SELECT DISTINCT doc_id FROM (
        |    SELECT b.doc_id, h.doc_id AS hid
        |    FROM batch_kept b JOIN hist_kept h USING (h)
        |    GROUP BY 1, 2 HAVING COUNT(*) >= 2)
        |), within_losers AS (
        |  SELECT DISTINCT doc_id FROM (
        |    SELECT y.doc_id, x.doc_id AS xid
        |    FROM batch_kept x JOIN batch_kept y
        |      ON x.h = y.h AND x.doc_id < y.doc_id
        |    GROUP BY 1, 2 HAVING COUNT(*) >= 2)
        |), batch_ids AS (
        |  SELECT doc_id FROM documents WHERE doc_id % 10 >= 8
        |  UNION ALL SELECT CAST(900001 AS BIGINT)
        |)
        |SELECT doc_id FROM batch_ids
        |WHERE doc_id NOT IN (SELECT doc_id FROM cross_losers)
        |  AND doc_id NOT IN (SELECT doc_id FROM within_losers)""".stripMargin,
  )
}
