package graft

/** Oracle SQL for the events/profile family (sessionize, funnels, joins, sketches, drift, pagerank) and its streaming twins.
  * Split from the single-file registry (r15 verdict item 7); every key
  * mirrors a [[SparkEntry.queries]] registration with IDENTICAL column
  * names/aliases. Shared CTE derivations live in [[OracleSqlShared]]. */
private[graft] object OracleSqlEvents {
  import OracleSqlShared._
  import SparkEntry.{ScoringCoefficients, ScoringIntercepts, PcaScoringLoadings}
  import graft.features.DimReduction

  // Seq, not Map (r17 advice #5 applied to the oracle registry too):
  // a within-family duplicate key survives to OracleSql.all's
  // duplicate require instead of last-wins-collapsing silently.
  val entries: Seq[(String, String)] = Seq(
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

    "events_window" -> eventsWindowOracle,

    // Round 11: the streaming twin shares the batch oracle VERBATIM —
    // complete-mode foreachBatch materialization makes the final sink
    // state the full aggregate, so stream == batch is itself under the
    // hash compare.
    "stream_window_counts" -> eventsWindowOracle,

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

    "events_pivot" ->
      """SELECT strftime(ts, '%Y-%m-%d') AS day,
        |  COUNT(*) FILTER (WHERE event_type = 'click') AS click,
        |  COUNT(*) FILTER (WHERE event_type = 'view') AS view,
        |  COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
        |  COUNT(*) FILTER (WHERE event_type = 'signup') AS signup,
        |  COUNT(*) FILTER (WHERE event_type = 'error') AS error
        |FROM events GROUP BY 1""".stripMargin,

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
  )
}
