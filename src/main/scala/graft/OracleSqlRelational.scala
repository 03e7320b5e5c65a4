package graft

/** Oracle SQL for relational/engine-primitive rows (revenue, skew salting, SCD2 merge, z-order, pricing).
  * Split from the single-file registry (r15 verdict item 7); every key
  * mirrors a [[SparkEntry.queries]] registration with IDENTICAL column
  * names/aliases. Shared CTE derivations live in [[OracleSqlShared]]. */
private[graft] object OracleSqlRelational {
  import OracleSqlShared._
  import SparkEntry.{ScoringCoefficients, ScoringIntercepts, PcaScoringLoadings}
  import graft.features.DimReduction

  // Co-located bucketed join (ingest + steady-state twins): the
  // oracle is the PLAIN join+group-by — physical bucketing changes
  // the plan, never the result.
  private val bucketedJoinOracle: String =
    """SELECT o_orderpriority, COUNT(*) AS n_items,
      |  ROUND(SUM(l_quantity), 2) AS sum_qty,
      |  ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY 1""".stripMargin

  // Seq, not Map (r17 advice #5 applied to the oracle registry too):
  // a within-family duplicate key survives to OracleSql.all's
  // duplicate require instead of last-wins-collapsing silently.
  val entries: Seq[(String, String)] = Seq(
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

    // partition-prune oracle: the plain filtered daily aggregate —
    // the partitioned write/pruned read on the Spark side must be
    // correctness-invisible (integer-only outputs, so no float
    // parity concern; day via UTC strftime == date_format).
    "layout_partition_prune" ->
      """SELECT strftime(ts, '%Y-%m-%d') AS day,
        |  COUNT(*) AS n_events,
        |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM events WHERE event_type = 'purchase'
        |GROUP BY 1""".stripMargin,

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

    // streaming CDC merge snapshot: the final state must equal the
    // batch rule "latest event per key by seq" (tombstones flagged).
    "stream_merge_snapshot" ->
      """SELECT user_id AS key, event_type AS payload,
        |  CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS deleted
        |FROM events
        |QUALIFY row_number() OVER (
        |  PARTITION BY user_id ORDER BY ts DESC) = 1""".stripMargin,

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

    // Co-located bucketed join: the oracle is the PLAIN join+group-by
    // — physical bucketing changes the plan, never the result.
    "layout_bucketed_join" -> bucketedJoinOracle,

    // steady-state twin: identical result — only the plan differs
    // (pre-built bucketed tables, no ingest writes in the row)
    "layout_bucketed_join_steady" -> bucketedJoinOracle,

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
