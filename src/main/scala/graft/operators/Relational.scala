package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** General relational rollups over the TPC-H-shaped driver tables —
  * the engine-primitive surface (scan/filter/join/agg) composed the way
  * a 100 TB deployment wants it, beyond the reference's single-table
  * feature ops.
  */
object Relational {

  /** Revenue by region/nation: lineitem ⋈ orders ⋈ customer ⋈ nation ⋈
    * region with a ship-date filter, the canonical star-join rollup.
    *
    * The at-scale plan, in order:
    *  - the `since` predicate is pushed INTO the lineitem parquet scan
    *    (`PushedFilters`), so excluded row groups are never read;
    *  - lineitem is PRE-AGGREGATED to one revenue row per order key
    *    before any join — at ~4 lineitems/order this shrinks the
    *    big-big join input ~4× for one partial-combined shuffle;
    *  - lineitem⋈orders and ⋈customer are key shuffles (AQE picks
    *    broadcast at small SF, sort-merge once both sides outgrow it);
    *  - nation and region are BROADCAST by hint — fixed-size dimension
    *    tables never justify shuffling the fact side;
    *  - the final rollup is a low-cardinality partial+final aggregate.
    *
    * Revenue is rounded to cents (2dp) on both engine sides: group
    * sums reach ~1e10 where cross-engine summation-order noise is
    * ~1e-5 — far inside 2dp, far outside 6dp. */
  def revenueByNation(
      lineitem: DataFrame,
      orders: DataFrame,
      customer: DataFrame,
      nation: DataFrame,
      region: DataFrame,
      since: String = "1996-01-01"): DataFrame = {
    val perOrder = lineitem
      .filter(col("l_shipdate") >= lit(since).cast("timestamp"))
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .as("order_rev"),
        count(lit(1)).as("n_items"))
    perOrder
      .join(orders.select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .join(customer.select("c_custkey", "c_nationkey"),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation.select("n_nationkey", "n_name", "n_regionkey")),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(sum(col("n_items")).as("n_lineitems"),
        round(sum(col("order_rev")), 2).as("revenue"))
  }

  /** Multi-level revenue rollup: the [[revenueByNation]] star join
    * aggregated with `ROLLUP(r_name, n_name)` — per-nation rows,
    * per-region subtotals, and the grand total in ONE aggregate pass
    * (Catalyst plans an Expand over the grouping sets feeding a single
    * partial-combined shuffle — one scan, one exchange, not three
    * queries). Rollup null slots are labeled 'ALL' (the fixture names
    * are never null) and `grouping_id` disambiguates the level. */
  def revenueRollup(
      lineitem: DataFrame,
      orders: DataFrame,
      customer: DataFrame,
      nation: DataFrame,
      region: DataFrame,
      since: String = "1996-01-01"): DataFrame = {
    val perOrder = lineitem
      .filter(col("l_shipdate") >= lit(since).cast("timestamp"))
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .as("order_rev"))
    perOrder
      .join(orders.select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .join(customer.select("c_custkey", "c_nationkey"),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation.select("n_nationkey", "n_name", "n_regionkey")),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(grouping_id().cast("int").as("grouping_id"),
        round(sum(col("order_rev")), 2).as("revenue"),
        count(lit(1)).as("n_orders"))
      .select(coalesce(col("r_name"), lit("ALL")).as("r_name"),
        coalesce(col("n_name"), lit("ALL")).as("n_name"),
        col("grouping_id"), col("revenue"), col("n_orders"))
  }

  /** Pricing summary rollup (the TPC-H Q1 shape): per
    * (returnflag, linestatus), summed quantities/prices/discounted
    * charges, averages, and row counts over shipped lineitems — the
    * canonical single-table scan → partial agg → final agg plan.
    *
    * Scale: the ship-date predicate pushes into the parquet scan; the
    * aggregation is ONE partial-combined shuffle onto a handful of
    * groups (cardinality = |returnflag| × |linestatus|), so the
    * exchange carries a few dozen partial rows per task regardless of
    * corpus size. Sums are rounded to cents, averages to 6dp
    * (cross-engine partial-merge order). */
  def pricingSummary(
      lineitem: DataFrame,
      until: String = "1998-09-01"): DataFrame = {
    val disc = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    lineitem
      .filter(col("l_shipdate") <= lit(until).cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(disc), 2).as("sum_disc_price"),
        round(sum(disc * (lit(1.0) + col("l_tax"))), 2).as("sum_charge"),
        round(avg(col("l_quantity")), 6).as("avg_qty"),
        round(avg(col("l_extendedprice")), 6).as("avg_price"),
        round(avg(col("l_discount")), 6).as("avg_disc"),
        count(lit(1)).as("count_order"))
  }

  /** Top-k open orders by outstanding revenue for one market segment —
    * the shipping-priority query shape (TPC-H Q3): lineitem ⋈ orders ⋈
    * customer with date predicates on both fact sides, grouped per
    * order, globally top-k.
    *
    * The at-scale plan, in order:
    *  - both date predicates are pushed into the parquet scans
    *    (`l_shipdate > cutoff` on lineitem, `o_orderdate < cutoff` on
    *    orders) — at 100 TB with date-partitioned facts this is
    *    partition pruning, not just row-group skipping;
    *  - lineitem pre-aggregates to one revenue row per order key BEFORE
    *    joining (partial-combined shuffle, ~4× input reduction);
    *  - the segment filter shrinks customer first; the two key joins
    *    shuffle only the filtered sides (AQE broadcasts whichever side
    *    collapses below the threshold at runtime);
    *  - the global top-k plans as `TakeOrderedAndProject` — each task
    *    keeps a k-row heap, the driver merges; NO full sort, NO single
    *    ordered partition, regardless of corpus size.
    *
    * Ties break on `o_orderkey` so the row set is deterministic;
    * revenue is rounded to cents (cross-engine sum-order noise ~1e-5,
    * see [[revenueByNation]]); the date is formatted as a string in the
    * output (driver-diff timestamp parity). */
  def topRevenueOrders(
      lineitem: DataFrame,
      orders: DataFrame,
      customer: DataFrame,
      segment: String = "BUILDING",
      cutoff: String = "1998-06-01",
      k: Int = 10): DataFrame = {
    val perOrder = lineitem
      .filter(col("l_shipdate") > lit(cutoff).cast("timestamp"))
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .as("order_rev"))
    perOrder
      .join(orders.filter(col("o_orderdate") < lit(cutoff).cast("timestamp"))
          .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"),
        col("l_orderkey") === col("o_orderkey"))
      .join(customer.filter(col("c_mktsegment") === segment)
          .select("c_custkey"),
        col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
        col("o_orderpriority"),
        round(col("order_rev"), 2).as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(k)
  }

  /** Customers behind abnormally large orders — the large-volume-buyer
    * query shape (TPC-H Q18): orders whose summed lineitem quantity
    * clears `minQty`, joined out to order and customer detail.
    *
    * The at-scale ordering is the whole point: the quantity HAVING
    * runs on the pre-aggregated per-order frame BEFORE any join, so
    * the (rare — ~0.8% of orders at the default threshold) qualifying
    * keys are what the orders/customer joins ever see; AQE broadcasts
    * the surviving side at runtime. The aggregation is one
    * partial-combined shuffle on `l_orderkey`; nothing else touches
    * the full lineitem table. Quantity is rounded to 2dp BEFORE the
    * threshold test so the qualifying set cannot flip on a
    * cross-engine sum-order ulp. */
  def largeOrderCustomers(
      lineitem: DataFrame,
      orders: DataFrame,
      customer: DataFrame,
      minQty: Double = 300): DataFrame = {
    val bigOrders = lineitem
      .groupBy(col("l_orderkey"))
      .agg(round(sum(col("l_quantity")), 2).as("total_qty"))
      .filter(col("total_qty") > minQty)
    bigOrders
      .join(orders.select("o_orderkey", "o_custkey", "o_orderdate",
          "o_totalprice"),
        col("l_orderkey") === col("o_orderkey"))
      .join(customer.select("c_custkey", "c_name"),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
        round(col("o_totalprice"), 2).as("o_totalprice"),
        col("total_qty"))
  }

  /** Referential-integrity check: child rows whose `childKey` has no
    * matching `parentKey` — the orphan-detection pass a 100 TB ingest
    * runs before trusting a join (a fact row pointing at a missing
    * dimension silently vanishes from every inner join downstream;
    * this surfaces them instead).
    *
    * Plan: LEFT ANTI join on the key. The parent side is pruned to its
    * key column before the join, so at scale this is one key-partitioned
    * shuffle of (child keys + payload) against (parent keys only) —
    * AQE picks broadcast-anti when the parent's key projection fits,
    * sort-merge-anti when both sides are big; either way no payload
    * columns from the parent ever move. Anti join needs no distinct on
    * the parent: duplicates cost nothing extra in the join's build
    * side. */
  def orphans(
      child: DataFrame,
      parent: DataFrame,
      childKey: String,
      parentKey: String): DataFrame =
    child.join(parent.select(col(parentKey)),
      col(childKey) === col(parentKey), "left_anti")

  /** Order-priority summary over the lineitem ⋈ orders equi-join —
    * the registered demonstration of the CO-LOCATED fact-fact join:
    * when BOTH inputs are ingest-time bucketed on their join key
    * ([[graft.sources.Sources.writeBucketed]], same bucket count),
    * the forced sort-merge join (`hint("merge")` — broadcast would
    * hide the point at test SF, and at 100 TB neither fact side fits
    * a broadcast anyway) plans with ZERO Exchange on either side:
    * each scan reports `HashPartitioning(key, buckets)` and the SMJ's
    * distribution requirement is already met, so the only shuffle in
    * the whole query is the final low-cardinality group-by. The join
    * shuffle — at 100 TB the single largest cost of a repeated
    * fact-fact join — is paid ONCE at ingest instead of per query.
    * PlanAuditSpec pins exactly that shape (one hash Exchange total,
    * SMJ present, no Exchange below it); the correctness oracle is
    * the plain join+group-by, bucketing-invisible by construction.
    *
    * Aggregate recipe is [[pricingSummary]]'s: integer count, 2dp
    * rounding on the dollar sums (group sums ~1e9, cross-engine
    * summation-order noise ~1e-5 — far inside 2dp). */
  def orderPrioritySummary(
      lineitem: DataFrame,
      orders: DataFrame): DataFrame =
    lineitem.hint("merge")
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_items"),
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))),
          2).as("revenue"))
}
