package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RelationalSpec extends SparkSpec {

  private def t(name: String) =
    spark.read.parquet(s"$sf0001/$name.parquet")

  test("revenueByNation: pre-aggregated rollup equals the direct join-then-agg") {
    val out = Relational.revenueByNation(
      t("lineitem"), t("orders"), t("customer"), t("nation"), t("region"))
    // direct formulation: no per-order pre-aggregation
    val direct = t("lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp"))
      .join(t("orders"), col("l_orderkey") === col("o_orderkey"))
      .join(t("customer"), col("o_custkey") === col("c_custkey"))
      .join(t("nation"), col("c_nationkey") === col("n_nationkey"))
      .join(t("region"), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_lineitems"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
          .as("revenue"))
    val a = out.orderBy("r_name", "n_name").collect().map(_.toSeq).toSeq
    val b = direct.orderBy("r_name", "n_name").collect().map(_.toSeq).toSeq
    assert(a == b)
    assert(a.nonEmpty)
    // the ship-date predicate reaches the parquet scan
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("l_shipdate"),
      plan.take(800))
  }

  test("pricingSummary: group invariants and pushed date filter") {
    val out = Relational.pricingSummary(t("lineitem"))
    val rows = out.collect()
    assert(rows.nonEmpty)
    // group count bounded by |returnflag| x |linestatus|; totals positive
    assert(rows.length <= 9)
    rows.foreach { r =>
      assert(r.getAs[Double]("sum_qty") > 0)
      assert(r.getAs[Double]("sum_disc_price") <= r.getAs[Double]("sum_base_price"))
      assert(r.getAs[Double]("sum_charge") >= r.getAs[Double]("sum_disc_price"))
      assert(r.getAs[Long]("count_order") > 0)
    }
    // count_order sums to the filtered row count
    val total = rows.map(_.getAs[Long]("count_order")).sum
    assert(total == t("lineitem")
      .filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp")).count())
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("l_shipdate"),
      plan.take(800))
  }

  test("revenueRollup: levels reconcile — nations sum to regions sum to total") {
    val out = Relational.revenueRollup(
      t("lineitem"), t("orders"), t("customer"), t("nation"), t("region"))
      .collect()
    val byGid = out.groupBy(_.getAs[Int]("grouping_id"))
    // gid 0 = (region, nation) detail, 1 = region subtotal, 3 = grand total
    assert(byGid.keySet == Set(0, 1, 3))
    assert(byGid(3).length == 1)
    def cents(d: Double) = math.round(d * 100)
    // nations within a region reconcile (to the cent) with its subtotal
    val regionFromNations = byGid(0)
      .groupBy(_.getAs[String]("r_name"))
      .view.mapValues(rs => rs.map(r => cents(r.getAs[Double]("revenue"))).sum)
    byGid(1).foreach { r =>
      // subtotal rounds the SUM, detail rows round each nation: equal
      // within a cent per nation
      val diff = math.abs(cents(r.getAs[Double]("revenue")) -
        regionFromNations(r.getAs[String]("r_name")))
      assert(diff <= byGid(0).length, r.getAs[String]("r_name") + s" diff=$diff")
    }
    // order counts reconcile exactly (integers)
    val totalOrders = byGid(0).map(_.getAs[Long]("n_orders")).sum
    assert(byGid(3).head.getAs[Long]("n_orders") == totalOrders)
    // one aggregate over an Expand — not three separate queries
    val plan = Relational.revenueRollup(
      t("lineitem"), t("orders"), t("customer"), t("nation"), t("region"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("Expand"), plan.take(600))
  }

  test("topRevenueOrders: equals the direct formulation; top-k is heap-based") {
    val cutoff = "1998-06-01"
    val out = Relational.topRevenueOrders(
      t("lineitem"), t("orders"), t("customer"),
      segment = "BUILDING", cutoff = cutoff, k = 10)
    // direct formulation: join first, aggregate after, sort everything
    val direct = t("lineitem")
      .filter(col("l_shipdate") > lit(cutoff).cast("timestamp"))
      .join(t("orders").filter(col("o_orderdate") < lit(cutoff).cast("timestamp")),
        col("l_orderkey") === col("o_orderkey"))
      .join(t("customer").filter(col("c_mktsegment") === "BUILDING"),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
        col("o_orderpriority"))
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
        .as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(10)
    val a = out.collect().map(_.toSeq).toSeq
    val b = direct.collect().map(_.toSeq).toSeq
    assert(a == b)
    assert(a.nonEmpty && a.size <= 10)
    val plan = out.queryExecution.executedPlan.toString
    // global top-k must be the per-task-heap operator, never a full sort
    assert(plan.contains("TakeOrderedAndProject"), plan.take(800))
    // both date predicates reach their parquet scans
    assert(plan.contains("PushedFilters"), plan.take(800))
  }

  test("largeOrderCustomers: equals the direct formulation; HAVING precedes joins") {
    val out = Relational.largeOrderCustomers(
      t("lineitem"), t("orders"), t("customer"), minQty = 250)
    // direct formulation: join everything first, aggregate + filter last
    val direct = t("lineitem")
      .join(t("orders"), col("l_orderkey") === col("o_orderkey"))
      .join(t("customer"), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
        round(col("o_totalprice"), 2).as("o_totalprice"))
      .agg(round(sum(col("l_quantity")), 2).as("total_qty"))
      .filter(col("total_qty") > 250)
    assert(out.count() > 0)
    assert(out.exceptAll(direct).count() == 0 &&
      direct.exceptAll(out).count() == 0)
    // the threshold filter sits on the aggregate BELOW the joins (tree
    // renders top-down, so the Filter line must appear AFTER the last
    // Join line and directly above the Aggregate)
    val optimized = out.queryExecution.optimizedPlan.toString
    val filterIdx = "Filter \\([^\n]*total_qty[^\n]* > 250".r
      .findFirstMatchIn(optimized).map(_.start).getOrElse(-1)
    val lastJoinIdx = optimized.lastIndexOf("Join Inner")
    assert(filterIdx >= 0 && lastJoinIdx >= 0 && lastJoinIdx < filterIdx,
      "expected the aggregate+filter beneath the joins:\n" +
        optimized.take(1200))
    assert(optimized.indexOf("Aggregate", filterIdx) >= 0)
  }

  test("orphans: flags exactly the planted dangling keys, prunes the parent") {
    val li = t("lineitem").select("l_orderkey", "l_linenumber")
    val planted = li.filter(col("l_orderkey") % 97 === 0)
      .select((col("l_orderkey") + lit(900000000L)).as("l_orderkey"),
        col("l_linenumber"))
    val out = Relational.orphans(li.unionByName(planted), t("orders"),
      "l_orderkey", "o_orderkey")
    // natural TPC-H lineitem has no orphans; only the planted rows come back
    assert(Relational.orphans(li, t("orders"), "l_orderkey", "o_orderkey")
      .count() == 0)
    assert(out.count() == planted.count() && planted.count() > 0)
    assert(out.collect().forall(_.getAs[Long]("l_orderkey") >= 900000000L))
    // anti join: parent scan reads its key column only
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("LeftAnti"), plan.take(800))
    assert("ReadSchema:[^\n]*o_orderkey".r.findFirstIn(plan).exists(s =>
      !s.contains("o_custkey") && !s.contains("o_totalprice")), plan.take(1500))
  }
}
