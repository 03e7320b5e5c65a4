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
}
