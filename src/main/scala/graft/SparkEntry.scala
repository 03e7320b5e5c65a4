package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.features.RobustScaling

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator from SURVEY.md §2 (and the §7 LLM-pipeline extensions)
  * registers a named query here; SQL-expressible ones also register a
  * DuckDB oracle in [[oracleSql]] with IDENTICAL column names/aliases.
  */
object SparkEntry {

  private def lineitem(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/lineitem.parquet")

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("robust_scaling")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.1 #7 robust_scaling — exact-percentile path (oracle parity, Q5).
    "robust_scaling" -> ((s, dir) =>
      RobustScaling(
        lineitem(s, dir).select("l_orderkey", "l_linenumber", "l_quantity",
          "l_extendedprice", "l_discount"),
        Seq("l_quantity", "l_extendedprice", "l_discount"),
        exact = true)),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
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
  )
}
