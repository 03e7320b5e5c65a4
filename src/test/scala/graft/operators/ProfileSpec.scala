package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ProfileSpec extends SparkSpec {

  private def orders = spark.read.parquet(s"$sf0001/orders.parquet")
    .withColumn("o_status_sparse",
      when(col("o_orderkey") % 7 === 0, lit(null: String))
        .otherwise(col("o_orderstatus")))

  private val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
    "o_orderdate", "o_status_sparse")

  test("histogram: hand-checked bins, empty bins present, max in last " +
      "bin, nulls excluded, counts sum to non-null rows") {
    val s = spark
    import s.implicits._
    // values 0..9 and 100 → 10 bins of width 10: bin 0 holds 0..9,
    // bins 1..8 empty, bin 9 holds the max (closed top)
    val df = ((0 to 9).map(_.toDouble) :+ 100.0).map(Tuple1(_))
      .toDF("v").unionByName(Seq(Tuple1(null.asInstanceOf[java.lang.Double]))
        .toDF("v"))
    val h = Profile.histogram(df, "v", nBins = 10).collect()
      .map(r => r.getInt(0) -> (r.getDouble(1), r.getDouble(2), r.getLong(3)))
      .toMap
    assert(h.size == 10)
    assert(h(0) == ((0.0, 10.0, 10L)))
    (1 to 8).foreach(i => assert(h(i)._3 == 0L, s"bin $i should be empty"))
    assert(h(9) == ((90.0, 100.0, 1L)))
    assert(h.values.map(_._3).sum == 11L) // null excluded
    // constant column: everything lands in bin 0
    val flat = Profile.histogram(
      Seq(5.0, 5.0, 5.0).map(Tuple1(_)).toDF("v"), "v", nBins = 4)
      .collect().map(r => r.getInt(0) -> r.getLong(3)).toMap
    assert(flat(0) == 3L && flat.values.sum == 3L)
  }

  test("profile: exact stats match per-column brute force, planted nulls counted") {
    val out = Profile.profile(orders, cols).collect()
      .map(r => r.getAs[String]("column_name") -> r).toMap
    assert(out.keySet == cols.toSet)

    val n = orders.count()
    cols.foreach { c =>
      val r = out(c)
      assert(r.getAs[Long]("n_rows") == n, c)
      val nulls = orders.filter(col(c).isNull).count()
      assert(r.getAs[Long]("n_nulls") == nulls, c)
      val distinct = orders.select(c).na.drop().distinct().count()
      assert(r.getAs[Long]("n_distinct") == distinct, c)
      val Array(mn, mx) = orders
        .agg(min(col(c)).cast("string"), max(col(c)).cast("string"))
        .collect()(0).toSeq.map(_.asInstanceOf[String]).toArray
      assert(r.getAs[String]("min_val") == mn, c)
      assert(r.getAs[String]("max_val") == mx, c)
    }
    // the planted-null column actually has nulls (non-vacuous n_nulls)
    assert(out("o_status_sparse").getAs[Long]("n_nulls") > 0)
    // full-null tolerance: a column that is entirely null profiles sanely
    val allNull = Profile.profile(
      orders.withColumn("dead", lit(null: String)), Seq("dead")).collect()(0)
    assert(allNull.getAs[Long]("n_distinct") == 0
      && allNull.getAs[String]("min_val") == null)
  }

  test("profileApprox: HLL estimate within rsd, plan has no Expand") {
    val exact = Profile.profile(orders, cols).collect()
      .map(r => r.getAs[String]("column_name") -> r.getAs[Long]("n_distinct"))
      .toMap
    val approxDf = Profile.profileApprox(orders, cols, rsd = 0.05)
    approxDf.collect().foreach { r =>
      val c = r.getAs[String]("column_name")
      val est = r.getAs[Long]("n_distinct").toDouble
      val act = exact(c).toDouble
      // 5% rsd: allow 4 sigma
      assert(math.abs(est - act) <= math.max(4, act * 0.20),
        s"$c est=$est act=$act")
    }
    // the at-scale path never multiplies rows: no Expand in the plan
    val approxPlan = approxDf.queryExecution.executedPlan.toString
    assert(!approxPlan.contains("Expand"), approxPlan.take(800))
    // while the exact path does (n distinct aggregates over one scan)
    val exactPlan = Profile.profile(orders, cols)
      .queryExecution.executedPlan.toString
    assert(exactPlan.contains("Expand"), exactPlan.take(800))
  }
}
