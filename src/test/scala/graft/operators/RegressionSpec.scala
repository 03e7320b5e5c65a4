package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RegressionSpec extends SparkSpec {

  test("linearFit: recovers a planted exact line (slope 2, intercept " +
      "3) with r2 = 1") {
    val s = spark
    import s.implicits._
    val df = (1 to 50).map(i => (i.toDouble, 2.0 * i + 3.0)).toDF("x", "y")
    val r = Regression.linearFit(df, Seq.empty, col("x"), col("y"))
      .collect().head
    assert(r.getAs[Long]("n_rows") == 50L)
    assert(math.abs(r.getAs[Double]("slope") - 2.0) < 1e-6)
    assert(math.abs(r.getAs[Double]("intercept") - 3.0) < 1e-6)
    assert(math.abs(r.getAs[Double]("r2") - 1.0) < 1e-6)
    assert(math.abs(r.getAs[Double]("corr") - 1.0) < 1e-6)
  }

  test("linearFit: matches a hand-computed OLS on noisy per-group data " +
      "and is repartition-invariant on integral inputs") {
    val s = spark
    import s.implicits._
    val pts = Seq(
      ("a", 1.0, 2.0), ("a", 2.0, 1.0), ("a", 3.0, 4.0), ("a", 4.0, 3.0),
      ("b", 1.0, 10.0), ("b", 2.0, 8.0), ("b", 3.0, 6.0))
    val df = pts.toDF("g", "x", "y")
    def ols(xs: Seq[(Double, Double)]): (Double, Double, Double) = {
      val n = xs.size.toDouble
      val sx = xs.map(_._1).sum; val sy = xs.map(_._2).sum
      val sxy = xs.map(p => p._1 * p._2).sum
      val sxx = xs.map(p => p._1 * p._1).sum
      val syy = xs.map(p => p._2 * p._2).sum
      val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
      val icept = (sy - slope * sx) / n
      val r = (n * sxy - sx * sy) /
        math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
      (slope, icept, r * r)
    }
    val out = Regression.linearFit(df, Seq("g"), col("x"), col("y"))
      .collect().map(r => r.getAs[String]("g") -> r).toMap
    for (g <- Seq("a", "b")) {
      val (sl, ic, r2) = ols(pts.filter(_._1 == g).map(p => (p._2, p._3)))
      assert(math.abs(out(g).getAs[Double]("slope") - sl) < 1e-6, g)
      assert(math.abs(out(g).getAs[Double]("intercept") - ic) < 1e-6, g)
      assert(math.abs(out(g).getAs[Double]("r2") - r2) < 1e-6, g)
    }
    val again = Regression.linearFit(df.repartition(5, col("y")),
      Seq("g"), col("x"), col("y")).orderBy("g").collect().toSeq
    assert(again == Regression.linearFit(df, Seq("g"), col("x"), col("y"))
      .orderBy("g").collect().toSeq)
  }

  test("linearFit: degenerate groups surface as NULLs, not errors") {
    val s = spark
    import s.implicits._
    // constant x → zero x-variance; single point → n = 1
    val df = Seq(("cx", 5.0, 1.0), ("cx", 5.0, 2.0), ("one", 1.0, 1.0))
      .toDF("g", "x", "y")
    val out = Regression.linearFit(df, Seq("g"), col("x"), col("y"))
      .collect().map(r => r.getAs[String]("g") -> r).toMap
    for (g <- Seq("cx", "one"); c <- Seq("slope", "intercept", "corr", "r2"))
      assert(out(g).isNullAt(out(g).fieldIndex(c)), s"$g.$c")
  }

  test("zipfFit: a planted power-law corpus fits slope ~ -1 with high " +
      "r2; head selection plans TakeOrdered, not a global sort") {
    val s = spark
    import s.implicits._
    // term_k repeated ~ 1000/k times: exact Zipf by construction
    val docs = (1 to 40).flatMap { k =>
      Seq.fill(1000 / k)(s"term$k")
    }.grouped(50).map(_.mkString(" ")).toSeq.toDF("text")
      .withColumn("doc_id", monotonically_increasing_id())
    val fit = Regression.zipfFit(docs, topN = 40)
    val p = fit.queryExecution.executedPlan.toString
    assert(p.contains("TakeOrdered"), p.take(600))
    val r = fit.collect().head
    assert(r.getAs[Long]("n_rows") == 40L)
    val slope = r.getAs[Double]("slope")
    assert(slope < -0.8 && slope > -1.2, s"slope $slope")
    assert(r.getAs[Double]("r2") > 0.95)
  }

  test("zipfFit: the fixture corpus reads FLAT (slope ≈ -0.2) — the " +
      "diagnostic flagging synthetic near-uniform text, deterministic") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val a = Regression.zipfFit(docs).collect().head
    val slope = a.getAs[Double]("slope")
    // decreasing but far from the natural-text ≈ -1: exactly the
    // corpus-mix signal the row exists to surface (a generator
    // vocabulary drawn near-uniformly has a flat head)
    assert(slope < 0.0 && slope > -0.6, s"slope $slope")
    val r2 = a.getAs[Double]("r2")
    assert(r2 > 0.0 && r2 <= 1.0, s"r2 $r2")
    val b = Regression.zipfFit(docs).collect().head
    assert(a == b)
  }
}
