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

  test("equidepth: uniform integer grid cuts into exactly equal bins " +
      "with contiguous [min,max] ranges") {
    val s = spark
    import s.implicits._
    // 1..1000, 8 bins: interior cuts at 1 + 999·i/8 (125.875, 250.75,
    // …) ⇒ bin i holds exactly 125 consecutive values
    val e = Profile.equidepth((1 to 1000).map(Tuple1(_)).toDF("v"), "v",
      nBins = 8).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    assert(e.keySet == (1 to 8).toSet)
    (1 to 8).foreach { i =>
      assert(e(i)._1 == 125L, s"bin $i depth ${e(i)._1}")
      assert(e(i)._2 == (i - 1) * 125 + 1.0 && e(i)._3 == i * 125.0,
        s"bin $i range ${e(i)._2}..${e(i)._3}")
    }
  }

  test("equidepth: heavy ties collapse into the lower bin (half-open " +
      "top-closed buckets), totals preserved — where equal-width dies") {
    val s = spark
    import s.implicits._
    // 90% constant: every interior cut but the last equals 1, so ties
    // at the cut all land in bin 1 and the tail spreads above it
    val df = (Seq.fill(900)(1) ++ (2 to 101)).map(Tuple1(_)).toDF("v")
    val e = Profile.equidepth(df, "v", nBins = 8).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    assert(e(1)._1 == 900L && e(1)._2 == 1.0 && e(1)._3 == 1.0)
    assert(e.values.map(_._1).sum == 1000L)
    assert(!e.contains(2) && !e.contains(7), // interior cuts collapsed
      s"tied cuts must skip intermediate bins: ${e.keySet}")
  }

  test("exactPercentiles: CDF formulation bit-equals the built-in " +
      "percentile aggregate on ties, floats and planted nulls") {
    val s = spark
    import s.implicits._
    // heavy ties + fractional values + nulls: the cases where a CDF
    // rank bug or off-by-one neighbor pick would surface
    val vals: Seq[java.lang.Double] =
      Seq.fill(37)(1.5: java.lang.Double) ++
        (1 to 113).map(i => (i * 0.25): java.lang.Double) ++
        Seq.fill(11)(7.75: java.lang.Double) ++
        Seq(null: java.lang.Double, null: java.lang.Double)
    val df = vals.map(Tuple1(_)).toDF("v").repartition(5)
    val probs = Seq(0.01, 0.125, 0.25, 0.5, 0.701, 0.875, 0.99)
    val cdf = Profile.exactPercentiles(df, "v", probs)
    val ref = df.where(col("v").isNotNull)
      .agg(expr(s"percentile(v, array(${probs.mkString(",")}))"))
      .head().getSeq[Double](0)
    assert(cdf == ref, s"cdf $cdf != percentile $ref")
  }

  test("exactPercentiles: integer-domain cuts at power-of-two probs " +
      "are exact multiples of 1/8 — the cross-engine bit-parity claim") {
    val s = spark
    import s.implicits._
    // pseudo-random integers (deterministic LCG), octile probs: every
    // interpolated cut must be k/8 exactly, so cut*8 is an integer —
    // the property the profile_equidepth oracle's exactness rests on
    var x = 12345L
    val ints = (1 to 997).map { _ =>
      x = (x * 6364136223846793005L + 1442695040888963407L) & 0x7fffffffL
      x % 1000003L
    }
    val df = ints.map(Tuple1(_)).toDF("v").repartition(6)
    val cuts = Profile.exactPercentiles(df, "v", (1 to 7).map(_ / 8.0))
    cuts.foreach(c => assert(c * 8 == math.rint(c * 8),
      s"cut $c is not an exact eighth"))
  }

  test("distinctCdf: the corpus-scale running sum partitions by bucket " +
      "(no SinglePartition sort of the distinct frame); bit-parity " +
      "holds on skewed, negative and outlier domains (r12)") {
    val s = spark
    import s.implicits._
    def refPercentiles(df: org.apache.spark.sql.DataFrame,
        probs: Seq[Double]): Seq[Double] =
      df.where(col("v").isNotNull)
        .agg(expr(s"percentile(v, array(${probs.mkString(",")}))"))
        .head().getSeq[Double](0)
    val probs = Seq(0.01, 0.25, 0.5, 0.733, 0.99)
    // (a) negatives + an extreme outlier: the affine bucket map parks
    // nearly everything in bucket 0 — parallelism degrades, cum must not
    val outlier = (Seq(-1.0e9, -5.0, -4.5, -4.5, -4.5) ++
      (1 to 200).map(_ * 0.125) :+ 1.0e12).map(Tuple1(_)).toDF("v")
      .repartition(7)
    // (b) high-cardinality uniform (the domain the two-phase split is
    // FOR: 10k distinct values spread over the buckets)
    var x = 99L
    val wide = (1 to 9973).map { _ =>
      x = (x * 6364136223846793005L + 1442695040888963407L) & 0x7fffffffL
      Tuple1(x.toDouble / 7.0)
    }.toDF("v").repartition(9)
    // (c) degenerate: a single distinct value (mx == mn → one bucket)
    val flat = Seq.fill(40)(Tuple1(3.25)).toDF("v")
    Seq(outlier, wide, flat).foreach { df =>
      assert(Profile.exactPercentiles(df, "v", probs) ==
        refPercentiles(df, probs))
    }
    // plan shape: the running sum over the distinct frame partitions by
    // bkt (65536-way parallel); only the ≤65536-row bucket-offset window
    // is partition-less. A revert to the global orderBy shape would put
    // the order column FIRST in a partition-less windowspecdefinition.
    val plan = Profile.distinctCdf(wide.where(col("v").isNotNull), col("v"))
      .queryExecution.executedPlan.toString
    assert("windowspecdefinition\\(bkt#\\d+L?, v#".r
      .findFirstIn(plan).isDefined,
      s"data window no longer partitions by bkt:\n${plan.take(800)}")
    assert("windowspecdefinition\\(v#\\d+ ASC".r.findFirstIn(plan).isEmpty,
      s"partition-less window over the distinct frame is back:\n${plan.take(800)}")
  }

  test("equidepth: GK approx path matches exact depths within one " +
      "element per cut at tight relErr") {
    val s = spark
    import s.implicits._
    val df = (1 to 1000).map(Tuple1(_)).toDF("v")
    // approxQuantile returns actual elements (no interpolation), so a
    // cut can sit one element off the interpolated exact cut — depths
    // shift by at most 1 at each of the two bin edges
    val a = Profile.equidepth(df, "v", nBins = 8, exact = false,
      relErr = 1e-5).collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(a.values.sum == 1000L)
    (1 to 8).foreach(i => assert(math.abs(a(i) - 125L) <= 2,
      s"approx bin $i depth ${a(i)} drifted from 125"))
  }

  test("keySkew: hand-computed skew metrics on a planted hot key; " +
      "nulls excluded") {
    val s = spark
    import s.implicits._
    // "hot" x80, k1..k20 x1 each, plus null keys that must not count
    val keys: Seq[Option[String]] =
      Seq.fill(80)(Some("hot")) ++ (1 to 20).map(i => Some(s"k$i")) ++
        Seq.fill(5)(Option.empty[String])
    val df = keys.toDF("k")
    val r = Profile.keySkew(df, "k").collect().head
    assert(r.getAs[Long]("n_rows") == 100L)
    assert(r.getAs[Long]("n_keys") == 21L)
    assert(r.getAs[Long]("max_cnt") == 80L)
    assert(math.abs(r.getAs[Double]("top1_share") - 0.8) < 1e-9)
    // top-10 = hot(80) + nine singletons = 89
    assert(math.abs(r.getAs[Double]("top10_share") - 0.89) < 1e-9)
    // 80 / (100/21) = 16.8
    assert(math.abs(r.getAs[Double]("skew_ratio") - 16.8) < 1e-6)
  }

  test("keySkew: uniform keys read ratio ~= 1 and shares ~= k/n") {
    val s = spark
    import s.implicits._
    val df = (0 until 300).map(i => s"u${i % 30}").toDF("k")
    val r = Profile.keySkew(df, "k").collect().head
    assert(r.getAs[Long]("n_keys") == 30L)
    assert(math.abs(r.getAs[Double]("skew_ratio") - 1.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("top10_share") - (100.0 / 300.0)) < 1e-5)
  }

  test("psiDrift: identical half distributions read psi = 0 exactly; " +
      "all bins emit") {
    val s = spark
    import s.implicits._
    val rows = (0 until 200).map { i =>
      val t = if (i < 100) i else 1000 + i // two time clusters
      (t.toLong, (i % 10).toDouble)
    }
    val df = rows.toDF("sec", "value")
      .withColumn("ts", col("sec").cast("timestamp")).drop("sec")
    val out = Profile.psiDrift(df, "value").orderBy("bin").collect()
    assert(out.length == 10)
    out.foreach { r =>
      assert(r.getAs[Double]("psi_term") == 0.0)
      assert(r.getAs[Double]("psi_total") == 0.0)
      assert(r.getAs[Long]("n_a") == r.getAs[Long]("n_b"))
    }
  }

  test("psiDrift: a shifted second half crosses the 0.25 drift bar; " +
      "empty bins stay finite via the eps floor") {
    val s = spark
    import s.implicits._
    val rows = (0 until 200).map { i =>
      val t = if (i < 100) i else 1000 + i
      val v = if (i < 100) (i % 5).toDouble else 20.0 + (i % 5)
      (t.toLong, v)
    }
    val df = rows.toDF("sec", "value")
      .withColumn("ts", col("sec").cast("timestamp")).drop("sec")
    val out = Profile.psiDrift(df, "value").collect()
    val total = out.head.getAs[Double]("psi_total")
    assert(total > 0.25, s"psi_total $total")
    assert(out.forall(r => !r.getAs[Double]("psi_term").isNaN &&
      !r.getAs[Double]("psi_term").isInfinite))
    // disjoint supports: every populated bin is one-sided
    assert(out.forall(r =>
      r.getAs[Long]("n_a") == 0L || r.getAs[Long]("n_b") == 0L))
  }
}
