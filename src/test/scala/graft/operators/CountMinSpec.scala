package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CountMinSpec extends SparkSpec {

  private def tokens = {
    val s = spark
    import s.implicits._
    // skewed multiset: "alpha" ×8, "beta" ×4, "gamma" ×2, singles
    (Seq.fill(8)("alpha") ++ Seq.fill(4)("beta") ++ Seq.fill(2)("gamma") ++
      Seq("delta", "epsilon", "zeta", "eta", "theta"))
      .toDF("term")
  }

  test("count-min: estimate >= exact for every key, always") {
    val exact = tokens.groupBy(col("term")).agg(count(lit(1)).as("n_exact"))
    // width 4 forces heavy collisions — the over-count regime
    val sk = CountMin.sketch(tokens, col("term"), depth = 3, width = 4)
    val est = CountMin.estimate(sk, exact, "term", depth = 3, width = 4)
      .collect()
    assert(est.nonEmpty)
    est.foreach { r =>
      val (nExact, cmEst) = (r.getAs[Long]("n_exact"), r.getAs[Long]("cm_est"))
      assert(cmEst >= nExact,
        s"${r.getAs[String]("term")}: est $cmEst < exact $nExact")
    }
  }

  test("count-min: exact regime when width clears the key domain " +
      "(no collisions possible to force, checked empirically)") {
    // 8 distinct keys into width 4096 × depth 4: collisions across all
    // four rows simultaneously are astronomically unlikely; the min
    // over rows then recovers exact counts for this fixture.
    val exact = tokens.groupBy(col("term")).agg(count(lit(1)).as("n_exact"))
    val sk = CountMin.sketch(tokens, col("term"), depth = 4, width = 4096)
    val est = CountMin.estimate(sk, exact, "term", depth = 4, width = 4096)
    assert(est.filter(col("cm_est") =!= col("n_exact")).count() == 0)
  }

  test("count-min: absent keys read their collision mass, never null") {
    val s = spark
    import s.implicits._
    val sk = CountMin.sketch(tokens, col("term"), depth = 3, width = 4)
    val probes = Seq("missing", "alsomissing").toDF("term")
    val est = CountMin.estimate(sk, probes, "term", depth = 3, width = 4)
      .collect()
    assert(est.length == 2)
    est.foreach(r => assert(r.getAs[Long]("cm_est") >= 0L))
  }

  test("count-min: merged split-halves sketch equals the one-shot " +
      "sketch cell-for-cell (the lifecycle-row identity)") {
    val s = spark
    import s.implicits._
    val withId = tokens.withColumn("id", monotonically_increasing_id())
    val h1 = CountMin.sketch(withId.filter(col("id") % 2 === 0),
      col("term"), depth = 4, width = 64)
    val h2 = CountMin.sketch(withId.filter(col("id") % 2 === 1),
      col("term"), depth = 4, width = 64)
    val merged = CountMin.merge(h1.unionByName(h2))
      .withColumn("cnt", col("cnt").cast("long"))
    val oneShot = CountMin.sketch(withId, col("term"), depth = 4, width = 64)
    assert(merged.exceptAll(oneShot).count() == 0)
    assert(oneShot.exceptAll(merged).count() == 0)
  }

  test("count-min: buckets stay in [0, width) across depths") {
    val sk = CountMin.sketch(tokens, col("term"), depth = 4, width = 16)
    assert(sk.filter(col("bucket") < 0 || col("bucket") >= 16).count() == 0)
    assert(sk.filter(col("depth") < 0 || col("depth") >= 4).count() == 0)
    // total mass per depth row == token count (each token lands once per row)
    val n = tokens.count()
    val perDepth = sk.groupBy(col("depth")).agg(sum(col("cnt")).as("m"))
      .collect()
    assert(perDepth.length == 4)
    perDepth.foreach(r => assert(r.getAs[Long]("m") == n))
  }

  test("count-min: sketchWeighted from per-key counts equals the raw " +
      "occurrence-stream sketch cell-for-cell (tokenize-once identity, " +
      "r17 verdict item 5)") {
    // cell counters are sums of the counts of the keys hashing there,
    // so pre-aggregating the stream by key before sketching changes
    // NOTHING — the identity that lets the registered CMS rows share
    // one corpus pass between their exact-probe and sketch sides.
    val counts = tokens.groupBy(col("term")).agg(count(lit(1)).as("n"))
    val raw = CountMin.sketch(tokens, col("term"), depth = 4, width = 16)
    val weighted = CountMin.sketchWeighted(counts, col("term"), col("n"),
      depth = 4, width = 16)
    assert(raw.collect().toSet.nonEmpty)
    assert(raw.exceptAll(weighted).count() == 0)
    assert(weighted.exceptAll(raw).count() == 0)
    // null keys dropped, matching sketch
    val s = spark
    import s.implicits._
    val withNull = Seq(Some("a"), None).toDF("term")
      .groupBy(col("term")).agg(count(lit(1)).as("n"))
    val skNull = CountMin.sketchWeighted(withNull, col("term"), col("n"),
      depth = 2, width = 8)
    assert(skNull.agg(sum(col("cnt"))).head().getLong(0) == 2L)
  }
}
