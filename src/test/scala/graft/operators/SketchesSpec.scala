package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Query-level KMV compositions: set-overlap arithmetic in both
  * regimes and sample-quantiles' exact-subset degeneracy — the
  * invariants behind the events_overlap_kmv / text_sample_quantiles
  * oracle rows. */
class SketchesSpec extends SparkSpec {

  test("kmvOverlap exact regime: below-k sides make jaccard and " +
      "intersection EXACT (every hash retained)") {
    val s = spark
    import s.implicits._
    // A = u10..u39 (30), B = u20..u44 (25): |A∩B| = 20, |A∪B| = 35
    val rows = (0 until 30).map(i => ("a", s"u${i + 10}")) ++
      (0 until 25).map(i => ("b", s"u${i + 20}"))
    val df = rows.toDF("grp", "key")
    val sks = Sketches.kmvSketch(df, "grp", "key", k = 64)
    val r = Sketches.kmvOverlap(sks, "grp", "a", "b", k = 64).head()
    assert(r.getAs[Double]("n_a_est") == 30.0)
    assert(r.getAs[Double]("n_b_est") == 25.0)
    assert(r.getAs[Double]("n_union_est") == 35.0)
    assert(r.getAs[Double]("jaccard_est") == 20.0 / 35.0)
    // same IEEE op order as the operator: (m/|U|)·|U| — not assumed
    // to round-trip to the integer
    assert(r.getAs[Double]("n_inter_est") == 20.0 / 35.0 * 35.0)
  }

  test("kmvOverlap approximate regime: planted 50% overlap estimated " +
      "within the CLT bound; estimates insensitive to partitioning") {
    val s = spark
    import s.implicits._
    // |A|=|B|=4000, |A∩B|=2000 (ids 2000..3999 shared)
    val rows = (0 until 4000).map(i => ("a", s"u$i")) ++
      (0 until 4000).map(i => ("b", s"u${i + 2000}"))
    val k = 256
    def run(nPart: Int) = Sketches.kmvOverlap(
      Sketches.kmvSketch(rows.toDF("grp", "key").repartition(nPart),
        "grp", "key", k),
      "grp", "a", "b", k).head()
    val r = run(3)
    val inter = r.getAs[Double]("n_inter_est")
    assert(math.abs(inter - 2000.0) / 2000.0 < 0.35,
      s"n_inter_est=$inter") // ratio-of-estimates: looser than 1/sqrt(k)
    val union = r.getAs[Double]("n_union_est")
    assert(math.abs(union - 6000.0) / 6000.0 < 4.0 / math.sqrt(k.toDouble),
      s"n_union_est=$union")
    // determinism across partitionings — the oracle-row claim
    val r2 = run(7)
    assert(r2.getAs[Double]("n_inter_est") == inter)
    assert(r2.getAs[Double]("jaccard_est") == r.getAs[Double]("jaccard_est"))
  }

  test("sampleQuantiles: a group that fits in m degrades to the exact " +
      "quantiles; an over-m group samples exactly m rows") {
    val s = spark
    import s.implicits._
    val df = ((0 until 10).map(i => ("small", i.toLong, (i + 1) * 10)) ++
      (0 until 100).map(i => ("big", (i + 100).toLong, i))).toDF(
      "src", "id", "v")
    val out = Sketches.sampleQuantiles(df, "src", "id", col("v"),
      m = 16, probs = Seq(0.5, 0.9))
      .collect().map(r => r.getAs[String]("src") -> r).toMap
    val sm = out("small")
    assert(sm.getAs[Long]("n_sampled") == 10L)
    assert(sm.getAs[Double]("p50_sample") == sm.getAs[Double]("p50_exact"))
    assert(sm.getAs[Double]("p90_sample") == sm.getAs[Double]("p90_exact"))
    val big = out("big")
    assert(big.getAs[Long]("n_rows") == 100L)
    assert(big.getAs[Long]("n_sampled") == 16L)
    // the 16-row hash sample is uniform: its median lands inside the
    // central half of the 0..99 value range (loose sanity, exact value
    // pinned by the oracle row)
    val p50 = big.getAs[Double]("p50_sample")
    assert(p50 > 10.0 && p50 < 90.0, s"p50_sample=$p50")
  }

  test("sampleSketch + kmvMerge + sampleQuantilesFromSketches: merged " +
      "batch artifacts answer EXACTLY like the one-shot pass (min-k of " +
      "a set union), under any batch split") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val vcol = size(split(col("text"), "\\s+"))
    val oneShot = Sketches.sampleQuantiles(docs, "source", "doc_id",
      vcol, m = 16, probs = Seq(0.5, 0.9))
    for (mod <- Seq(2, 3)) {
      val halves = (0 until mod).map(r =>
        Sketches.sampleSketch(docs.filter(col("doc_id") % mod === r),
          "source", "doc_id", vcol, m = 16))
      val merged = Sketches.kmvMerge(halves.reduce(_ unionByName _),
        "source", k = 16)
      val viaMerge = Sketches.sampleQuantilesFromSketches(merged, docs,
        "source", vcol, probs = Seq(0.5, 0.9))
      assert(viaMerge.exceptAll(oneShot).count() == 0 &&
        oneShot.exceptAll(viaMerge).count() == 0,
        s"merge of $mod batches diverged from the one-shot sample")
    }
  }

  test("kmvOverlap: a group absent from the sketch frame (typo'd name, " +
      "all-null keys) fails loudly instead of emitting an empty frame") {
    val s = spark
    import s.implicits._
    val sks = Sketches.kmvSketch(
      Seq(("a", "u1"), ("a", "u2")).toDF("grp", "key"), "grp", "key")
    val e = intercept[IllegalArgumentException] {
      Sketches.kmvOverlap(sks, "grp", "a", "missing")
    }
    assert(e.getMessage.contains("missing"), e.getMessage)
  }

  test("sampleQuantiles: null ids and null measures are dropped, not " +
      "crashes (the aggregator's primitive input cannot carry null)") {
    val s = spark
    import s.implicits._
    val df = Seq[(String, java.lang.Long, java.lang.Integer)](
      ("a", 1L, 10), ("a", 2L, 20), ("a", 3L, 30),
      ("a", null, 99), ("a", 4L, null)).toDF("src", "id", "v")
    val r = Sketches.sampleQuantiles(df, "src", "id", col("v"),
      m = 8, probs = Seq(0.5)).head()
    assert(r.getAs[Long]("n_sampled") == 3L)
    assert(r.getAs[Double]("p50_sample") == 20.0)
    assert(r.getAs[Double]("p50_exact") == 20.0)
  }
}
