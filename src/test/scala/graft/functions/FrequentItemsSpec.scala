package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.functions._

/** Misra–Gries sketch: exact-regime equality with the GROUP BY truth
  * (what the text_heavy_hitters_sketch oracle row pins end-to-end),
  * approximation-regime retention + error-bound guarantees under
  * forced multi-partition merges, and the pure sketch algebra. */
class FrequentItemsSpec extends SparkSpec {

  private def counts(pairs: (String, Long)*): Map[String, Long] = pairs.toMap

  test("exact regime: capacity >= distinct ⇒ counts equal GROUP BY, " +
      "maxError 0, independent of partitioning") {
    val s = spark
    import s.implicits._
    val items = Seq.fill(40)("a") ++ Seq.fill(25)("b") ++
      Seq.fill(9)("c") ++ Seq("d", "e", "f")
    val truth = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val mg = udaf(new MisraGries(8), Encoders.STRING)
    Seq(1, 3, 7).foreach { nPart =>
      val st = items.toDF("t").repartition(nPart)
        .agg(mg(col("t")).as("sk")).select("sk.*").as[MgState].head()
      assert(st.maxError == 0L, s"nPart=$nPart")
      assert(st.counts == truth, s"nPart=$nPart")
    }
  }

  test("approximate regime: every item above N/(capacity+1) retained; " +
      "counters are lower bounds within maxError; maxError bounded") {
    val s = spark
    import s.implicits._
    val rares = (1 to 50).flatMap(i => Seq.fill(2)(f"rare$i%02d"))
    val items = Seq.fill(600)("hot") ++ Seq.fill(200)("warm") ++ rares
    val n = items.size // 900
    val capacity = 8
    val truth = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val mg = udaf(new MisraGries(capacity), Encoders.STRING)
    Seq(1, 6).foreach { nPart =>
      val st = items.toDF("t").repartition(nPart)
        .agg(mg(col("t")).as("sk")).select("sk.*").as[MgState].head()
      assert(st.counts.size <= capacity)
      assert(st.maxError <= n / (capacity + 1L),
        s"maxError ${st.maxError} exceeds N/(cap+1)")
      // classical retention: true count > N/(capacity+1) = 100 ⇒ kept
      Seq("hot", "warm").foreach(k =>
        assert(st.counts.contains(k), s"$k dropped at nPart=$nPart"))
      // every counter is a lower bound, within maxError of the truth
      st.counts.foreach { case (k, v) =>
        assert(v <= truth(k), s"$k counter $v overshoots ${truth(k)}")
        assert(truth(k) <= v + st.maxError,
          s"$k counter $v + err ${st.maxError} under ${truth(k)}")
      }
    }
  }

  test("capacity contract: the registered capacity covers the fixture " +
      "bigram vocabulary with >= 2x margin, INCLUDING under the sf1 " +
      "replica-suffix recipe that overflowed the original cap") {
    // the sf1 rehearsal showed testdata drift CAN grow the vocabulary:
    // scripts/make_sf1.py's replica suffixes (text || ' rK') minted
    // 931 -> 1210 bigram types and overflowed the original 1024 cap —
    // caught only at gate time. This spec applies THAT recipe to the
    // sf0.001 fixture so the drift mode itself is under CI, not just
    // the base vocabulary.
    val s = spark
    import s.implicits._
    val base = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("text")
    val replicated = (0 to 9).map { k =>
      if (k == 0) base
      else base.select(concat(col("text"), lit(s" r$k")).as("text"))
    }.reduce(_ unionByName _)
    def vocabOf(d: org.apache.spark.sql.DataFrame): Long =
      d.select(explode(
          graft.functions.WordNgrams(col("text"), 2, strictFallback = false))
          .as("gram"))
        .filter(size(split(col("gram"), " ")) === 2)
        .distinct().count()
    val grown = vocabOf(replicated)
    assert(vocabOf(base) < grown, "the recipe must actually mint types")
    assert(grown * 2 <= FrequentItems.DefaultCapacity,
      s"sf1-recipe bigram vocabulary $grown is within 2x of the " +
        s"registered capacity ${FrequentItems.DefaultCapacity} — raise " +
        "FrequentItems.DefaultCapacity")
  }

  test("persisted workflow: sketch -> write -> read -> merge equals " +
      "the one-pass sketch; artifact is <= capacity+1 rows") {
    val s = spark
    import s.implicits._
    val a = Seq.fill(30)("x") ++ Seq.fill(12)("y") ++ Seq("p", "q")
    val b = Seq.fill(20)("x") ++ Seq.fill(25)("z") ++ Seq("q", "r")
    val cap = 16
    val tmp = java.nio.file.Files.createTempDirectory("graft_fi")
    try {
      val skA = FrequentItems.sketch(a.toDF("t"), "t", cap)
      FrequentItems.writeSketch(spark, skA, s"$tmp/sk")
      assert(spark.read.parquet(s"$tmp/sk").count() <= cap + 1L)
      val back = FrequentItems.readSketch(spark, s"$tmp/sk")
      assert(back == skA, "parquet round-trip must be lossless")
      val merged = FrequentItems.merge(back,
        FrequentItems.sketch(b.toDF("t"), "t", cap), cap)
      val onePass = FrequentItems.sketch((a ++ b).toDF("t"), "t", cap)
      assert(merged.counts == onePass.counts && merged.maxError == 0L,
        s"merged $merged != one-pass $onePass")
      val top = FrequentItems.topK(spark, merged, 3).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      assert(top.toSeq == Seq(("x", 50L, 0L), ("z", 25L, 0L),
        ("y", 12L, 0L)))
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(tmp.toFile)
    }
  }

  test("property: MG bounds hold for random streams, capacities and " +
      "merge trees (untracked items bounded by maxError too)") {
    val rng = new scala.util.Random(7)
    (1 to 25).foreach { trial =>
      val cap = 1 + rng.nextInt(12)
      val n = 50 + rng.nextInt(400)
      // zipf-ish: item i drawn with weight ~ 1/(i+1)
      val universe = (0 until 30).map(i => f"it$i%02d")
      val stream = Seq.fill(n) {
        val z = rng.nextDouble()
        universe(math.min(29, (1.0 / (z + 0.02) - 1).toInt % 30))
      }
      val truth = stream.groupBy(identity).view.mapValues(_.size.toLong)
      val mg = new MisraGries(cap)
      // random chunking + random-order pairwise merges = an arbitrary
      // distributed merge tree
      var parts = stream.grouped(1 + rng.nextInt(40))
        .map(chunk => chunk.foldLeft(mg.zero)(mg.reduce)).toVector
      while (parts.size > 1) {
        val i = rng.nextInt(parts.size)
        val a = parts(i); parts = parts.patch(i, Nil, 1)
        val j = rng.nextInt(parts.size)
        parts = parts.updated(j, mg.merge(a, parts(j)))
      }
      val st = parts.head
      assert(st.counts.size <= cap, s"trial $trial: size over capacity")
      assert(st.maxError <= n / (cap + 1L),
        s"trial $trial: maxError ${st.maxError} > N/(cap+1)")
      universe.foreach { k =>
        val est = st.counts.getOrElse(k, 0L)
        val t = truth.getOrElse(k, 0L)
        assert(est <= t, s"trial $trial: $k overestimated $est > $t")
        assert(t <= est + st.maxError,
          s"trial $trial: $k true $t exceeds $est + ${st.maxError}")
      }
    }
  }

  test("sketch algebra: reduce decrement-all on overflow; merge " +
      "offset-truncates to capacity and accumulates the error") {
    val mg = new MisraGries(2)
    // fill to capacity, then an untracked item decrements all
    val s1 = mg.reduce(mg.reduce(mg.reduce(mg.zero, "a"), "a"), "b")
    assert(s1 == MgState(counts("a" -> 2L, "b" -> 1L), 0L))
    val s2 = mg.reduce(s1, "c") // full: a→1, b drops, error 1
    assert(s2 == MgState(counts("a" -> 1L), 1L))
    // merge over capacity: offset = 3rd-largest (2); survivors shed it
    val m = mg.merge(
      MgState(counts("a" -> 5L, "b" -> 3L), 1L),
      MgState(counts("c" -> 2L, "b" -> 1L), 2L))
    assert(m == MgState(counts("a" -> 3L, "b" -> 2L), 5L))
  }

  test("null items are ignored at ingestion, not tracked as a counter " +
      "(the writeSketch reserved-slot contract, r12 advice)") {
    val mg = new MisraGries(2)
    // pure algebra: a null reduce is the identity
    val s1 = mg.reduce(mg.reduce(mg.zero, "a"), null)
    assert(s1 == MgState(counts("a" -> 1L), 0L))
    // end-to-end: a null-bearing column sketches exactly like the
    // null-free twin (SQL GROUP BY likewise never counts NULL), and
    // the state persists without tripping the reserved-slot require
    val s = spark
    import s.implicits._
    val withNulls = (Seq.fill(5)(Some("a")) ++ Seq(None, None) ++
      Seq.fill(2)(Some("b"))).toDF("t")
    val st = FrequentItems.sketch(withNulls, "t", 2)
    assert(st == MgState(counts("a" -> 5L, "b" -> 2L), 0L))
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-mg-null").toString
    FrequentItems.writeSketch(spark, st, s"$tmp/sk")
    assert(FrequentItems.readSketch(spark, s"$tmp/sk") == st)
  }
}
