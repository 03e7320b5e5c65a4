package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bigram-LM perplexity: hand-computed tiny-corpus values, the
  * unseen-bigram smoothing branch, and the filter form. */
class LanguageModelSpec extends SparkSpec {

  // corpus: bigrams (a,b)x3, (b,a)x1 → c(a)=3, c(b)=1; V = {a,b,c} = 3
  private def corpus = {
    val s = spark
    import s.implicits._
    Seq((1L, "a b a b"), (2L, "a b"), (3L, "c"))
      .toDF("doc_id", "text")
  }

  private val pBA = 3.5 / 4.5 // p(b|a) = (3 + .5) / (3 + .5*3)
  private val pAB = 1.5 / 2.5 // p(a|b) = (1 + .5) / (1 + .5*3)
  private def r6(x: Double) =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("self-scored perplexity matches hand computation") {
    val got = LanguageModel.perplexity(corpus).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      .toMap
    val ppl1 = math.exp(-(2 * math.log(pBA) + math.log(pAB)) / 3.0)
    assert(got(1L)._1 === 3L)
    assert(got(1L)._2.get === r6(ppl1))
    assert(got(2L) === ((1L, Some(r6(1 / pBA)))))
    assert(got(3L) === ((0L, None))) // < 2 tokens: no bigrams, NULL ppl
  }

  test("tokenization is lower-cased letter runs") {
    val s = spark
    import s.implicits._
    val noisy = Seq((1L, "A  b!"), (2L, "a b")).toDF("doc_id", "text")
    val got = LanguageModel.perplexity(noisy).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // both docs normalize to the same bigram → identical scores
    assert(got(1L) === got(2L))
  }

  test("scoring a foreign corpus hits the smoothing branches") {
    val s = spark
    import s.implicits._
    val model = LanguageModel.bigramModel(corpus)
    val foreign = Seq((10L, "x y"), (11L, "a c")).toDF("doc_id", "text")
    val got = LanguageModel
      .perplexityAgainst(foreign, model, vocabSize = 3L)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // unknown context: p = .5 / (0 + .5*3) = 1/3 → ppl 3
    assert(got(10L) === 3.0)
    // known context a (c1=3), unseen pair: p = .5 / (3 + 1.5) = 1/9
    assert(got(11L) === 9.0)
  }

  test("crossPerplexity == bigramModel + perplexityAgainst with the " +
      "train-slice vocab; disjoint train slice exercises smoothing") {
    val s = spark
    import s.implicits._
    val train = Seq((1L, "a b a b"), (2L, "a b c")).toDF("doc_id", "text")
    val score = Seq((10L, "x y"), (11L, "a c"), (12L, "a b"))
      .toDF("doc_id", "text")
    val composed = LanguageModel.perplexityAgainst(score,
      LanguageModel.bigramModel(train), vocabSize = 3L)
    val cross = LanguageModel.crossPerplexity(train, score)
    assert(cross.exceptAll(composed).count() == 0 &&
      composed.exceptAll(cross).count() == 0)
    val got = cross.collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // V = |{a,b,c}| = 3; unknown context x: p = .5/(.5*3) = 1/3 → ppl 3
    assert(got(10L) === 3.0)
    // train bigrams: (a,b)x3, (b,a), (b,c) → c(a) = 3, c12(a,b) = 3.
    // known context a, unseen pair (a,c): p = .5/(3 + 1.5) = 1/9 → ppl 9
    assert(got(11L) === 9.0)
    // fully in-model bigram (a,b): p = (3 + .5)/(3 + 1.5) = 7/9;
    // ppl column is 6dp-rounded, so compare at that precision
    assert(got(12L) === math.rint(9.0 / 7.0 * 1e6) / 1e6)
  }

  test("model persistence: reloaded model scores identically; vocab " +
      "size rides the artifact") {
    val s = spark
    import s.implicits._
    val train = Seq((1L, "a b a b"), (2L, "a b c")).toDF("doc_id", "text")
    val score = Seq((10L, "a b x"), (11L, "c a")).toDF("doc_id", "text")
    val model = LanguageModel.bigramModel(train)
    val direct = LanguageModel.perplexityAgainst(score, model,
      vocabSize = 3L)
    val tmp = java.nio.file.Files.createTempDirectory("graft-lm").toString
    try {
      LanguageModel.writeModel(model, 3L, tmp)
      val (loaded, v) = LanguageModel.readModel(spark, tmp)
      assert(v == 3L)
      val rescored = LanguageModel.perplexityAgainst(score, loaded, v)
      assert(rescored.exceptAll(direct).count() == 0 &&
        direct.exceptAll(rescored).count() == 0)
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
      }
      rm(new java.io.File(tmp))
    }
  }

  test("streaming scorer leg: complete-mode aggregates over TWO " +
      "micro-batches + shared shaping == batch perplexityAgainst (r16)") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val model = LanguageModel.bigramModel(corpus)
    val expected = LanguageModel.perplexityAgainst(corpus, model, 3L)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSet
    val stream = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val q = LanguageModel.perplexityAggregates(
        stream.toDS.toDF("doc_id", "text"), model, 3L)
      .writeStream.format("memory").queryName("ppl_stream")
      .outputMode("complete").start()
    try {
      stream.addData((1L, "a b a b"), (3L, "c"))
      q.processAllAvailable()
      stream.addData((2L, "a b")) // second batch re-emits the snapshot
      q.processAllAvailable()
      val got = LanguageModel.perplexityShape(
          corpus, spark.table("ppl_stream"))
        .collect().map(r => (r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSet
      assert(got == expected, s"streamed $got != batch $expected")
    } finally q.stop()
  }

  test("perplexityFilter keeps low-ppl and unscorable docs") {
    val kept = LanguageModel.perplexityFilter(corpus, maxPpl = 1.3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // doc2 ppl ≈ 1.2857 ≤ 1.3; doc1 ≈ 1.367 dropped; doc3 NULL kept
    assert(kept === Set(2L, 3L))
  }

  test("fitted model frame carries the smoothed probabilities") {
    val m = LanguageModel.bigramModel(corpus).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(m(("a", "b")) === ((3L, 3L, pBA)))
    assert(m(("b", "a")) === ((1L, 1L, pAB)))
    assert(m.size === 2)
  }
}
