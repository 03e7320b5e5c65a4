package graft.functions

import graft.SparkSpec
import graft.llm.{Dedup, TextAnalysis}
import org.apache.spark.sql.functions._

class RollingChunkHashesSpec extends SparkSpec {

  private def chunksOf(text: String): Seq[Long] = {
    val s = spark
    import s.implicits._
    Seq((1L, text)).toDF("doc_id", "text")
      .select(RollingChunkHashes(col("text"), 6, 16).as("c"))
      .head().getSeq[Long](0)
  }

  private val para =
    "the quick brown fox jumps over the lazy dog while the rain in " +
      "spain stays mainly in the plain and the cat sat on the mat " +
      "watching clouds drift over the quiet harbor through the long afternoon"

  test("deterministic; empty string yields empty array; non-empty yields chunks") {
    assert(chunksOf(para) == chunksOf(para))
    assert(chunksOf("") == Seq.empty)
    assert(chunksOf(para).nonEmpty)
  }

  test("content-defined locality: a point edit preserves most chunks") {
    val edited = para.replace("harbor", "harbour")
    val a = chunksOf(para).toSet
    val b = chunksOf(edited).toSet
    val jaccard = (a & b).size.toDouble / (a | b).size
    assert(jaccard > 0.4, s"jaccard=$jaccard a=${a.size} b=${b.size}")
    assert(a != b) // the edit does change the containing chunk
  }

  test("shared passage at different offsets produces shared chunks") {
    val docA = "unrelated preamble text before anything. " + para
    val docB = para + " and then a completely different ending follows here."
    val shared = chunksOf(docA).toSet & chunksOf(docB).toSet
    assert(shared.size >= 2, s"shared=${shared.size}")
  }

  test("passagePairs: finds a planted lifted paragraph, skips unrelated docs") {
    val s = spark
    import s.implicits._
    val base = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text").limit(50)
    val planted = base.unionByName(Seq(
      (800001L, "intro words first. " + para),
      (800002L, para + " closing words after.")).toDF("doc_id", "text"))
    val pairs = Dedup.passagePairs(planted, minShared = 2)
    assert(pairs.filter(
      col("id_a") === 800001L && col("id_b") === 800002L).count() == 1)
  }

  test("passageVerified: exact shared-gram count for a lifted paragraph; " +
      "sub-threshold pairs dropped") {
    val s = spark
    import s.implicits._
    val base = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text").limit(50)
    val planted = base.unionByName(Seq(
      (800001L, "intro words first. " + para),
      (800002L, para + " closing words after.")).toDF("doc_id", "text"))
    val out = Dedup.passageVerified(planted)
      .filter(col("id_a") === 800001L && col("id_b") === 800002L)
      .collect()
    assert(out.length == 1)
    // exact ground truth: shared distinct 8-grams of the two planted
    // texts, computed locally with the same tokenization
    def grams(t: String): Set[String] = {
      val toks = t.toLowerCase.split("[^\\p{L}\\p{N}]+").filter(_.nonEmpty)
      if (toks.length >= 8) toks.sliding(8).map(_.mkString(" ")).toSet
      else Set(toks.mkString(" "))
    }
    val expected = (grams("intro words first. " + para) &
      grams(para + " closing words after.")).size
    assert(out.head.getAs[Int]("shared_ngrams") == expected)
    assert(expected >= 10) // the planted pair clears the threshold
    // a pair sharing chunks but fewer than minSharedGrams grams is
    // verified OUT (precision): raise the bar past the planted overlap
    val strict = Dedup.passageVerified(planted,
      minSharedGrams = expected + 1)
      .filter(col("id_a") === 800001L && col("id_b") === 800002L)
    assert(strict.count() == 0)
  }

  test("chunkFingerprints: normalization folds into the fingerprint") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "Foo  Bar  Baz"), (2L, "foo bar baz")).toDF("doc_id", "text")
    val out = TextAnalysis.chunkFingerprints(df).orderBy("doc_id")
      .collect().map(_.getSeq[Long](2))
    assert(out(0) == out(1))
  }
}
