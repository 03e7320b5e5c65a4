package graft.llm

import graft.SparkSpec
import org.apache.spark.ml.linalg.{SparseVector, Vector}
import org.apache.spark.sql.functions._

class TextFeaturesSpec extends SparkSpec {

  test("tfidf: right arity, nonzero for real docs, rare terms outweigh common") {
    val s = spark
    import s.implicits._
    // "common" appears in every doc (idf = 0 weight direction),
    // "rare" appears once
    val docs = Seq(
      (0L, "common words common everywhere"),
      (1L, "common text common body"),
      (2L, "common rare common")).toDF("doc_id", "text")
    val out = TextFeatures.tfidf(docs, numFeatures = 1 << 12)
    assert(out.count() == 3)
    val vecs = out.orderBy("doc_id").collect()
      .map(_.getAs[Vector]("tfidf").asInstanceOf[SparseVector])
    assert(vecs.forall(_.size == (1 << 12)))
    // doc 2 contains the rare term: its max component (rare) must exceed
    // the weight of the ubiquitous term (idf of all-docs term is low)
    val hash = new org.apache.spark.ml.feature.HashingTF()
      .setNumFeatures(1 << 12)
    val commonIdx = hash.indexOf("common")
    val rareIdx = hash.indexOf("rare")
    assert(vecs(2)(rareIdx) > vecs(2)(commonIdx))
  }

  test("tfidf: runs on the documents fixture") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val out = TextFeatures.tfidf(docs)
    assert(out.count() == 500)
    assert(out.head().getAs[Vector]("tfidf").numNonzeros > 0)
  }
}
