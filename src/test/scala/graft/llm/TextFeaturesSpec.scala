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

  test("tfidfExact: crafted tf/df/rank values and topK bound") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (0L, "alpha alpha beta common"),
      (1L, "beta common common"),
      (2L, "gamma common")).toDF("doc_id", "text")
    val out = TextFeatures.tfidfExact(docs, topK = 2)
    val rows = out.collect().map(r => (r.getLong(0), r.getString(1)) ->
      (r.getLong(2), r.getLong(3), r.getDouble(4), r.getInt(5))).toMap
    // doc 0: alpha tf=2 df=1 rank 1; beta tf=1 df=2 rank 2 (common df=3
    // loses the df tie-break at tf=1); topK=2 drops common
    assert(rows((0L, "alpha")) == ((2L, 1L,
      math.rint(2 * (math.log(4.0 / 2.0) + 1) * 1e6) / 1e6, 1)))
    assert(rows((0L, "beta"))._4 == 2)
    assert(!rows.contains((0L, "common")))
    // doc 1: common tf=2 beats beta tf=1
    assert(rows((1L, "common"))._4 == 1)
    assert(rows((1L, "beta"))._4 == 2)
    // doc 2: gamma (df=1, rare) ranks above common (df=3) at equal tf
    assert(rows((2L, "gamma"))._4 == 1)
    assert(rows((2L, "common"))._4 == 2)
    // idf monotonicity: the everywhere-term scores lowest at equal tf
    assert(rows((2L, "gamma"))._3 > rows((2L, "common"))._3)
    assert(out.groupBy("doc_id").count().collect()
      .forall(_.getLong(1) <= 2))
  }

  test("tfidfExact: rank filter plans as a map-side WindowGroupLimit") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val p = TextFeatures.tfidfExact(docs, topK = 3)
      .queryExecution.executedPlan.toString
    assert(p.contains("WindowGroupLimit"), p.take(1200))
  }
}
