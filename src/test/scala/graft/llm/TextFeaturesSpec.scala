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

  test("bm25: hand-computed scores on a crafted corpus; self exclusion; " +
      "query-term set semantics") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (0L, "apple banana"),          // dl 2
      (1L, "apple apple cherry"),    // dl 3
      (2L, "banana banana banana"),  // dl 3
      (3L, "durian")).toDF("doc_id", "text") // dl 1; N=4, avgdl=2.25
    val queries = Seq((100L, "apple apple banana"))
      .toDF("query_id", "query_text")
    val out = TextFeatures.bm25(docs, queries, topK = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getInt(2), r.getDouble(3))).toMap
    def idf(df: Int) = math.log(1.0 + (4.0 - df + 0.5) / (df + 0.5))
    def w(tf: Long, dl: Long) =
      (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / 2.25))
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    // repeated "apple" in the query counts ONCE (distinct-term set)
    assert(out((100L, 0L))._2 ===
      r6(idf(2) * w(1, 2) + idf(2) * w(1, 2)))
    assert(out((100L, 1L))._2 === r6(idf(2) * w(2, 3)))
    assert(out((100L, 2L))._2 === r6(idf(2) * w(3, 3)))
    // durian shares no query term → absent, not zero-scored
    assert(!out.contains((100L, 3L)))
    // more-like-this: doc 0 as its own query must not match itself
    val mlt = TextFeatures.bm25(docs,
      docs.filter($"doc_id" === 0L)
        .select($"doc_id".as("query_id"), $"text".as("query_text")),
      topK = 10, excludeSelf = true)
      .collect().map(r => r.getLong(1)).toSet
    assert(!mlt.contains(0L) && mlt.nonEmpty)
  }

  test("bm25 persistence: reloaded postings probe identical to in-memory") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val q = docs.filter(org.apache.spark.sql.functions.col("doc_id") < 3)
      .select(
        org.apache.spark.sql.functions.col("doc_id").as("query_id"),
        org.apache.spark.sql.functions.col("text").as("query_text"))
    val idx = TextFeatures.bm25Index(docs)
    val direct = TextFeatures.bm25Probe(idx, q, topK = 10,
      excludeSelf = true)
    val tmp = java.nio.file.Files.createTempDirectory("graft-bm25").toString
    try {
      TextFeatures.writeBm25Index(idx, tmp)
      val loaded = TextFeatures.readBm25Index(spark, tmp)
      assert(loaded.nDocs == idx.nDocs && loaded.avgdl == idx.avgdl)
      val reprobed = TextFeatures.bm25Probe(loaded, q, topK = 10,
        excludeSelf = true)
      assert(reprobed.exceptAll(direct).count() == 0 &&
        direct.exceptAll(reprobed).count() == 0)
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
      }
      rm(new java.io.File(tmp))
    }
  }

  test("bm25PostingsStateless: per-row counts equal the aggregated " +
      "build; tokenless docs keep their length row") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (0L, "alpha alpha beta"),
      (1L, "beta common common beta"),
      (2L, "...!!!"), // tokenless: dl = 0, no term rows
      (3L, "gamma")).toDF("doc_id", "text")
    val delta = TextFeatures.bm25PostingsStateless(docs)
    val built = TextFeatures.bm25Index(docs)
    // postings rows (term != null) == the aggregated tf
    val dtf = delta.filter(col("term").isNotNull)
      .select("doc_id", "term", "tf")
    assert(dtf.exceptAll(built.tf).count() == 0 &&
      built.tf.exceptAll(dtf).count() == 0)
    // the tokenless doc keeps exactly one (null-term, dl=0) row
    val empty = delta.filter(col("doc_id") === 2L).collect()
    assert(empty.length == 1 && empty.head.getAs[Int]("dl") == 0 &&
      empty.head.isNullAt(2))
    // doc lengths (distinct per doc) == the built lengths
    val dlen = delta.select("doc_id", "dl").distinct()
    assert(dlen.exceptAll(built.docLen).count() == 0 &&
      built.docLen.exceptAll(dlen).count() == 0)
  }

  test("bm25Append: appended index probes identical to a from-scratch " +
      "rebuild (postings, df, scalars all merge exactly)") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val q = docs.filter(col("doc_id") < 3)
      .select(col("doc_id").as("query_id"), col("text").as("query_text"))
    val full = TextFeatures.bm25Index(docs)
    val grown = TextFeatures.bm25Append(
      TextFeatures.bm25Index(docs.filter(col("doc_id") % 2 === 0)),
      docs.filter(col("doc_id") % 2 === 1))
    assert(grown.nDocs == full.nDocs)
    assert(grown.avgdl == full.avgdl,
      s"avgdl ${grown.avgdl} vs ${full.avgdl} — integral dl must merge exactly")
    assert(grown.df.exceptAll(full.df).count() == 0 &&
      full.df.exceptAll(grown.df).count() == 0)
    val a = TextFeatures.bm25Probe(grown, q, topK = 10, excludeSelf = true)
    val b = TextFeatures.bm25Probe(full, q, topK = 10, excludeSelf = true)
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
  }

  test("bm25Delete: deleted docs vanish and the pruned index probes " +
      "identical to a from-scratch build on the survivors — df " +
      "decrements, zero-df terms drop, scalars re-derive exactly (r18)") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val q = docs.filter(col("doc_id") < 3)
      .select(col("doc_id").as("query_id"), col("text").as("query_text"))
    val pruned = TextFeatures.bm25Delete(
      TextFeatures.bm25Index(docs),
      docs.filter(col("doc_id") % 3 === 1).select(col("doc_id")))
    val rebuilt = TextFeatures.bm25Index(docs.filter(col("doc_id") % 3 =!= 1))
    assert(pruned.nDocs == rebuilt.nDocs)
    assert(pruned.avgdl == rebuilt.avgdl,
      s"avgdl ${pruned.avgdl} vs ${rebuilt.avgdl} — integral dl must " +
        "re-derive exactly")
    assert(pruned.df.exceptAll(rebuilt.df).count() == 0 &&
      rebuilt.df.exceptAll(pruned.df).count() == 0)
    val a = TextFeatures.bm25Probe(pruned, q, topK = 10, excludeSelf = true)
    val b = TextFeatures.bm25Probe(rebuilt, q, topK = 10, excludeSelf = true)
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
    // and no deleted id survives anywhere in the index pieces
    assert(pruned.tf.filter(col("doc_id") % 3 === 1).count() == 0)
    assert(pruned.docLen.filter(col("doc_id") % 3 === 1).count() == 0)
  }

  test("rrfFuse: hand-computed fusion; absent side contributes nothing") {
    val s = spark
    import s.implicits._
    // query 1: doc 10 is rank 1 in BOTH lists; doc 20 only in list A
    // (rank 2); doc 30 only in list B (rank 2)
    val a = Seq((1L, 10L, 1), (1L, 20L, 2)).toDF("query_id", "doc_id", "rank")
    val b = Seq((1L, 10L, 1), (1L, 30L, 2)).toDF("query_id", "doc_id", "rank")
    val out = TextFeatures.rrfFuse(Seq(a, b), rrfK = 60, topK = 10)
      .collect().map(r => r.getLong(1) -> (r.getInt(2), r.getDouble(3))).toMap
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    assert(out(10L) == ((1, r6(2.0 / 61))))
    // docs 20 and 30 tie on score 1/62 → doc-id tie-break
    assert(out(20L) == ((2, r6(1.0 / 62))))
    assert(out(30L) == ((3, r6(1.0 / 62))))
  }

  test("bm25: inverted-index shape — query terms broadcast, top-k " +
      "plans WindowGroupLimit") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val q = docs.limit(3).select(
      org.apache.spark.sql.functions.col("doc_id").as("query_id"),
      org.apache.spark.sql.functions.col("text").as("query_text"))
    val plan = TextFeatures.bm25(docs, q, topK = 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(1200))
    assert(plan.contains("WindowGroupLimit"), plan.take(1200))
  }
}
