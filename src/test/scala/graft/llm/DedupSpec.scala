package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Invariant tests for the dedup family: planted duplicates must be
  * found, survivors must keep the minimum id, fuzzy paths must find a
  * planted near-duplicate without pairing unrelated docs. */
class DedupSpec extends SparkSpec {

  private lazy val docs: DataFrame =
    spark.read.parquet(s"$sf0001/documents.parquet")

  /** sf0.001 documents + a whitespace/case-mangled copy of doc 0 (id
    * 100000) and a one-word-edited copy of doc 1 (id 100001). */
  private lazy val planted: DataFrame = {
    val s = spark
    import s.implicits._
    val base = docs.select("doc_id", "text")
    val Seq(t0, t1) =
      base.filter(col("doc_id") < 2).orderBy("doc_id")
        .collect().map(_.getString(1)).toSeq
    val mangled = "  " + t0.toUpperCase.replace(" ", "\t \n") + "  "
    val words = t1.split(" ")
    val edited = (words.take(words.length - 1) :+ "zzzedit").mkString(" ")
    base.unionByName(Seq(
      (100000L, mangled), (100001L, edited)).toDF("doc_id", "text"))
  }

  test("exact: normalize-equal duplicate dropped, min id kept") {
    val out = Dedup.exact(planted)
    assert(out.count() == docs.count() + 1) // mangled copy collapsed
    assert(out.filter(col("doc_id") === 100000L).count() == 0)
    assert(out.filter(col("doc_id") === 0L).count() == 1)
  }

  test("exactKeepers: same result set as the window variant's keeper ids") {
    val fromWindow = Dedup.exact(planted).select("doc_id", "content_hash")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val fast = Dedup.exactKeepers(planted)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(fast == fromWindow)
  }

  test("connectedComponents: transitive chain A~B~C labels all three with A") {
    val s = spark
    import s.implicits._
    // edges A~B, B~C (A≁C directly) + an unrelated pair D~E
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val labels = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels(1L) == 1L && labels(2L) == 1L && labels(3L) == 1L)
    assert(labels(10L) == 10L && labels(11L) == 10L)
  }

  test("minhashConnected: keeps one doc per near-dup cluster through chains") {
    val s = spark
    import s.implicits._
    // B = A with one word edited, C = B with another word edited:
    // A~B and B~C are near-dups; A~C may fall below threshold. Greedy
    // suppression on pairs alone could keep C; components must not.
    val t0 = docs.filter(col("doc_id") === 0L).head().getAs[String]("text")
    val words = t0.split(" ")
    val b = (words.take(words.length - 1) :+ "zzz1").mkString(" ")
    val c = ("zzz2" +: words.tail.take(words.length - 2) :+ "zzz1").mkString(" ")
    val chain = docs.select("doc_id", "text").unionByName(
      Seq((200001L, b), (200002L, c)).toDF("doc_id", "text"))
    val kept = Dedup.minhashConnected(chain, minJaccard = 0.5)
    assert(kept.filter(col("doc_id") === 0L).count() == 1)
    assert(kept.filter(col("doc_id").isin(200001L, 200002L)).count() == 0)
  }

  test("exactGroups: duplicate group has size 2 and keeps min id") {
    val g = Dedup.exactGroups(planted).filter(col("group_size") > 1)
    assert(g.count() == 1)
    val r = g.head()
    assert(r.getAs[Long]("keep_id") == 0L)
    assert(r.getAs[Long]("group_size") == 2L)
  }

  test("minhashPairs: finds the planted near-dup with exact jaccard, id_a < id_b") {
    val pairs = Dedup.minhashPairs(planted, minJaccard = 0.5)
    val hit = pairs.filter(col("id_a") === 1L && col("id_b") === 100001L)
      .collect()
    assert(hit.length == 1)
    assert(hit(0).getAs[Double]("jaccard") > 0.5 &&
      hit(0).getAs[Double]("jaccard") < 1.0)
    assert(pairs.filter(col("id_a") >= col("id_b")).count() == 0)
  }

  test("minhashPairs agrees with the MLlib LSH cross-check on the planted pair") {
    val banded = Dedup.minhashPairs(planted, minJaccard = 0.5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    val mllib = Dedup.minhashPairsLsh(planted, jaccardDist = 0.5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(banded.contains((1L, 100001L)))
    assert(mllib.contains((1L, 100001L)))
  }

  test("minhash: suppresses the larger-id member of a near-dup pair") {
    val out = Dedup.minhash(planted, minJaccard = 0.5)
    assert(out.filter(col("doc_id") === 1L).count() == 1)
    assert(out.filter(col("doc_id") === 100001L).count() == 0)
  }

  test("simhash: one-word edit keeps Hamming distance small") {
    val fps = Dedup.simhash(planted)
      .filter(col("doc_id").isin(1L, 100001L))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ham = java.lang.Long.bitCount(fps(1L) ^ fps(100001L))
    assert(ham <= 8, s"hamming=$ham")
    // and the mangled doc normalizes identically only under exact;
    // simhash of a token-identical doc is equal (distance 0)
    val fp0 = Dedup.simhash(planted).filter(col("doc_id").isin(0L, 100000L))
      .collect().map(_.getLong(1))
    assert(fp0(0) == fp0(1))
  }

  test("simhashPairs: banded candidates contain the planted pair") {
    val pairs = Dedup.simhashPairs(planted, maxHamming = 8, bands = 16)
    assert(pairs.filter(
      col("id_a") === 1L && col("id_b") === 100001L).count() == 1)
    intercept[IllegalArgumentException] {
      Dedup.simhashPairs(planted, maxHamming = 4, bands = 4)
    }
  }

  test("ngramJaccard: identical pair scores 1.0, edited pair in (0,1)") {
    val s = spark
    import s.implicits._
    val pairs = Seq((0L, 100000L), (1L, 100001L)).toDF("id_a", "id_b")
    val j = Dedup.ngramJaccard(
      planted.withColumn("text", lower(col("text"))), pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(j((1L, 100001L)) > 0.5 && j((1L, 100001L)) < 1.0)
  }

  test("embeddingPairs: planted near-identical embedding pair found") {
    val s = spark
    import s.implicits._
    val base = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    val v = base.filter(col("vec_id") === 0L)
      .head().getSeq[Double](1).toArray
    val nearCopy = v.zipWithIndex.map { case (x, i) =>
      if (i == 0) x + 1e-4 else x }
    val planted = base.unionByName(
      Seq((90000L, nearCopy.toSeq)).toDF("vec_id", "embedding"))
    val pairs = Dedup.embeddingPairs(planted, minCosine = 0.99)
    assert(pairs.filter(
      col("id_a") === 0L && col("id_b") === 90000L).count() == 1)
  }
}
