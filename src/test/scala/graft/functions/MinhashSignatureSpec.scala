package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MinhashSignatureSpec extends SparkSpec {

  private def docsDf = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, Seq("the quick brown", "quick brown fox", "brown fox jumps")),
      (2L, Seq("brown fox jumps", "the quick brown", "the quick brown")), // dup slot
      (3L, Seq.empty[String]),
      (4L, Seq("only one shingle"))
    ).toDF("doc_id", "shingles")
  }

  test("bit-identical to the aggregate/zip_with/xxhash64 HOF fold") {
    val numHashes = 64
    val seed = 42L
    val seeds = typedLit((0 until numHashes).map(i => seed + i))
    val hof = aggregate(
      array_distinct(col("shingles")),
      typedLit(Seq.fill(numHashes)(Long.MaxValue)),
      (acc, sh) => zip_with(acc, seeds, (a, sd) => least(a, xxhash64(sh, sd))))
    val rows = docsDf.select(col("doc_id"),
        MinhashSignature(col("shingles"), numHashes, seed).as("expr"),
        hof.as("hof"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](1) == r.getSeq[Long](2),
        s"signature mismatch for doc ${r.getLong(0)}")
    }
  }

  test("empty array yields all-MaxValue; duplicates don't change the result") {
    val rows = docsDf.select(col("doc_id"),
        MinhashSignature(col("shingles"), 16, 7L).as("raw"),
        MinhashSignature(array_distinct(col("shingles")), 16, 7L).as("dedup"))
      .collect()
    val byId = rows.map(r =>
      r.getLong(0) -> (r.getSeq[Long](1), r.getSeq[Long](2))).toMap
    assert(byId(3L)._1.forall(_ == Long.MaxValue))
    // min over the multiset == min over the set: doc 2 repeats a shingle
    byId.values.foreach { case (raw, dedup) => assert(raw == dedup) }
  }

  test("callable from SQL after registration") {
    org.apache.spark.sql.GraftSql.registerFunctions(spark)
    val sig = spark.sql(
      "SELECT minhash_signature(array('a b c', 'b c d'), 8) AS s")
      .head().getSeq[Long](0)
    assert(sig.length == 8)
    assert(sig.forall(_ != Long.MaxValue))
  }
}
