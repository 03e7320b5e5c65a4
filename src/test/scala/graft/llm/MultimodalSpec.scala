package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  private lazy val docs = spark.read.parquet(s"$sf0001/documents.parquet")
  private lazy val embs = spark.read.parquet(s"$sf0001/embeddings.parquet")

  test("profile: one row per joined id, real stats, 64-dim embeddings") {
    val out = Multimodal.profile(docs, embs)
    assert(out.count() == 500)
    val r = out.filter(col("doc_id") === 0L).head()
    assert(r.getAs[Int]("emb_dim") == 64)
    assert(r.getAs[Double]("emb_norm") > 0.0)
    assert(r.getAs[Int]("ws_token_count") > 0)
  }

  test("binaryStats: md5 and byte length of a known payload") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "abc")).toDF("doc_id", "t")
      .select(col("doc_id"), col("t").cast("binary").as("payload"))
    val r = Multimodal.binaryStats(df, "payload").head()
    assert(r.getAs[Int]("byte_len") == 3)
    assert(r.getAs[String]("content_md5") ==
      "900150983cd24fb0d6963f7d28e17f72")
  }

  test("payloadMeta: PNG magic sniffed; unknown bytes fall back") {
    val s = spark
    import s.implicits._
    val png = Array[Byte](0x89.toByte, 0x50, 0x4E, 0x47, 0x0D, 0x0A)
    val raw = Array[Byte](1, 2, 3, 4, 5)
    val df = Seq((1L, png), (2L, raw)).toDF("id", "payload")
    val out = df.select(col("id"),
      Multimodal.payloadMeta(col("payload")).as("meta"))
      .orderBy("id").collect()
    assert(out(0).getStruct(1).getString(0) == "image/png")
    assert(out(1).getStruct(1).getString(0) == "application/octet-stream")
    assert(out(0).getStruct(1).getInt(1) == 6)
  }

  test("fakeDecodeFeatures: deterministic, right arity, bounded values") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "payload-bytes")).toDF("doc_id", "t")
      .select(col("doc_id"), col("t").cast("binary").as("payload"))
    val a = Multimodal.fakeDecodeFeatures(df, "payload", dim = 8)
      .head().getSeq[Double](2)
    val b = Multimodal.fakeDecodeFeatures(df, "payload", dim = 8)
      .head().getSeq[Double](2)
    assert(a == b)
    assert(a.size == 8)
    assert(a.forall(v => v >= -1.0 && v < 1.0))
    assert(a.distinct.size > 1) // not a constant vector
  }
}
