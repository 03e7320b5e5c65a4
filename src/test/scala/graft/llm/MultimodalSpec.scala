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

  test("decodePartitions: iterator-shaped stub decoder, deterministic") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "aaa"), (2L, "bbb")).toDF("doc_id", "t")
      .select(col("doc_id"), col("t").cast("binary").as("payload"))
    val a = Multimodal.decodePartitions(df, "payload")
      .orderBy("doc_id").collect().map(_.getSeq[Double](1))
    val b = Multimodal.decodePartitions(df, "payload")
      .orderBy("doc_id").collect().map(_.getSeq[Double](1))
    assert(a.toSeq.map(_.toSeq) == b.toSeq.map(_.toSeq))
    assert(a.forall(_.size == 8))
    assert(a(0) != a(1)) // different payloads decode differently
    assert(a.forall(_.forall(v => v >= -1.0 && v < 1.0)))
  }

  test("frameSample: n byte slices at even strides") {
    val s = spark
    import s.implicits._
    val payload = ("0123456789" * 10).getBytes("UTF-8") // 100 bytes
    val df = Seq((1L, payload)).toDF("doc_id", "payload")
    val frames = Multimodal.frameSample(df, "payload", n = 4, frameBytes = 16)
      .head().getSeq[Array[Byte]](2)
    assert(frames.size == 4)
    assert(frames.forall(_.length == 16))
    assert(new String(frames.head, "UTF-8") == "0123456789012345")
    assert(new String(frames(1), "UTF-8").startsWith("5678")) // offset 25
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

  test("resizeRaster: identity is a no-op, 2x downscale picks every " +
      "other pixel, zero shuffles in the plan") {
    val s = spark
    import s.implicits._
    // 4x2 raster, row-major: rows "abcd" / "efgh"
    val df = Seq(("abcdefgh")).toDF("raster")
    val same = Multimodal.resizeRaster(df, "raster", w = 4, h = 2,
      newW = 4, newH = 2).head().getString(1)
    assert(same == "abcdefgh")
    // 2x1 output: (x,y)=(0,0)->src(0,0)='a', (1,0)->src(2,0)='c'
    val down = Multimodal.resizeRaster(df, "raster", w = 4, h = 2,
      newW = 2, newH = 1).head().getString(1)
    assert(down == "ac")
    // 2x upscale replicates neighbors: each source pixel appears twice
    val up = Multimodal.resizeRaster(df, "raster", w = 4, h = 2,
      newW = 8, newH = 2).head().getString(1)
    assert(up == "aabbccddeeffgghh")
    val plan = Multimodal.resizeRaster(df, "raster", 4, 2, 2, 1)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(400))
    // short raster: padded to the declared geometry, never a silently
    // truncated / pixel-shifted output
    val short = Seq(("abcde")).toDF("raster") // 5 chars for a 4x2 grid
    val padded = Multimodal.resizeRaster(short, "raster", w = 4, h = 2,
      newW = 4, newH = 2, fill = "_").head().getString(1)
    assert(padded == "abcde___")
  }
}
