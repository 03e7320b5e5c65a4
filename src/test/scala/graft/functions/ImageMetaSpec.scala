package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Byte-level fixtures for the real container decoder: headers are
  * hand-assembled per the public format specs (PNG RFC 2083 §3.1/§4.1.1,
  * JFIF/ITU T.81 marker syntax, RIFF/WAVE), including the structural
  * hazards a lazy parser gets wrong — variable-length JPEG segments
  * before SOF, non-`fmt ` RIFF chunks before `fmt `, and corrupt
  * truncations that must decode to `unknown`, never throw. */
class ImageMetaSpec extends SparkSpec {

  private def bytes(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray

  private val pngMagic = bytes(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)

  /** PNG header: magic + IHDR(len 13) with the given dims/type. */
  private def png(w: Int, h: Int, depth: Int, colorType: Int): Array[Byte] =
    pngMagic ++ bytes(0, 0, 0, 13) ++ "IHDR".getBytes ++
      bytes(w >> 24, w >> 16, w >> 8, w, h >> 24, h >> 16, h >> 8, h,
        depth, colorType, 0, 0, 0) ++ bytes(1, 2, 3, 4) // dummy CRC

  /** JPEG: SOI, JFIF APP0 (16 bytes), a COM segment (variable length),
    * then a SOF marker with the given frame parameters. */
  private def jpeg(w: Int, h: Int, nc: Int, sof: Int = 0xc0,
      comment: String = "graft"): Array[Byte] = {
    val app0 = bytes(0xff, 0xe0, 0, 16) ++ "JFIF".getBytes ++
      bytes(0, 1, 2, 0, 0, 1, 0, 1, 0, 0)
    val com = bytes(0xff, 0xfe, 0, comment.length + 2) ++ comment.getBytes
    val comps = (1 to nc).flatMap(i => Seq(i, 0x11, 0))
    val sofSeg = bytes(0xff, sof, 0, 8 + 3 * nc, 8,
      h >> 8, h, w >> 8, w, nc) ++ bytes(comps: _*)
    bytes(0xff, 0xd8) ++ app0 ++ com ++ sofSeg ++ bytes(0xff, 0xda, 0, 2)
  }

  /** WAV with a JUNK chunk BEFORE fmt — forces a real chunk walk. */
  private def wav(channels: Int, bits: Int): Array[Byte] = {
    val junk = "JUNK".getBytes ++ bytes(4, 0, 0, 0) ++ bytes(9, 9, 9, 9)
    val fmt = "fmt ".getBytes ++ bytes(16, 0, 0, 0) ++
      bytes(1, 0, channels, channels >> 8, 0x44, 0xac, 0, 0,
        0, 0, 0, 0, 4, 0, bits, bits >> 8)
    "RIFF".getBytes ++ bytes(0, 0, 0, 0) ++ "WAVE".getBytes ++ junk ++ fmt
  }

  private def decode(payloads: (Long, Array[Byte])*): Map[Long, Row] = {
    val s = spark
    import s.implicits._
    payloads.toSeq.toDF("id", "payload")
      .select(col("id"), ImageMeta(col("payload")).as("m"))
      .collect().map(r => r.getLong(0) -> r.getStruct(1)).toMap
  }

  private def assertMeta(r: Row, fmt: String, w: Any, h: Any, depth: Any,
      channels: Any): Unit = {
    assert(r.getString(0) == fmt)
    assert((if (r.isNullAt(1)) null else r.getInt(1)) == w)
    assert((if (r.isNullAt(2)) null else r.getInt(2)) == h)
    assert((if (r.isNullAt(3)) null else r.getInt(3)) == depth)
    assert((if (r.isNullAt(4)) null else r.getInt(4)) == channels)
  }

  test("png: big-endian IHDR dims, color-type → channel mapping") {
    val out = decode(
      1L -> png(1, 1, 8, 6),          // the classic 1×1 RGBA
      2L -> png(800, 600, 16, 2),     // 16-bit truecolor
      3L -> png(0x01020304, 2, 8, 0), // multi-byte BE width, greyscale
      4L -> png(5, 7, 8, 3),          // palette
      5L -> png(5, 7, 8, 4))          // grey+alpha
    assertMeta(out(1L), "png", 1, 1, 8, 4)
    assertMeta(out(2L), "png", 800, 600, 16, 3)
    assertMeta(out(3L), "png", 0x01020304, 2, 8, 1)
    assertMeta(out(4L), "png", 5, 7, 8, 1)
    assertMeta(out(5L), "png", 5, 7, 8, 2)
  }

  test("jpeg: marker scan past APP0 + variable-length COM finds SOF") {
    val out = decode(
      1L -> jpeg(640, 480, 3),
      2L -> jpeg(31000, 2, 1, comment = "a much longer comment segment " +
        "shifting the start-of-frame marker further into the stream"),
      3L -> jpeg(12, 34, 3, sof = 0xc2)) // progressive (SOF2)
    assertMeta(out(1L), "jpeg", 640, 480, 8, 3)
    assertMeta(out(2L), "jpeg", 31000, 2, 8, 1)
    assertMeta(out(3L), "jpeg", 12, 34, 8, 3)
  }

  test("wav: little-endian fmt fields found after a JUNK chunk") {
    val out = decode(1L -> wav(2, 16), 2L -> wav(1, 24))
    assertMeta(out(1L), "wav", null, null, 16, 2)
    assertMeta(out(2L), "wav", null, null, 24, 1)
  }

  test("corrupt and foreign bytes decode to unknown, never throw") {
    val noIhdr = pngMagic ++ bytes(0, 0, 0, 13) ++ "NOPE".getBytes ++
      new Array[Byte](17)
    val sosFirst = bytes(0xff, 0xd8, 0xff, 0xda, 0, 2, 1, 2, 3)
    val noWave = "RIFF".getBytes ++ bytes(0, 0, 0, 0) ++ "AVI ".getBytes
    val out = decode(
      1L -> "plain text, not a container".getBytes,
      2L -> Array.emptyByteArray,
      3L -> pngMagic, // magic only: truncated before IHDR
      4L -> noIhdr,
      5L -> sosFirst, // scan data before any frame header
      6L -> noWave,
      7L -> bytes(0xff, 0xd8), // bare SOI
      8L -> jpeg(1, 1, 3).dropRight(14)) // truncated mid-SOF
    (1L to 7L).foreach(i =>
      assertMeta(out(i), "unknown", null, null, null, null))
    // id 8 truncates inside the SOF segment: the marker and length
    // survive but the frame fields don't — unknown, not garbage dims
    assertMeta(out(8L), "unknown", null, null, null, null)
  }

  test("null payload decodes to null; SQL registration works") {
    val s = spark
    import s.implicits._
    val withNull = Seq((1L, Some("abc".getBytes)), (2L, None))
      .toDF("id", "payload")
      .select(col("id"), ImageMeta(col("payload")).as("m"))
      .collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(!withNull(1L) && withNull(2L))
    org.apache.spark.sql.GraftSql.registerFunctions(spark)
    val viaSql = spark.sql(
      "SELECT m.* FROM (SELECT " +
        "image_meta(unhex('FFD8FFC0000B08000700050111000000')) AS m)")
      .head()
    assert(viaSql.getString(0) == "jpeg")
    assert(viaSql.getInt(1) == 5 && viaSql.getInt(2) == 7)
    assert(viaSql.getInt(4) == 1)
  }
}
