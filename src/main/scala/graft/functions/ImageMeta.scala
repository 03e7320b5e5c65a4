package graft.functions

import org.apache.spark.sql.{Column, GraftSql}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Real container-format metadata decode over an opaque `binary`
  * payload column — the production replacement for the round-≤8 FNV
  * stub codec: parses the actual header bytes of the three formats
  * [[graft.llm.Multimodal.payloadMeta]] sniffs, per their public specs:
  *
  *  - PNG — magic `89 50 4E 47 0D 0A 1A 0A`, then the mandatory first
  *    IHDR chunk: big-endian width/height at fixed offsets 16/20, bit
  *    depth at 24, color type at 25 (channels = 1/3/1/2/4 for color
  *    types 0/2/3/4/6).
  *  - JPEG — SOI `FF D8`, then a MARKER SCAN (segments are
  *    variable-length, so offsets cannot be assumed): walk
  *    `FF <marker> <be16 len>` segments, skipping fill bytes and
  *    standalone markers, until a start-of-frame marker (C0–CF minus
  *    C4/C8/CC); SOF carries bit precision, big-endian height, width,
  *    and the component (channel) count.
  *  - WAV — RIFF/WAVE container: chunk scan from offset 12 (`<id>
  *    <le32 size>` — LITTLE-endian, unlike the two image formats) to
  *    the `fmt ` chunk for channel count and bits per sample.
  *
  * Anything else (or any truncated/corrupt header) decodes to format
  * `unknown` with null fields — malformed bytes at 100 TB are data, not
  * exceptions.
  *
  * Shape: a narrow codegen'd projection (static-helper pattern like
  * [[SimhashSignature]]) fused into the payload scan — header-only
  * parsing never touches the payload body, so the cost per row is a few
  * dozen byte reads regardless of payload size.
  */
case class ImageMeta(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary argument, got ${other.catalogString}")
  }

  override def dataType: DataType = ImageMeta.schema
  override def prettyName: String = "image_meta"

  override protected def nullSafeEval(input: Any): Any =
    ImageMeta.parse(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ImageMeta.parse($c)")

  override protected def withNewChildInternal(
      newChild: Expression): ImageMeta = copy(child = newChild)
}

object ImageMeta {
  def apply(payload: Column): Column =
    GraftSql.column(ImageMeta(GraftSql.expression(payload)))

  val schema: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("bit_depth", IntegerType, nullable = true),
    StructField("channels", IntegerType, nullable = true)))

  private val FormatPng = UTF8String.fromString("png")
  private val FormatJpeg = UTF8String.fromString("jpeg")
  private val FormatWav = UTF8String.fromString("wav")
  private val FormatUnknown = UTF8String.fromString("unknown")

  private def unknown: InternalRow =
    new GenericInternalRow(Array[Any](FormatUnknown, null, null, null, null))

  private def row(fmt: UTF8String, w: Any, h: Any, depth: Any,
      channels: Any): InternalRow =
    new GenericInternalRow(Array[Any](fmt, w, h, depth, channels))

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
  private def be32(b: Array[Byte], i: Int): Long =
    (u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) |
      u8(b, i + 3)
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def le32(b: Array[Byte], i: Int): Long =
    u8(b, i).toLong | (u8(b, i + 1).toLong << 8) |
      (u8(b, i + 2).toLong << 16) | (u8(b, i + 3).toLong << 24)

  /** SOF0–SOF15 minus the non-frame C4 (DHT) / C8 (JPG ext) / CC (DAC). */
  private def isSof(m: Int): Boolean =
    m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc

  /** Static helper shared by interpreted eval and generated code. */
  def parse(bytes: Array[Byte]): InternalRow = {
    val n = bytes.length
    // ---- PNG: fixed-offset IHDR (the spec mandates IHDR first)
    if (n >= 26 &&
      u8(bytes, 0) == 0x89 && u8(bytes, 1) == 0x50 &&
      u8(bytes, 2) == 0x4e && u8(bytes, 3) == 0x47 &&
      u8(bytes, 4) == 0x0d && u8(bytes, 5) == 0x0a &&
      u8(bytes, 6) == 0x1a && u8(bytes, 7) == 0x0a) {
      // bytes 12..15 must name the IHDR chunk
      if (u8(bytes, 12) != 'I' || u8(bytes, 13) != 'H' ||
        u8(bytes, 14) != 'D' || u8(bytes, 15) != 'R') return unknown
      val w = be32(bytes, 16)
      val h = be32(bytes, 20)
      // spec: dimensions are 31-bit positive; zero/overflow = corrupt
      if (w < 1 || h < 1 || w > Int.MaxValue || h > Int.MaxValue)
        return unknown
      val depth = u8(bytes, 24)
      val channels: Any = u8(bytes, 25) match {
        case 0 => 1 // greyscale
        case 2 => 3 // truecolor
        case 3 => 1 // palette index
        case 4 => 2 // grey + alpha
        case 6 => 4 // truecolor + alpha
        case _ => null // corrupt color type: dimensions still reported
      }
      return row(FormatPng, w.toInt, h.toInt, depth, channels)
    }
    // ---- JPEG: SOI then marker scan to the first start-of-frame
    if (n >= 4 && u8(bytes, 0) == 0xff && u8(bytes, 1) == 0xd8) {
      var i = 2
      while (i + 1 < n) {
        if (u8(bytes, i) != 0xff) return unknown // lost marker sync
        val m = u8(bytes, i + 1)
        if (m == 0xff) { // fill byte before a marker
          i += 1
        } else if (m == 0x01 || (m >= 0xd0 && m <= 0xd7)) {
          i += 2 // standalone markers (TEM, RSTn): no length field
        } else if (m == 0xd9 || m == 0xda) {
          return unknown // EOI / start-of-scan before any SOF: no frame
        } else {
          if (i + 3 >= n) return unknown
          val segLen = be16(bytes, i + 2) // includes the 2 length bytes
          if (segLen < 2) return unknown
          if (isSof(m)) {
            if (i + 9 >= n) return unknown
            val precision = u8(bytes, i + 4)
            val h = be16(bytes, i + 5)
            val w = be16(bytes, i + 7)
            val nc = u8(bytes, i + 9)
            return row(FormatJpeg, w, h, precision, nc)
          }
          i += 2 + segLen
        }
      }
      return unknown
    }
    // ---- WAV: RIFF/WAVE, little-endian chunk scan to `fmt `
    if (n >= 12 &&
      u8(bytes, 0) == 'R' && u8(bytes, 1) == 'I' &&
      u8(bytes, 2) == 'F' && u8(bytes, 3) == 'F' &&
      u8(bytes, 8) == 'W' && u8(bytes, 9) == 'A' &&
      u8(bytes, 10) == 'V' && u8(bytes, 11) == 'E') {
      var i = 12
      while (i + 8 <= n) {
        val size = le32(bytes, i + 4)
        if (u8(bytes, i) == 'f' && u8(bytes, i + 1) == 'm' &&
          u8(bytes, i + 2) == 't' && u8(bytes, i + 3) == ' ') {
          if (size < 16 || i + 8 + 16 > n) return unknown
          val channels = le16(bytes, i + 10)
          val bits = le16(bytes, i + 22)
          return row(FormatWav, null, null, bits, channels)
        }
        // RIFF chunks are word-aligned: odd sizes carry a pad byte
        i += 8 + size.toInt + (size.toInt & 1)
      }
      return unknown
    }
    unknown
  }
}
