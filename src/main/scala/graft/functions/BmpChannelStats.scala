package graft.functions

import org.apache.spark.sql.{Column, GraftSql}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, LongType, StructField, StructType}

/** Real pixel decode of an uncompressed 24-bpp Windows BMP — the
  * second codec-free raster format after the PPM path
  * ([[graft.llm.Multimodal.ppmChannelStats]]), and the layout-hard one:
  * a 14-byte file header (`BM`, little-endian size and pixel-data
  * offset) + a 40-byte BITMAPINFOHEADER (LE width/height/planes/bpp/
  * compression), pixel rows stored BOTTOM-UP, each row padded to a
  * 4-byte boundary, channels interleaved B,G,R. A correct decode must
  * honor the data offset, the row stride `((3w+3)/4)*4`, the vertical
  * flip and the channel swap — none of which the PPM path exercises.
  *
  * Emits per-channel SUM/MIN/MAX over the nearest-neighbor
  * `newW`×`newH` thumbnail (source pixel of thumbnail (x, y) is
  * (⌊x·w/newW⌋, ⌊y·h/newH⌋)) in R,G,B order (file channels 2,1,0);
  * the mean derives in the Column layer so rounding rides Spark's
  * `round`, bit-identical to the PPM row's proven recipe.
  *
  * Accepts exactly the uncompressed truecolor form: magic `BM`,
  * `biSize` 40, planes 1, bpp 24, compression 0 (BI_RGB), positive
  * 31-bit dims (a negative height — top-down DIB — is out of
  * contract). Anything else decodes to `is_bmp = 0` with null fields;
  * a well-formed header whose raster overruns the payload (truncated
  * upload, or a claimed geometry past the array ceiling) keeps its
  * true (width, height) but nulls every channel stat — malformed bytes
  * at 100 TB are data, not exceptions.
  *
  * Shape: one codegen'd call into a static helper (the [[ImageMeta]] /
  * [[SimhashSignature]] pattern) fused into the payload scan —
  * `newW·newH·3` byte reads per row regardless of payload size, so the
  * decode runs at parquet-scan speed. The first cut of this operator
  * composed the same arithmetic from ~150 Column expressions; the
  * header-parse subtrees re-inlined into every byte read during scan
  * planning and the generated Java blew janino's 64 KB method limit —
  * the static-helper expression keeps the whole decode one call site. */
case class BmpChannelStats(child: Expression, newW: Int, newH: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary argument, got ${other.catalogString}")
  }

  override def dataType: DataType = BmpChannelStats.schema
  override def prettyName: String = "bmp_channel_stats"

  override protected def nullSafeEval(input: Any): Any =
    BmpChannelStats.parse(input.asInstanceOf[Array[Byte]], newW, newH)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.BmpChannelStats.parse($c, $newW, $newH)")

  override protected def withNewChildInternal(
      newChild: Expression): BmpChannelStats = copy(child = newChild)
}

object BmpChannelStats {
  def apply(payload: Column, newW: Int, newH: Int): Column =
    GraftSql.column(BmpChannelStats(GraftSql.expression(payload), newW, newH))

  val schema: StructType = StructType(
    StructField("is_bmp", IntegerType, nullable = false) +:
    StructField("width", IntegerType, nullable = true) +:
    StructField("height", IntegerType, nullable = true) +:
    Seq("r", "g", "b").flatMap { c => Seq(
      StructField(s"${c}_sum", LongType, nullable = true),
      StructField(s"${c}_min", IntegerType, nullable = true),
      StructField(s"${c}_max", IntegerType, nullable = true))
    })

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def le32(b: Array[Byte], i: Int): Long =
    u8(b, i).toLong | (u8(b, i + 1).toLong << 8) |
      (u8(b, i + 2).toLong << 16) | (u8(b, i + 3).toLong << 24)

  private def notBmp: InternalRow = new GenericInternalRow(
    Array[Any](0, null, null, null, null, null, null, null, null, null,
      null, null))

  private def geomOnly(w: Int, h: Int): InternalRow = new GenericInternalRow(
    Array[Any](1, w, h, null, null, null, null, null, null, null, null,
      null))

  /** Static helper shared by interpreted eval and generated code. */
  def parse(bytes: Array[Byte], newW: Int, newH: Int): InternalRow = {
    val n = bytes.length
    if (n < 54 || u8(bytes, 0) != 'B' || u8(bytes, 1) != 'M') return notBmp
    val w = le32(bytes, 18)
    val h = le32(bytes, 22)
    if (le32(bytes, 14) != 40L || le16(bytes, 26) != 1 ||
      le16(bytes, 28) != 24 || le32(bytes, 30) != 0L ||
      w < 1 || w > Int.MaxValue || h < 1 || h > Int.MaxValue) return notBmp
    val off = le32(bytes, 10)
    val stride = ((w * 3L + 3L) / 4L) * 4L
    // truncated or out-of-range raster: true geometry, null stats.
    // Divide instead of multiplying: stride·h for dims near 2³¹ wraps
    // Long (~1.4e19) and a product-form guard would wave the overflowed
    // raster through into the pixel loop. stride ≥ 4 here (w ≥ 1), so
    // the division is safe; h ≤ (n−off)/stride ⟺ stride·h ≤ n−off,
    // which also proves every pixel index fits an int (n ≤ 2³¹).
    if (off < 54L || off > n || stride > n - off || h > (n - off) / stride)
      return geomOnly(w.toInt, h.toInt)
    // file channel order is B,G,R = output channels b,g,r
    val sums = new Array[Long](3)
    val mins = Array(255, 255, 255)
    val maxs = Array(0, 0, 0)
    var y = 0
    while (y < newH) {
      val srcY = h * y / newH
      val rowBase = off + (h - 1L - srcY) * stride
      var x = 0
      while (x < newW) {
        val base = (rowBase + (w * x / newW) * 3L).toInt
        var c = 0
        while (c < 3) {
          val v = u8(bytes, base + c)
          sums(c) += v
          if (v < mins(c)) mins(c) = v
          if (v > maxs(c)) maxs(c) = v
          c += 1
        }
        x += 1
      }
      y += 1
    }
    new GenericInternalRow(Array[Any](1, w.toInt, h.toInt,
      sums(2), mins(2), maxs(2), // r
      sums(1), mins(1), maxs(1), // g
      sums(0), mins(0), maxs(0))) // b
  }
}
