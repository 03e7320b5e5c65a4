package graft.functions

import org.apache.spark.sql.{Column, GraftSql}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, StructField, StructType}

/** dHash perceptual hash of an uncompressed 24-bpp BMP — the
  * image-near-dup signature (difference hash: the public pHash-family
  * member that needs no DCT, so it stays exact-integer and
  * oracle-restatable): sample a 9×8 nearest-neighbor grayscale
  * thumbnail (gray = R+G+B channel sum, 0..765 — no division, no
  * rounding), emit one bit per adjacent-pixel comparison
  * `gray(x, y) < gray(x+1, y)`, packed as eight per-row bytes
  * `d0..d7` (bit x of row y set iff the comparison holds). Hamming
  * distance between two hashes = Σ bit_count(dᵢ XOR dᵢ′) — tiny for
  * crops/recompressions of the same image, ~32 for unrelated ones.
  *
  * Same BMP contract as [[BmpChannelStats]] (LE headers, bottom-up
  * rows, 4-byte stride, B,G,R order; malformed → is_bmp 0, truncated
  * raster → geometry with null hash bytes) and the same static-helper
  * codegen shape: one call fused into the payload scan, 9·8·3 byte
  * reads per row regardless of payload size. */
case class BmpDHash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary argument, got ${other.catalogString}")
  }

  override def dataType: DataType = BmpDHash.schema
  override def prettyName: String = "bmp_dhash"

  override protected def nullSafeEval(input: Any): Any =
    BmpDHash.parse(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.BmpDHash.parse($c)")

  override protected def withNewChildInternal(newChild: Expression): BmpDHash =
    copy(child = newChild)
}

object BmpDHash {
  def apply(payload: Column): Column =
    GraftSql.column(BmpDHash(GraftSql.expression(payload)))

  /** Thumbnail geometry: 9 columns × 8 rows → 8×8 = 64 comparison
    * bits. */
  val GridW = 9
  val GridH = 8

  val schema: StructType = StructType(
    StructField("is_bmp", IntegerType, nullable = false) +:
    StructField("width", IntegerType, nullable = true) +:
    StructField("height", IntegerType, nullable = true) +:
    (0 until GridH).map(y => StructField(s"d$y", IntegerType, nullable = true)))

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def le32(b: Array[Byte], i: Int): Long =
    u8(b, i).toLong | (u8(b, i + 1).toLong << 8) |
      (u8(b, i + 2).toLong << 16) | (u8(b, i + 3).toLong << 24)

  private def notBmp: InternalRow = new GenericInternalRow(
    Array[Any](0, null, null, null, null, null, null, null, null, null, null))

  private def geomOnly(w: Int, h: Int): InternalRow = new GenericInternalRow(
    Array[Any](1, w, h, null, null, null, null, null, null, null, null))

  /** Static helper shared by interpreted eval and generated code —
    * header validation identical to [[BmpChannelStats.parse]]
    * (including the division-form raster bound). */
  def parse(bytes: Array[Byte]): InternalRow = {
    val n = bytes.length
    if (n < 54 || u8(bytes, 0) != 'B' || u8(bytes, 1) != 'M') return notBmp
    val w = le32(bytes, 18)
    val h = le32(bytes, 22)
    if (le32(bytes, 14) != 40L || le16(bytes, 26) != 1 ||
      le16(bytes, 28) != 24 || le32(bytes, 30) != 0L ||
      w < 1 || w > Int.MaxValue || h < 1 || h > Int.MaxValue) return notBmp
    val off = le32(bytes, 10)
    val stride = ((w * 3L + 3L) / 4L) * 4L
    if (off < 54L || off > n || stride > n - off || h > (n - off) / stride)
      return geomOnly(w.toInt, h.toInt)
    // 9×8 nearest-neighbor grayscale (channel-sum) grid
    val g = new Array[Int](GridW * GridH)
    var y = 0
    while (y < GridH) {
      val srcY = h * y / GridH
      val rowBase = off + (h - 1L - srcY) * stride
      var x = 0
      while (x < GridW) {
        val srcX = w * x / GridW
        val p = (rowBase + srcX * 3L).toInt
        g(y * GridW + x) = u8(bytes, p) + u8(bytes, p + 1) + u8(bytes, p + 2)
        x += 1
      }
      y += 1
    }
    val out = new Array[Any](3 + GridH)
    out(0) = 1; out(1) = w.toInt; out(2) = h.toInt
    y = 0
    while (y < GridH) {
      var row = 0
      var x = 0
      while (x < GridW - 1) {
        if (g(y * GridW + x) < g(y * GridW + x + 1)) row |= (1 << x)
        x += 1
      }
      out(3 + y) = row
      y += 1
    }
    new GenericInternalRow(out)
  }
}
