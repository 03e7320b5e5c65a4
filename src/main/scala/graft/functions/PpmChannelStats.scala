package graft.functions

import org.apache.spark.sql.{Column, GraftSql}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, LongType, StructField, StructType}

/** Real pixel decode of a binary PPM (P6) payload — the codegen'd
  * static-helper twin of [[BmpChannelStats]] (and the r13 replacement
  * for the Column-tree formulation in
  * [[graft.llm.Multimodal.ppmChannelStats]], whose r12-advice long
  * guards inflated the inlined expression trees past janino's 64 KB
  * method limit at scan planning, silently dropping the whole
  * projection to interpreted eval).
  *
  * Parse contract (unchanged from the Column version): the canonical
  * header `P6\n<w> <h>\n<max>\n` — single spaces, no comments, the
  * form every PPM writer emits — completing within the payload's
  * first 32 bytes; width/height come from the ACTUAL header digits
  * and the pixel region starts at the header's byte length. Anything
  * else (null payloads included, via the expression's null
  * propagation + the Column layer's coalesce) is `is_ppm = 0` with
  * null fields. Dimensions past 2³¹ keep `is_ppm = 1` with null
  * geometry and stats; a zero-area raster (`0` in either dimension)
  * keeps its header-true geometry with null stats, like a truncated
  * payload.
  *
  * Emits per-channel SUM/MIN/MAX over the nearest-neighbor
  * `newW`×`newH` thumbnail (source pixel (⌊x·w/newW⌋, ⌊y·h/newH⌋);
  * channel c of source pixel p at byte `header_len + 3p + c` — PPM
  * interleaves R,G,B in output order already). A channel whose
  * sampled bytes are not all present (header lies about its geometry,
  * truncated upload) is all-null — never a silent partial aggregate —
  * while the header-true geometry is still reported. `newW·newH·3`
  * byte reads per row regardless of payload size: scan-speed at
  * 100 TB. */
case class PpmChannelStats(child: Expression, newW: Int, newH: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary argument, got ${other.catalogString}")
  }

  override def dataType: DataType = PpmChannelStats.schema
  override def prettyName: String = "ppm_channel_stats"

  override protected def nullSafeEval(input: Any): Any =
    PpmChannelStats.parse(input.asInstanceOf[Array[Byte]], newW, newH)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.PpmChannelStats.parse($c, $newW, $newH)")

  override protected def withNewChildInternal(
      newChild: Expression): PpmChannelStats = copy(child = newChild)
}

object PpmChannelStats {
  def apply(payload: Column, newW: Int, newH: Int): Column =
    GraftSql.column(PpmChannelStats(GraftSql.expression(payload), newW, newH))

  val schema: StructType = StructType(
    StructField("is_ppm", IntegerType, nullable = false) +:
    StructField("width", IntegerType, nullable = true) +:
    StructField("height", IntegerType, nullable = true) +:
    Seq("r", "g", "b").flatMap { c => Seq(
      StructField(s"${c}_sum", LongType, nullable = true),
      StructField(s"${c}_min", IntegerType, nullable = true),
      StructField(s"${c}_max", IntegerType, nullable = true))
    })

  private def notPpm: InternalRow = new GenericInternalRow(
    Array[Any](0, null, null, null, null, null, null, null, null, null,
      null, null))

  /** Static helper shared by interpreted eval and generated code. */
  def parse(bytes: Array[Byte], newW: Int, newH: Int): InternalRow = {
    val n = bytes.length
    val lim = math.min(n, 32) // the header must complete within 32 bytes
    if (lim < 3 || bytes(0) != 'P' || bytes(1) != '6' || bytes(2) != '\n')
      return notPpm
    // three decimal fields, terminated by exactly ' ', '\n', '\n'
    var i = 3
    val dims = new Array[Long](3)
    var f = 0
    while (f < 3) {
      val start = i
      var v = 0L
      while (i < lim && bytes(i) >= '0' && bytes(i) <= '9') {
        // clamp instead of overflowing; >2^31 dims null out below
        if (v <= Int.MaxValue) v = v * 10 + (bytes(i) - '0')
        i += 1
      }
      val term: Byte = if (f == 0) ' ' else '\n'
      if (i == start || i >= lim || bytes(i) != term) return notPpm
      dims(f) = v
      i += 1
      f += 1
    }
    val hlen = i
    val w = dims(0)
    val h = dims(1)
    if (w > Int.MaxValue || h > Int.MaxValue) // header-true but unusable
      return new GenericInternalRow(Array[Any](1, null, null, null, null,
        null, null, null, null, null, null, null))
    if (w < 1 || h < 1) // zero-area raster: true geometry, null stats
      return new GenericInternalRow(Array[Any](1, w.toInt, h.toInt, null,
        null, null, null, null, null, null, null, null))
    // per-channel accumulation; a channel with ANY sampled byte out of
    // range goes all-null (no silent partial aggregate), geometry stays
    val sums = new Array[Long](3)
    val mins = Array(255, 255, 255)
    val maxs = Array(0, 0, 0)
    val missing = new Array[Boolean](3)
    var y = 0
    while (y < newH) {
      val srcY = h * y / newH
      var x = 0
      while (x < newW) {
        val base = hlen + (srcY * w + w * x / newW) * 3L
        var c = 0
        while (c < 3) {
          val idx = base + c
          // idx < 0 ⇔ (srcY·w + …)·3 wrapped Long for dims near 2³¹
          // (the wrap is provably negative: the pre-multiply index is
          // < 2⁶², so ·3 lands in [2⁶³, 1.5·2⁶³) ≡ negative) — same
          // missing-sample contract as a truncated payload.
          if (idx < 0 || idx >= n) missing(c) = true
          else {
            val v = bytes(idx.toInt) & 0xff
            sums(c) += v
            if (v < mins(c)) mins(c) = v
            if (v > maxs(c)) maxs(c) = v
          }
          c += 1
        }
        x += 1
      }
      y += 1
    }
    def s(c: Int): Any = if (missing(c)) null else sums(c)
    def mn(c: Int): Any = if (missing(c)) null else mins(c)
    def mx(c: Int): Any = if (missing(c)) null else maxs(c)
    new GenericInternalRow(Array[Any](1, w.toInt, h.toInt,
      s(0), mn(0), mx(0), s(1), mn(1), mx(1), s(2), mn(2), mx(2)))
  }
}
