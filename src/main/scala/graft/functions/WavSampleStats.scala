package graft.functions

import org.apache.spark.sql.{Column, GraftSql}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, LongType, StructField, StructType}

/** Real AUDIO decode — 16-bit PCM WAV sample statistics, the third
  * codec-free payload format after the PPM and BMP pixel paths
  * ([[PpmChannelStats]], [[BmpChannelStats]]): PCM samples after the
  * RIFF chunk walk ARE the raw signal, so decode → downsample →
  * per-channel stats runs real and oracle-checkable end to end. The
  * compressed-audio slot stays the documented stub.
  *
  * Parse contract: `RIFF <size> WAVE`, then a CHUNK SCAN (`<id>
  * <le32 size>`, word-aligned — chunk order and junk chunks vary in
  * the wild, so offsets cannot be assumed; the fixture plants a
  * variable-length junk chunk to make a fixed-offset cheat
  * impossible) to the `fmt ` chunk (must be PCM: audio format 1,
  * 16 bits per sample, 1-2 channels) and the `data` chunk. Anything
  * else — null payloads included, via null propagation + the Column
  * layer's coalesce — is `is_wav = 0` with null fields. A data chunk
  * that overruns the payload (truncated upload) keeps the header-true
  * channels / sample_rate / n_frames with null sample stats — the
  * BMP truncation contract.
  *
  * Emits per-channel SUM/MIN/MAX over `k` nearest-neighbor-sampled
  * frames (frame of sample i is ⌊i·n_frames/k⌋ — the resize recipe on
  * the time axis; short clips repeat frames, exactly like thumbnail
  * upscaling). Samples are SIGNED little-endian int16, interleaved by
  * channel. Mono payloads null the channel-2 stats. `k·channels`
  * 16-bit reads per row regardless of payload size: scan-speed at
  * 100 TB. */
case class WavSampleStats(child: Expression, k: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary argument, got ${other.catalogString}")
  }

  override def dataType: DataType = WavSampleStats.schema
  override def prettyName: String = "wav_sample_stats"

  override protected def nullSafeEval(input: Any): Any =
    WavSampleStats.parse(input.asInstanceOf[Array[Byte]], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.WavSampleStats.parse($c, $k)")

  override protected def withNewChildInternal(
      newChild: Expression): WavSampleStats = copy(child = newChild)
}

object WavSampleStats {
  def apply(payload: Column, k: Int): Column =
    GraftSql.column(WavSampleStats(GraftSql.expression(payload), k))

  val schema: StructType = StructType(
    StructField("is_wav", IntegerType, nullable = false) +:
    StructField("channels", IntegerType, nullable = true) +:
    StructField("sample_rate", IntegerType, nullable = true) +:
    StructField("n_frames", LongType, nullable = true) +:
    Seq("c1", "c2").flatMap { c => Seq(
      StructField(s"${c}_sum", LongType, nullable = true),
      StructField(s"${c}_min", IntegerType, nullable = true),
      StructField(s"${c}_max", IntegerType, nullable = true))
    })

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def le32(b: Array[Byte], i: Int): Long =
    u8(b, i).toLong | (u8(b, i + 1).toLong << 8) |
      (u8(b, i + 2).toLong << 16) | (u8(b, i + 3).toLong << 24)
  private def chunkId(b: Array[Byte], i: Int, id: String): Boolean =
    u8(b, i) == id.charAt(0) && u8(b, i + 1) == id.charAt(1) &&
      u8(b, i + 2) == id.charAt(2) && u8(b, i + 3) == id.charAt(3)

  private def notWav: InternalRow = new GenericInternalRow(
    Array[Any](0, null, null, null, null, null, null, null, null, null))

  private def geomOnly(ch: Int, sr: Int, frames: Long): InternalRow =
    new GenericInternalRow(
      Array[Any](1, ch, sr, frames, null, null, null, null, null, null))

  /** Static helper shared by interpreted eval and generated code. */
  def parse(bytes: Array[Byte], k: Int): InternalRow = {
    val n = bytes.length
    if (n < 12 || !chunkId(bytes, 0, "RIFF") || !chunkId(bytes, 8, "WAVE"))
      return notWav
    var fmtTag = -1
    var ch = -1
    var sr = -1L
    var bps = -1
    var dataOff = -1L
    var dataSize = -1L
    var i = 12L
    while (i + 8 <= n && (fmtTag < 0 || dataOff < 0)) {
      val ii = i.toInt
      val size = le32(bytes, ii + 4)
      if (chunkId(bytes, ii, "fmt ")) {
        if (size < 16 || i + 8 + 16 > n) return notWav
        fmtTag = le16(bytes, ii + 8)
        ch = le16(bytes, ii + 10)
        sr = le32(bytes, ii + 12)
        bps = le16(bytes, ii + 22)
      } else if (chunkId(bytes, ii, "data")) {
        dataOff = i + 8
        dataSize = size
      }
      // RIFF chunks are word-aligned: odd sizes carry a pad byte
      i += 8 + size + (size & 1L)
    }
    if (fmtTag != 1 || bps != 16 || ch < 1 || ch > 2 || sr < 1 ||
      sr > Int.MaxValue || dataOff < 0) return notWav
    val frames = dataSize / (ch * 2L)
    // truncated / oversized data chunk, or nothing to sample: keep the
    // header-true shape, null the stats
    if (dataOff + dataSize > n || frames == 0)
      return geomOnly(ch, sr.toInt, frames)
    val sums = new Array[Long](2)
    val mins = Array(Int.MaxValue, Int.MaxValue)
    val maxs = Array(Int.MinValue, Int.MinValue)
    var s = 0
    while (s < k) {
      val frame = frames * s / k
      val base = (dataOff + (frame * ch) * 2L).toInt
      var c = 0
      while (c < ch) {
        var v = le16(bytes, base + c * 2)
        if (v >= 0x8000) v -= 0x10000 // signed int16
        sums(c) += v
        if (v < mins(c)) mins(c) = v
        if (v > maxs(c)) maxs(c) = v
        c += 1
      }
      s += 1
    }
    // Seq[Any] explicitly: an inferred Seq(Long, Int, Int) numerically
    // WIDENS the Int extrema to Long before boxing, corrupting the
    // IntegerType slots
    def col(c: Int): Seq[Any] =
      if (c < ch) Seq[Any](sums(c), mins(c), maxs(c))
      else Seq(null, null, null)
    new GenericInternalRow(
      (Seq[Any](1, ch, sr.toInt, frames) ++ col(0) ++ col(1)).toArray)
  }
}
