package graft.functions

import org.apache.spark.sql.{Column, GraftSql}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, LongType, StructField, StructType}

/** The ONE RIFF/PCM chunk walk both WAV expressions share
  * ([[WavSampleStats]], [[WavDHash]] — r18 review: the walk had been
  * copied verbatim; a parse-contract fix applied to one copy would
  * silently desynchronize "the same parse contract" the scaladocs
  * promise).
  *
  * Parse contract: `RIFF <size> WAVE`, then a CHUNK SCAN (`<id>
  * <le32 size>`, word-aligned — chunk order and junk chunks vary in
  * the wild, so offsets cannot be assumed; the fixtures plant a
  * variable-length junk chunk to make a fixed-offset cheat
  * impossible) to the `fmt ` chunk (must be PCM: audio format 1,
  * 16 bits per sample, 1-2 channels) and the `data` chunk. Anything
  * else returns null (→ the expressions' not-WAV row). A data chunk
  * that overruns the payload (truncated upload) or holds zero frames
  * reports `samplable = false` with header-true geometry — the BMP
  * truncation contract. */
private[functions] final class RiffPcm(
    val ch: Int, val sr: Int, val dataOff: Long, val frames: Long,
    val samplable: Boolean)

private[functions] object RiffPcm {
  def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  def le32(b: Array[Byte], i: Int): Long =
    u8(b, i).toLong | (u8(b, i + 1).toLong << 8) |
      (u8(b, i + 2).toLong << 16) | (u8(b, i + 3).toLong << 24)
  private def chunkId(b: Array[Byte], i: Int, id: String): Boolean =
    u8(b, i) == id.charAt(0) && u8(b, i + 1) == id.charAt(1) &&
      u8(b, i + 2) == id.charAt(2) && u8(b, i + 3) == id.charAt(3)

  /** null = not a 16-bit PCM WAV at all. */
  def walk(bytes: Array[Byte]): RiffPcm = {
    val n = bytes.length
    if (n < 12 || !chunkId(bytes, 0, "RIFF") || !chunkId(bytes, 8, "WAVE"))
      return null
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
        if (size < 16 || i + 8 + 16 > n) return null
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
      sr > Int.MaxValue || dataOff < 0) return null
    val frames = dataSize / (ch * 2L)
    new RiffPcm(ch, sr.toInt, dataOff, frames,
      dataOff + dataSize <= n && frames > 0)
  }
}

/** Real AUDIO decode — 16-bit PCM WAV sample statistics, the third
  * codec-free payload format after the PPM and BMP pixel paths
  * ([[PpmChannelStats]], [[BmpChannelStats]]): PCM samples after the
  * RIFF chunk walk ARE the raw signal, so decode → downsample →
  * per-channel stats runs real and oracle-checkable end to end. The
  * compressed-audio slot stays the documented stub.
  *
  * Parse contract: [[RiffPcm]] (shared with [[WavDHash]]). Anything
  * non-PCM-WAV — null payloads included, via null propagation + the
  * Column layer's coalesce — is `is_wav = 0` with null fields. A data
  * chunk that overruns the payload (truncated upload) keeps the
  * header-true channels / sample_rate / n_frames with null sample
  * stats — the BMP truncation contract.
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

  private def notWav: InternalRow = new GenericInternalRow(
    Array[Any](0, null, null, null, null, null, null, null, null, null))

  private def geomOnly(ch: Int, sr: Int, frames: Long): InternalRow =
    new GenericInternalRow(
      Array[Any](1, ch, sr, frames, null, null, null, null, null, null))

  /** Static helper shared by interpreted eval and generated code. */
  def parse(bytes: Array[Byte], k: Int): InternalRow = {
    val r = RiffPcm.walk(bytes)
    if (r == null) return notWav
    if (!r.samplable) return geomOnly(r.ch, r.sr, r.frames)
    val sums = new Array[Long](2)
    val mins = Array(Int.MaxValue, Int.MaxValue)
    val maxs = Array(Int.MinValue, Int.MinValue)
    var s = 0
    while (s < k) {
      val frame = r.frames * s / k
      val base = (r.dataOff + (frame * r.ch) * 2L).toInt
      var c = 0
      while (c < r.ch) {
        var v = RiffPcm.le16(bytes, base + c * 2)
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
      if (c < r.ch) Seq[Any](sums(c), mins(c), maxs(c))
      else Seq(null, null, null)
    new GenericInternalRow(
      (Seq[Any](1, r.ch, r.sr, r.frames) ++ col(0) ++ col(1)).toArray)
  }
}
