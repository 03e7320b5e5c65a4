package graft.functions

import org.apache.spark.sql.{Column, GraftSql}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, LongType, StructField, StructType}

/** dHash perceptual hash of a 16-bit PCM WAV clip — the AUDIO
  * near-dup signature, completing the modality symmetry with
  * [[BmpDHash]] (images have fingerprint → pairs → clusters →
  * incremental → streaming legs; audio had only sample stats): the
  * difference-hash recipe applied to the time axis. Sample 65
  * nearest-neighbor mixdown values (position i reads frame
  * ⌊i·n_frames/65⌋ — the [[WavSampleStats]] resize recipe; mixdown =
  * SUM of the frame's signed int16 samples across channels, the
  * channel-sum "grayscale" analog — no division, no rounding, stays
  * exact-integer), emit one bit per adjacent comparison
  * `v(j) < v(j+1)`, packed as eight bytes `d0..d7` (bit x of byte y
  * is comparison j = 8y + x). Hamming distance between two hashes is
  * small for re-encodes/pads/level-identical copies of the same clip
  * and ~32 for unrelated audio.
  *
  * Same parse contract as [[WavSampleStats]] (RIFF chunk walk behind
  * arbitrary junk chunks, PCM-only gate, 1-2 channels; malformed →
  * is_wav 0 all-null, truncated data chunk → header-true geometry
  * with null hash bytes) and the same static-helper codegen shape:
  * one call fused into the payload scan, 65·channels 16-bit reads per
  * row regardless of clip length — scan-speed at 100 TB. Emitting the
  * hash as plain INT columns `d0..d7` (the [[BmpDHash]] schema) means
  * the existing multiprobe banding, hamming arithmetic, incremental
  * and streaming keeper machinery operate on it UNCHANGED. */
case class WavDHash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary argument, got ${other.catalogString}")
  }

  override def dataType: DataType = WavDHash.schema
  override def prettyName: String = "wav_dhash"

  override protected def nullSafeEval(input: Any): Any =
    WavDHash.parse(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WavDHash.parse($c)")

  override protected def withNewChildInternal(newChild: Expression): WavDHash =
    copy(child = newChild)
}

object WavDHash {
  def apply(payload: Column): Column =
    GraftSql.column(WavDHash(GraftSql.expression(payload)))

  /** 65 sampled positions → 8×8 = 64 comparison bits — the
    * [[BmpDHash]] 9-column/8-row grid laid on the time axis. */
  val Positions = 65
  val HashBytes = 8

  val schema: StructType = StructType(
    StructField("is_wav", IntegerType, nullable = false) +:
    StructField("channels", IntegerType, nullable = true) +:
    StructField("sample_rate", IntegerType, nullable = true) +:
    StructField("n_frames", LongType, nullable = true) +:
    (0 until HashBytes).map(y =>
      StructField(s"d$y", IntegerType, nullable = true)))

  private def notWav: InternalRow = new GenericInternalRow(
    Array[Any](0, null, null, null,
      null, null, null, null, null, null, null, null))

  private def geomOnly(ch: Int, sr: Int, frames: Long): InternalRow =
    new GenericInternalRow(Array[Any](1, ch, sr, frames,
      null, null, null, null, null, null, null, null))

  /** Static helper shared by interpreted eval and generated code —
    * chunk walk via the shared [[RiffPcm]] (ONE parse contract for
    * both WAV expressions). */
  def parse(bytes: Array[Byte]): InternalRow = {
    val r = RiffPcm.walk(bytes)
    if (r == null) return notWav
    if (!r.samplable) return geomOnly(r.ch, r.sr, r.frames)
    // 65 nearest-neighbor mixdown samples (channel-sum, signed)
    val v = new Array[Int](Positions)
    var s = 0
    while (s < Positions) {
      val frame = r.frames * s / Positions
      val base = (r.dataOff + (frame * r.ch) * 2L).toInt
      var mix = 0
      var c = 0
      while (c < r.ch) {
        var x = RiffPcm.le16(bytes, base + c * 2)
        if (x >= 0x8000) x -= 0x10000 // signed int16
        mix += x
        c += 1
      }
      v(s) = mix
      s += 1
    }
    val out = new Array[Any](4 + HashBytes)
    out(0) = 1; out(1) = r.ch; out(2) = r.sr; out(3) = r.frames
    var y = 0
    while (y < HashBytes) {
      var row = 0
      var x = 0
      while (x < 8) {
        if (v(y * 8 + x) < v(y * 8 + x + 1)) row |= (1 << x)
        x += 1
      }
      out(4 + y) = row
      y += 1
    }
    new GenericInternalRow(out)
  }
}
