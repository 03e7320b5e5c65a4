package graft.functions

import org.apache.spark.sql.{Column, GraftSql}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunk fingerprints via a gear rolling hash
  * (FastCDC-style) — the classic copied-passage / partial-duplicate
  * primitive. The hash shifts left one bit per byte and adds a value
  * from a fixed pseudorandom 256-entry table, so it depends only on
  * the trailing ~64 bytes and mixes well even on low-entropy ASCII
  * (a plain polynomial's low bits don't); bytes where
  * `hash & (2^avgChunkBits - 1) == 0` close a chunk, and each chunk
  * emits an FNV hash of its bytes. Because boundaries depend only on
  * LOCAL content, an edit changes just the chunk(s) containing it —
  * two documents sharing a long passage share that passage's chunk
  * hashes regardless of position (unlike fixed-offset slicing).
  *
  * Codegen: the per-row loop lives in a static helper invoked from the
  * generated code — one monomorphic call inside the enclosing
  * WholeStageCodegen stage, the standard StaticInvoke shape.
  *
  * Output: `array<long>` of chunk hashes, ≥ 1 entry for non-empty
  * input (trailing bytes always close a final chunk), empty array for
  * the empty string.
  */
case class RollingChunkHashes(
    child: Expression,
    avgChunkBits: Int = 6,
    window: Int = 16) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "rolling_chunk_hashes"

  override protected def nullSafeEval(input: Any): Any =
    RollingChunkHashes.compute(
      input.asInstanceOf[UTF8String], avgChunkBits, window)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.RollingChunkHashes.compute($c, $avgChunkBits, $window)")

  override protected def withNewChildInternal(
      newChild: Expression): RollingChunkHashes = copy(child = newChild)
}

object RollingChunkHashes {
  private val FnvPrime = 1099511628211L
  private val FnvBasis = -3750763034362895579L // FNV-1a 64-bit offset basis

  // fixed pseudorandom gear table (splitmix64 over a golden-ratio seed)
  private val Gear: Array[Long] = {
    var x = 0L
    Array.fill(256) {
      x += 0x9E3779B97F4A7C15L
      var z = x
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
  }

  /** Static helper shared by interpreted eval and generated code.
    * `window` acts as the minimum chunk length (the gear hash's
    * effective dependency window is the 64 trailing bytes). */
  def compute(s: UTF8String, avgChunkBits: Int, window: Int): ArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    if (n == 0) return new GenericArrayData(Array.empty[Long])
    val mask = (1L << avgChunkBits) - 1L
    val out = new scala.collection.mutable.ArrayBuffer[Long](n >> 5)
    var gear = 0L
    var chunk = FnvBasis
    var chunkLen = 0
    var i = 0
    while (i < n) {
      val b = bytes(i) & 0xFF
      gear = (gear << 1) + Gear(b)
      chunk = (chunk ^ b) * FnvPrime
      chunkLen += 1
      if (chunkLen >= window && (gear & mask) == 0L) {
        out += chunk
        chunk = FnvBasis
        chunkLen = 0
      }
      i += 1
    }
    if (chunkLen > 0) out += chunk
    new GenericArrayData(out.toArray)
  }

  /** Column wrapper. */
  def apply(text: Column, avgChunkBits: Int, window: Int): Column =
    GraftSql.column(
      RollingChunkHashes(GraftSql.expression(text), avgChunkBits, window))
}
