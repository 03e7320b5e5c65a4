package graft.functions

import org.apache.spark.sql.{Column, GraftSql}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Scalar-quantization (SQ8) kernels — the trainless member of the
  * FAISS quantizer family (IndexScalarQuantizer, QT_8bit): each
  * dimension is linearly mapped onto 0..255 between its corpus-wide
  * [min, max]. Compared to PQ there is no k-means codebook — the
  * "model" is two `dim`-length double arrays (`vmin`, `vdiff`), an
  * exact aggregate over the corpus rather than a sampled fit. That
  * buys three things at scale: (1) the encode/score arithmetic is
  * fully deterministic and SQL-expressible, so the DuckDB oracle can
  * hash-verify the whole index (PQ's seeded Lloyd fits cannot be);
  * (2) bounds merge associatively — partial-aggregate min/max is one
  * shuffle of 2·dim doubles per task, and appends can WIDEN bounds
  * detection cheaply; (3) codes are 1 byte/dim semantically (stored
  * as array<int> for parquet/oracle friendliness — a packed binary
  * layout is the production serialization, same note as PQ codes).
  *
  * Rounding contract (shared with the oracle, bit-for-bit):
  * `code = clamp(floor((x - vmin) / vdiff * 255 + 0.5), 0, 255)` —
  * `floor(v + 0.5)` is half-UP rounding, chosen over `rint`'s
  * half-to-even precisely because every SQL engine spells it the same
  * way; `vdiff == 0` (constant dimension) pins the code to 0. The
  * reconstruction is `x̂ = vmin + code * vdiff / 255`.
  *
  * Both kernels take the bounds as plan-embedded arrays (2·dim
  * doubles — model-artifact sized, like the IVF centroid literals;
  * no broadcast needed at this size). Null/ill-shaped vectors encode
  * to null and drop out, the PQ/IVF unindexable-row contract.
  */
case class SqEncode(
    child: Expression,
    vmin: Array[Double],
    vdiff: Array[Double]) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "sq_encode"

  override protected def nullSafeEval(input: Any): Any =
    SqEncode.compute(input.asInstanceOf[ArrayData], vmin, vdiff)

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val minRef = ctx.addReferenceObj("sqVmin", vmin, "double[]")
    val diffRef = ctx.addReferenceObj("sqVdiff", vdiff, "double[]")
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.SqEncode.compute($c, $minRef, $diffRef);
      ${ev.isNull} = (${ev.value} == null);""")
  }

  override protected def withNewChildInternal(
      newChild: Expression): SqEncode = copy(child = newChild)
}

object SqEncode {
  def apply(v: Column, vmin: Array[Double], vdiff: Array[Double]): Column =
    GraftSql.column(SqEncode(GraftSql.expression(v), vmin, vdiff))

  /** Static helper shared by interpreted eval and generated code.
    * Returns null for unquantizable input (wrong length / null slot). */
  def compute(arr: ArrayData, vmin: Array[Double],
      vdiff: Array[Double]): ArrayData = {
    val dim = vmin.length
    if (arr.numElements() != dim) return null
    var i = 0
    while (i < dim) { if (arr.isNullAt(i)) return null; i += 1 }
    val codes = new Array[Int](dim)
    i = 0
    while (i < dim) {
      if (vdiff(i) != 0.0) {
        val v = Math.floor(
          (arr.getDouble(i) - vmin(i)) / vdiff(i) * 255.0 + 0.5)
        codes(i) = if (v < 0.0) 0 else if (v > 255.0) 255 else v.toInt
      } // else: constant dimension, code stays 0
      i += 1
    }
    new GenericArrayData(codes.map(Int.box))
  }
}

/** `sqrt(Σ x̂_i²)` over the RECONSTRUCTED vector — computed once at
  * encode time and stored beside the codes, so the probe's cosine
  * denominator never touches raw embeddings. */
case class SqReconNorm(
    child: Expression,
    vmin: Array[Double],
    vdiff: Array[Double]) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<int>, got ${other.catalogString}")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "sq_recon_norm"

  override protected def nullSafeEval(input: Any): Any =
    SqReconNorm.compute(input.asInstanceOf[ArrayData], vmin, vdiff)

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val minRef = ctx.addReferenceObj("sqVmin", vmin, "double[]")
    val diffRef = ctx.addReferenceObj("sqVdiff", vdiff, "double[]")
    val res = ctx.freshName("sqRnRes")
    nullSafeCodeGen(ctx, ev, c => s"""
      java.lang.Double $res =
        graft.functions.SqReconNorm.compute($c, $minRef, $diffRef);
      ${ev.isNull} = ($res == null);
      ${ev.value} = ${ev.isNull} ? -1.0 : $res.doubleValue();""")
  }

  override protected def withNewChildInternal(
      newChild: Expression): SqReconNorm = copy(child = newChild)
}

object SqReconNorm {
  def apply(codes: Column, vmin: Array[Double],
      vdiff: Array[Double]): Column =
    GraftSql.column(SqReconNorm(GraftSql.expression(codes), vmin, vdiff))

  /** Boxed so a shape-mismatched codes array yields null, never an
    * out-of-bounds read (codes from a DIFFERENT index's bounds). */
  def compute(codes: ArrayData, vmin: Array[Double],
      vdiff: Array[Double]): java.lang.Double = {
    val dim = vmin.length
    if (codes.numElements() != dim) return null
    var s = 0.0
    var i = 0
    while (i < dim) {
      val xr = vmin(i) + codes.getInt(i) * vdiff(i) / 255.0
      s += xr * xr
      i += 1
    }
    Math.sqrt(s)
  }
}

/** The SQ scoring loop: `Σ q_i · (vmin_i + code_i · vdiff_i / 255)` —
  * the asymmetric dot of a RAW query against a reconstructed corpus
  * vector, O(dim) int-read + FMA per pair inside the enclosing
  * WholeStageCodegen stage. The probe plan never references the
  * embedding column, so parquet prunes it at the scan (the PQ probe's
  * IO story, without the LUT indirection). */
case class SqAdcDot(
    left: Expression,   // raw query: array<double>, length dim
    right: Expression,  // codes: array<int>, length dim
    vmin: Array[Double],
    vdiff: Array[Double]) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<double>, array<int>), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "sq_adc_dot"

  override protected def nullSafeEval(q: Any, codes: Any): Any =
    SqAdcDot.compute(q.asInstanceOf[ArrayData],
      codes.asInstanceOf[ArrayData], vmin, vdiff)

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val minRef = ctx.addReferenceObj("sqVmin", vmin, "double[]")
    val diffRef = ctx.addReferenceObj("sqVdiff", vdiff, "double[]")
    val res = ctx.freshName("sqDotRes")
    nullSafeCodeGen(ctx, ev, (q, c) => s"""
      java.lang.Double $res =
        graft.functions.SqAdcDot.compute($q, $c, $minRef, $diffRef);
      ${ev.isNull} = ($res == null);
      ${ev.value} = ${ev.isNull} ? -1.0 : $res.doubleValue();""")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SqAdcDot =
    copy(left = newLeft, right = newRight)
}

object SqAdcDot {
  def apply(q: Column, codes: Column, vmin: Array[Double],
      vdiff: Array[Double]): Column =
    GraftSql.column(SqAdcDot(
      GraftSql.expression(q), GraftSql.expression(codes), vmin, vdiff))

  /** Boxed so a query/codes pair whose lengths disagree with the
    * bounds yields null, never an out-of-bounds read. */
  def compute(q: ArrayData, codes: ArrayData, vmin: Array[Double],
      vdiff: Array[Double]): java.lang.Double = {
    val dim = vmin.length
    if (q.numElements() != dim || codes.numElements() != dim) return null
    var s = 0.0
    var i = 0
    while (i < dim) {
      s += q.getDouble(i) * (vmin(i) + codes.getInt(i) * vdiff(i) / 255.0)
      i += 1
    }
    s
  }
}
