package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, GraftSql}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Product-quantization kernels (Jégou et al., "Product Quantization
  * for Nearest Neighbor Search", TPAMI 2011), as codegen'd Catalyst
  * expressions. The codebook — `m` subspaces × `k` centroids ×
  * `subDim` doubles, flattened `((j*k)+c)*subDim + t` — rides a
  * BROADCAST, so a 1000-executor encode/score stage fetches it once
  * per executor, not once per task closure.
  *
  * Three kernels, one per pipeline stage:
  *  - [[PqEncode]] (corpus, once per build): vector → `m` centroid ids.
  *  - [[PqLut]] (queries, once per query): vector → the `m*k` table of
  *    subvector·centroid dot products.
  *  - [[PqAdcScore]] (the hot pair loop): codes + LUT → approximate
  *    dot product in `m` ARRAY LOOKUPS — this O(m)-per-pair loop
  *    instead of O(dim) multiplies is the asymmetric-distance trick
  *    that, together with codes being `m` ints instead of `dim`
  *    floats, makes a 100 TB corpus scannable.
  *
  * All three return null on null/ill-shaped input (a vector whose
  * length isn't `m*subDim`, or with null slots, cannot be quantized —
  * same unindexable-row contract as the IVF path, which drops
  * null-embedding rows rather than throwing mid-stage at scale).
  */
case class PqEncode(
    child: Expression,
    codebook: Broadcast[Array[Double]],
    m: Int,
    k: Int,
    subDim: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "pq_encode"

  override protected def nullSafeEval(input: Any): Any =
    PqEncode.compute(input.asInstanceOf[ArrayData], codebook.value, m, k, subDim)

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqCodebook", codebook,
      "org.apache.spark.broadcast.Broadcast")
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.PqEncode.compute(
        $c, (double[]) $ref.value(), $m, $k, $subDim);
      ${ev.isNull} = (${ev.value} == null);""")
  }

  override protected def withNewChildInternal(
      newChild: Expression): PqEncode = copy(child = newChild)
}

object PqEncode {
  def apply(v: Column, codebook: Broadcast[Array[Double]],
      m: Int, k: Int, subDim: Int): Column =
    GraftSql.column(PqEncode(GraftSql.expression(v), codebook, m, k, subDim))

  /** Static helper shared by interpreted eval and generated code.
    * Returns null for unquantizable input (wrong length / null slot). */
  def compute(arr: ArrayData, cb: Array[Double],
      m: Int, k: Int, subDim: Int): ArrayData = {
    if (arr.numElements() != m * subDim) return null
    var i = 0
    while (i < m * subDim) { if (arr.isNullAt(i)) return null; i += 1 }
    val codes = new Array[Int](m)
    var j = 0
    while (j < m) {
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < k) {
        val base = (j * k + c) * subDim
        var d = 0.0
        var t = 0
        while (t < subDim) {
          val diff = arr.getDouble(j * subDim + t) - cb(base + t)
          d += diff * diff
          t += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      codes(j) = best
      j += 1
    }
    new GenericArrayData(codes.map(Int.box))
  }
}

/** Per-query lookup table: `lut[j*k + c] = dot(q_sub_j, centroid(j,c))`
  * — O(k*dim) once per QUERY, amortized over every corpus pair that
  * query scores via [[PqAdcScore]]. */
case class PqLut(
    child: Expression,
    codebook: Broadcast[Array[Double]],
    m: Int,
    k: Int,
    subDim: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "pq_lut"

  override protected def nullSafeEval(input: Any): Any =
    PqLut.compute(input.asInstanceOf[ArrayData], codebook.value, m, k, subDim)

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqCodebook", codebook,
      "org.apache.spark.broadcast.Broadcast")
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.PqLut.compute(
        $c, (double[]) $ref.value(), $m, $k, $subDim);
      ${ev.isNull} = (${ev.value} == null);""")
  }

  override protected def withNewChildInternal(
      newChild: Expression): PqLut = copy(child = newChild)
}

object PqLut {
  def apply(v: Column, codebook: Broadcast[Array[Double]],
      m: Int, k: Int, subDim: Int): Column =
    GraftSql.column(PqLut(GraftSql.expression(v), codebook, m, k, subDim))

  def compute(arr: ArrayData, cb: Array[Double],
      m: Int, k: Int, subDim: Int): ArrayData = {
    if (arr.numElements() != m * subDim) return null
    var i = 0
    while (i < m * subDim) { if (arr.isNullAt(i)) return null; i += 1 }
    val lut = new Array[Double](m * k)
    var j = 0
    while (j < m) {
      var c = 0
      while (c < k) {
        val base = (j * k + c) * subDim
        var dot = 0.0
        var t = 0
        while (t < subDim) {
          dot += arr.getDouble(j * subDim + t) * cb(base + t)
          t += 1
        }
        lut(j * k + c) = dot
        c += 1
      }
      j += 1
    }
    new GenericArrayData(lut.map(Double.box))
  }
}

/** The ADC inner loop: approximate `dot(query, corpus_vector)` =
  * `sum_j lut[j*k + codes[j]]` — `m` array reads per pair, no floating
  * multiply, inside the enclosing WholeStageCodegen stage. */
case class PqAdcScore(
    left: Expression,   // lut: array<double>, length m*k
    right: Expression,  // codes: array<int>, length m
    k: Int) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<double>, array<int>), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc_score"

  override protected def nullSafeEval(lut: Any, codes: Any): Any =
    PqAdcScore.compute(lut.asInstanceOf[ArrayData],
      codes.asInstanceOf[ArrayData], k)

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (l, c) =>
      s"graft.functions.PqAdcScore.compute($l, $c, $k)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdcScore =
    copy(left = newLeft, right = newRight)
}

object PqAdcScore {
  def apply(lut: Column, codes: Column, k: Int): Column =
    GraftSql.column(
      PqAdcScore(GraftSql.expression(lut), GraftSql.expression(codes), k))

  def compute(lut: ArrayData, codes: ArrayData, k: Int): Double = {
    val m = codes.numElements()
    var s = 0.0
    var j = 0
    while (j < m) {
      s += lut.getDouble(j * k + codes.getInt(j))
      j += 1
    }
    s
  }
}
