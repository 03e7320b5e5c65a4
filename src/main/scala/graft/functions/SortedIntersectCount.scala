package graft.functions

import org.apache.spark.sql.{Column, GraftSql}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}

/** `|A ∩ B|` for two SORTED (ascending binary/UTF8 order, the
  * `array_sort` order) string arrays with DISTINCT elements, as one
  * codegen'd merge scan — the verification kernel under the exact
  * n-gram Jaccard stage ([[graft.llm.Dedup.ngramJaccard]]).
  *
  * Why not `size(array_intersect(a, b))`: ArrayIntersect builds a
  * fresh hash set of one side PER ROW (allocation + hashing of every
  * element), and the verify stage is the hot loop of every LSH dedup
  * path — on a high-duplication corpus the candidate count approaches
  * the corpus count. The merge scan does zero allocation and one
  * byte-compare walk of the two arrays, inside the enclosing
  * WholeStageCodegen stage (static-helper shape, the
  * [[MinhashSignature]] pattern); the count — and with it the Jaccard
  * — is bit-identical to the hash-set intersect on sorted-distinct
  * inputs, so oracle rows are unaffected.
  *
  * Contract: both inputs sorted ascending with no duplicate elements
  * (producers use `array_sort(array_distinct(...))`). Null ELEMENTS
  * are not shingles: `array_sort` places them last, and the scan stops
  * at the first null on either side (a null never equals anything, so
  * it can never contribute to the count). A null ARRAY yields null
  * (BinaryExpression's default null-intolerance).
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<string> arguments, got " +
          s"${l.catalogString} and ${r.catalogString}")
    }

  override def dataType: DataType = IntegerType
  override def prettyName: String = "sorted_intersect_count"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SortedIntersectCount.compute(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.SortedIntersectCount.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectCount {

  /** Static helper shared by interpreted eval and generated code. */
  def compute(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0; var j = 0; var c = 0
    while (i < na && j < nb && !a.isNullAt(i) && !b.isNullAt(j)) {
      val cmp = a.getUTF8String(i).compareTo(b.getUTF8String(j))
      if (cmp == 0) { c += 1; i += 1; j += 1 }
      else if (cmp < 0) i += 1
      else j += 1
    }
    c
  }

  /** Column wrapper: usable anywhere a built-in function is. */
  def apply(a: Column, b: Column): Column =
    GraftSql.column(SortedIntersectCount(
      GraftSql.expression(a), GraftSql.expression(b)))
}
