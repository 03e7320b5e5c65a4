package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.{Column, GraftSql}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Lowercase word `n`-grams of a string in ONE codegen'd pass —
  * tokenize on `[^\p{L}\p{N}]+` (empty tokens dropped) then join each
  * sliding window of `n` tokens with a single space. Replaces the
  * MLlib `RegexTokenizer` + `NGram` transformer pair in the dedup hot
  * path: those are Scala UDFs (interpreted, with per-row
  * Seq↔ArrayData conversions and an intermediate tokens column); this
  * is a single expression inside the enclosing WholeStageCodegen stage
  * (static-helper shape, like [[RollingChunkHashes]]). Tokenization is
  * BIT-IDENTICAL to the transformer pair — same regex, same
  * default-locale lowercasing, same empty-token filter — asserted
  * against the MLlib formulation in WordNgramsSpec and end-to-end by
  * the dedup_ngram_jaccard / llm_decontaminate DuckDB oracles.
  *
  * Short-doc fallback, per call site (docs with fewer than `n`
  * tokens):
  *  - `strictFallback = true`: the WHOLE token sequence as one gram
  *    (decontamination semantics — a short benchmark item matches
  *    identical short docs only);
  *  - `strictFallback = false`: the single tokens themselves (shingle
  *    semantics — tiny docs still participate in minhash banding).
  * Zero tokens yield an empty array under both.
  */
case class WordNgrams(
    child: Expression,
    n: Int,
    strictFallback: Boolean) extends UnaryExpression {

  require(n >= 1 && n <= 64, s"n must be in [1, 64], got $n")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_ngrams"

  override protected def nullSafeEval(input: Any): Any =
    WordNgrams.compute(input.asInstanceOf[UTF8String], n, strictFallback)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.WordNgrams.compute($c, $n, $strictFallback)")

  override protected def withNewChildInternal(
      newChild: Expression): WordNgrams = copy(child = newChild)
}

object WordNgrams {

  // same pattern, gaps semantics and (default-locale) lowercasing as
  // RegexTokenizer(pattern = "[^\p{L}\p{N}]+", toLowercase = true)
  private val Sep = Pattern.compile("[^\\p{L}\\p{N}]+")

  /** Static helper shared by interpreted eval and generated code. */
  def compute(text: UTF8String, n: Int, strict: Boolean): ArrayData = {
    val raw = Sep.split(text.toString.toLowerCase)
    var nTokens = 0
    var i = 0
    while (i < raw.length) { if (raw(i).nonEmpty) nTokens += 1; i += 1 }
    if (nTokens == 0) return new GenericArrayData(Array.empty[Any])
    val toks = new Array[String](nTokens)
    var j = 0
    i = 0
    while (i < raw.length) {
      if (raw(i).nonEmpty) { toks(j) = raw(i); j += 1 }
      i += 1
    }
    val out: Array[Any] =
      if (nTokens >= n) {
        val m = nTokens - n + 1
        val a = new Array[Any](m)
        var g = 0
        while (g < m) {
          val sb = new java.lang.StringBuilder
          var k = 0
          while (k < n) {
            if (k > 0) sb.append(' ')
            sb.append(toks(g + k))
            k += 1
          }
          a(g) = UTF8String.fromString(sb.toString)
          g += 1
        }
        a
      } else if (strict) {
        Array[Any](UTF8String.fromString(toks.mkString(" ")))
      } else {
        val a = new Array[Any](nTokens)
        var t = 0
        while (t < nTokens) { a(t) = UTF8String.fromString(toks(t)); t += 1 }
        a
      }
    new GenericArrayData(out)
  }

  /** Column wrapper: usable anywhere a built-in function is. */
  def apply(c: Column, n: Int, strictFallback: Boolean): Column =
    GraftSql.column(
      WordNgrams(GraftSql.expression(c), n, strictFallback))
}
