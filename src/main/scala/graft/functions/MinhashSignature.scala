package graft.functions

import org.apache.spark.sql.{Column, GraftSql}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Full MinHash signature of a shingle set in ONE codegen'd pass:
  * `numHashes` running minima of per-lane shingle hashes, where lane i
  * of shingle s is `xxhash64(s, seed + i)` — BIT-IDENTICAL, for
  * null-free shingle arrays, to the SQL formulation
  * `aggregate(shingles, [Long.Max,...], (acc, s) =>
  * zip_with(acc, seeds, (a, sd) => least(a, xxhash64(s, sd))))` this
  * expression replaces (Spark's two-arg xxhash64 folds left from the
  * fixed seed 42: `hashLong(sd, hashUTF8String(s, 42))`; asserted in
  * MinhashSignatureSpec). The null-free qualifier matters: Spark's
  * xxhash64 treats a NULL argument as a no-op (the lane would fold the
  * bare seed through `hashLong`), while this expression SKIPS null
  * slots entirely (a null is not a shingle). The shingle producer here,
  * [[WordNgrams]], never emits null elements, so the two never diverge
  * in this library's pipelines.
  *
  * Why: higher-order functions are evaluated INTERPRETED (no codegen)
  * and that fold allocates a fresh `numHashes`-slot array per shingle
  * via zip_with — per-row cost `shingles × numHashes` interpreted
  * expression evals. Here each shingle pays ONE string hash, then
  * `numHashes` 5-op long-mixes into a reused accumulator, all inside
  * the enclosing WholeStageCodegen stage (static-helper shape, like
  * [[RollingChunkHashes]]). The input needs no `array_distinct`:
  * min over a multiset equals min over its set, so duplicate shingles
  * only redo minima — cheaper than the hash-set dedup pass.
  *
  * Null shingle slots are skipped (absent from the set); an empty or
  * all-null array yields all-`Long.MaxValue` slots, matching the
  * fold's init value.
  */
case class MinhashSignature(
    child: Expression,
    numHashes: Int = 64,
    seed: Long = 42L) extends UnaryExpression {

  require(numHashes >= 1 && numHashes <= 4096,
    s"numHashes must be in [1, 4096], got $numHashes")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<string> argument, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  override protected def nullSafeEval(input: Any): Any =
    MinhashSignature.compute(input.asInstanceOf[ArrayData], numHashes, seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.MinhashSignature.compute($c, $numHashes, ${seed}L)")

  override protected def withNewChildInternal(
      newChild: Expression): MinhashSignature = copy(child = newChild)
}

object MinhashSignature {

  /** Static helper shared by interpreted eval and generated code. */
  def compute(arr: ArrayData, numHashes: Int, seed: Long): ArrayData = {
    val acc = new Array[Long](numHashes)
    java.util.Arrays.fill(acc, Long.MaxValue)
    val n = arr.numElements()
    var j = 0
    while (j < n) {
      if (!arr.isNullAt(j)) {
        // identical arithmetic to SQL xxhash64(shingle, seed + i):
        // left fold from the expression's fixed seed 42 — string first,
        // then the lane value as a long
        val hs = XXH64.hashUTF8String(arr.getUTF8String(j), 42L)
        var i = 0
        while (i < numHashes) {
          val v = XXH64.hashLong(seed + i, hs)
          if (v < acc(i)) acc(i) = v
          i += 1
        }
      }
      j += 1
    }
    new GenericArrayData(acc)
  }

  /** Column wrapper: usable anywhere a built-in function is. */
  def apply(c: Column, numHashes: Int, seed: Long): Column =
    GraftSql.column(MinhashSignature(GraftSql.expression(c), numHashes, seed))
}
