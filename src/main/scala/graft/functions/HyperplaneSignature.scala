package graft.functions

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{Column, GraftSql}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Sign-random-projection (hyperplane) LSH band keys for an
  * `array<double>` embedding — the cosine-similarity analogue of
  * MinHash banding (Charikar's SimHash construction over real
  * vectors). For each of `numTables` tables the vector is dotted with
  * `bitsPerTable` pseudo-random Rademacher (±1) hyperplanes; the sign
  * bits pack into one band key, disambiguated across tables via the
  * table index in the high bits. Two vectors at angle θ agree on one
  * bit with probability 1 − θ/π, so a table collides with probability
  * (1 − θ/π)^bitsPerTable — near-duplicates (θ→0) collide in some
  * table with high probability while unrelated vectors almost never
  * do.
  *
  * Sign bits are scale-invariant, so the input needs NO normalization
  * pass (cos(a,b) depends only on directions). Null elements
  * contribute 0 to the dot product; the all-zero vector keys
  * deterministically (all sign bits 0) — callers doing dedup should
  * drop zero/null embeddings upstream, as verification scores them
  * −1 anyway.
  *
  * The ±1 hyperplane matrix (`numTables·bitsPerTable·dim` entries,
  * hard-capped at 2^24 elements per parameterization) is derived from
  * `seed` via splitmix64 and memoized in a per-JVM cache (a few MB at
  * typical dims) — each executor materializes it once,
  * then every row is `numTables·bitsPerTable` sign dot products with
  * no allocation beyond the output array. Codegen is the same
  * static-helper shape as [[RollingChunkHashes]]: one monomorphic call
  * inside the enclosing WholeStageCodegen stage.
  */
case class HyperplaneSignature(
    child: Expression,
    numTables: Int = 8,
    bitsPerTable: Int = 16,
    seed: Long = 42L) extends UnaryExpression {

  require(numTables >= 1 && numTables <= 128,
    s"numTables must be in [1, 128], got $numTables")
  require(bitsPerTable >= 1 && bitsPerTable <= 32,
    s"bitsPerTable must be in [1, 32], got $bitsPerTable")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<double> argument, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hyperplane_signature"

  override protected def nullSafeEval(input: Any): Any =
    HyperplaneSignature.compute(
      input.asInstanceOf[ArrayData], numTables, bitsPerTable, seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.HyperplaneSignature.compute($c, $numTables, $bitsPerTable, ${seed}L)")

  override protected def withNewChildInternal(
      newChild: Expression): HyperplaneSignature = copy(child = newChild)
}

object HyperplaneSignature {

  // splitmix64 finalizer — decorrelates sequential indices into iid bits
  private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  // (seed, tables, bits, dim) -> row-major ±1 matrix [table][bit][dim].
  // One entry per distinct parameterization used in the JVM, size
  // tables·bits·dim doubles each — hard-capped below so arbitrary SQL
  // (the function is registered via GraftExtensions) cannot pin
  // multi-GB arrays in every executor. The ENTRY COUNT is bounded too:
  // a long-lived executor serving many jobs with distinct
  // seeds/dims/knobs would otherwise grow the map without limit (up to
  // 128 MB per entry). A real pipeline uses a handful of
  // parameterizations; when the cap is hit the whole map is dropped and
  // rebuilt on demand — a rare, cheap (derivation is a few ms) flush,
  // chosen over LRU bookkeeping on the per-row hot path.
  private val MaxMatrixElems = 1 << 24 // 16M doubles = 128 MB ceiling
  private val MaxCacheEntries = 16
  private val planes = new ConcurrentHashMap[(Long, Int, Int, Int), Array[Double]]()

  private def hyperplanes(
      seed: Long, tables: Int, bits: Int, dim: Int): Array[Double] = {
    if (planes.size > MaxCacheEntries) planes.clear()
    planes.computeIfAbsent((seed, tables, bits, dim), { key =>
      val (s, t, b, d) = key
      require(t.toLong * b * d <= MaxMatrixElems,
        s"hyperplane matrix numTables*bitsPerTable*dim = ${t.toLong * b * d} " +
          s"exceeds $MaxMatrixElems elements; reduce tables/bits for this dim")
      val m = new Array[Double](t * b * d)
      var i = 0
      while (i < m.length) {
        m(i) = if ((mix(s + i) & 1L) == 0L) 1.0 else -1.0
        i += 1
      }
      m
    })
  }

  /** Static helper shared by interpreted eval and generated code. */
  def compute(arr: ArrayData, tables: Int, bits: Int, seed: Long): ArrayData = {
    val dim = arr.numElements()
    val m = hyperplanes(seed, tables, bits, dim)
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var key = 0L
      var b = 0
      while (b < bits) {
        val base = (t * bits + b) * dim
        var dot = 0.0
        var i = 0
        while (i < dim) {
          if (!arr.isNullAt(i)) dot += arr.getDouble(i) * m(base + i)
          i += 1
        }
        key = (key << 1) | (if (dot > 0.0) 1L else 0L)
        b += 1
      }
      // table index in the high bits: one flat 64-bit key space, no
      // cross-table collisions, no separate (table, key) struct column
      out(t) = (t.toLong << 48) | key
      t += 1
    }
    new GenericArrayData(out)
  }

  /** Column wrapper: usable anywhere a built-in function is. */
  def apply(c: Column, numTables: Int, bitsPerTable: Int, seed: Long): Column =
    GraftSql.column(HyperplaneSignature(
      GraftSql.expression(c), numTables, bitsPerTable, seed))
}
