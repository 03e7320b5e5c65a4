package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, GraftSql}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** IVF cell assignment against a BROADCAST centroid matrix — the
  * top-`nAssign` cell ids of a vector by cosine (desc, ties to the
  * larger cell id), exactly the ordering of the literal-centroid
  * `sort_array(cellScores(...))` formulation it replaces in
  * `Similarity.assignCells`.
  *
  * Why a broadcast expression (the [[PqEncode]] pattern): the literal
  * formulation inlines one [[CosineSimilarity]] call + a `dim`-double
  * array literal PER CENTROID into the projection. That is fine at the
  * ANN indexes' nCells=16, but SemDeDup derives nCells ∝ corpus size
  * (`Dedup.semanticKnobs`) — at the 10× rehearsal scale (20 k vectors,
  * 625 cells) the generated assignment code blew janino's 64 KB method
  * limit and the whole corpus projection fell back to interpreted eval
  * (measured 121× at 10× data). Here the matrix rides one broadcast —
  * fetched once per executor, not once per task closure — and the
  * assignment is a tight compiled loop: O(nCells·dim) per row with no
  * plan growth in nCells, the shape a web-scale cell count needs.
  *
  * Per-centroid cosine is [[CosineSimilarity]]'s arithmetic verbatim
  * (same fold order, so bit-identical): null element anywhere or a
  * zero denominator scores -1 — never NaN/null — which makes an
  * ill-shaped vector rank every cell equal and take the LARGEST cell
  * ids, the assignCells documented fallback. A NULL input vector nulls
  * the whole expression (standard null propagation); the caller
  * coalesces to the same largest-cells fallback. */
case class TopCells(
    child: Expression,
    centroids: Broadcast[Array[Double]],
    dim: Int,
    nAssign: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "top_cells"

  override protected def nullSafeEval(input: Any): Any =
    TopCells.compute(input.asInstanceOf[ArrayData], centroids.value, dim,
      nAssign)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cellCentroids", centroids,
      "org.apache.spark.broadcast.Broadcast")
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.TopCells.compute(
        $c, (double[]) $ref.value(), $dim, $nAssign);""")
  }

  override protected def withNewChildInternal(
      newChild: Expression): TopCells = copy(child = newChild)
}

object TopCells {
  def apply(v: Column, centroids: Broadcast[Array[Double]],
      dim: Int, nAssign: Int): Column =
    GraftSql.column(
      TopCells(GraftSql.expression(v), centroids, dim, nAssign))

  /** Static helper shared by interpreted eval and generated code.
    * `ctr` is the row-major flattened matrix (cell·dim + t). */
  def compute(arr: ArrayData, ctr: Array[Double], dim: Int,
      nAssign: Int): ArrayData = {
    val nCells = ctr.length / dim
    val k = math.min(nAssign, nCells)
    val nv = arr.numElements()
    // CosineSimilarity contract: any null element → -1 vs every centroid
    var hasNull = false
    var i = 0
    while (i < nv && !hasNull) { hasNull = arr.isNullAt(i); i += 1 }
    var na = 0.0
    if (!hasNull) {
      i = 0
      while (i < nv) { val v = arr.getDouble(i); na += v * v; i += 1 }
    }
    val topCos = new Array[Double](k)
    val topCell = new Array[Int](k)
    var filled = 0
    var c = 0
    while (c < nCells) {
      var cos = -1.0
      if (!hasNull) {
        val base = c * dim
        val n = math.min(nv, dim)
        var dot = 0.0
        var j = 0
        while (j < n) { dot += arr.getDouble(j) * ctr(base + j); j += 1 }
        var nb = 0.0
        j = 0
        while (j < dim) { val v = ctr(base + j); nb += v * v; j += 1 }
        val denom = math.sqrt(na) * math.sqrt(nb)
        cos = if (denom == 0.0) -1.0 else dot / denom
      }
      // insert into the top list: rank by cos desc, ties by cell desc —
      // scanning cells ascending, >= displaces the earlier (smaller) id
      var p = if (filled < k) filled else -1
      var q = (if (filled < k) filled else k) - 1
      while (q >= 0 && (cos > topCos(q) ||
          (cos == topCos(q) && c > topCell(q)))) {
        p = q
        q -= 1
      }
      if (p >= 0) {
        var m = math.min(filled, k - 1)
        while (m > p) { topCos(m) = topCos(m - 1); topCell(m) = topCell(m - 1); m -= 1 }
        topCos(p) = cos
        topCell(p) = c
        if (filled < k) filled += 1
      }
      c += 1
    }
    new GenericArrayData(topCell.take(filled).map(Int.box))
  }
}
