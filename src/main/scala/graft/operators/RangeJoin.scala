package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval range join — `left.point BETWEEN right.lo AND
  * right.hi` (plus optional equi-keys) — the windowed-lookup operator
  * (events inside a campaign window, readings inside an outage,
  * clicks within an hour of a purchase) that Spark has no native
  * operator for: a raw `l.key = r.key AND l.p >= r.lo AND l.p <= r.hi`
  * join planned today is either a BroadcastNestedLoopJoin (right side
  * must fit in memory) or, with equi-keys, an equi-join that degrades
  * into per-key cross products whenever keys repeat — both collapse at
  * 100 TB.
  *
  * Composed scale-first instead: quantize the point domain into
  * fixed-width buckets. Each interval is replicated to every bucket it
  * overlaps (`sequence(floorDiv(lo), floorDiv(hi))` + explode); each
  * point maps to exactly ONE bucket — so the join becomes a plain
  * equi-join on (keys…, bucket) followed by the exact range predicate
  * as a post-filter, and no output pair can be produced twice. Plan
  * shape: one hash Exchange per side, SortMergeJoin/ShuffledHashJoin,
  * zero nested loops (PlanAuditSpec asserts it). Cost model: the right
  * side is amplified by `avg(span)/bucketWidth + 1` rows — pick
  * `bucketWidth` near the typical interval span so amplification stays
  * ~2× while buckets stay selective. Skewed hot buckets are ordinary
  * join skew, handled by AQE's skew-join split (never the case for the
  * nested-loop fallback, which AQE cannot touch).
  */
object RangeJoin {

  /** Join each row of `points` to every row of `intervals` with equal
    * `keyCols` and `points.pointCol ∈ [loCol, hiCol]` (inclusive both
    * ends; half-open with `inclusiveHi = false`). `pointCol`, `loCol`,
    * `hiCol` must be integral (cast timestamps to epoch micros first);
    * non-key column names must be disjoint across the two inputs.
    * Inner-join semantics: points matching no interval are dropped.
    */
  def pointInInterval(
      points: DataFrame,
      intervals: DataFrame,
      keyCols: Seq[String],
      pointCol: String,
      loCol: String,
      hiCol: String,
      bucketWidth: Long,
      inclusiveHi: Boolean = true): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive: $bucketWidth")
    // floorDiv staged in pure integer arithmetic (pmod is sign-safe for
    // negative epochs; `DIV` keeps LongType — the Column `/` operator
    // is double division, which loses exactness above 2^53, i.e. for
    // any epoch-nanos domain)
    def withBucket(df: DataFrame, src: String, out: String): DataFrame =
      df.withColumn(out, col(src) - pmod(col(src), lit(bucketWidth)))
        .withColumn(out, expr(s"`$out` DIV ${bucketWidth}L"))
    val taggedPoints = withBucket(points, pointCol, "_bk")
    val taggedIntervals =
      withBucket(withBucket(intervals, loCol, "_lob"), hiCol, "_hib")
        .withColumn("_bk", explode(sequence(col("_lob"), col("_hib"))))
        .drop("_lob", "_hib")
    val upperOk =
      if (inclusiveHi) col(pointCol) <= col(hiCol)
      else col(pointCol) < col(hiCol)
    taggedPoints
      .join(taggedIntervals, (keyCols :+ "_bk").toIndexedSeq)
      .filter(col(pointCol) >= col(loCol) && upperOk)
      .drop("_bk")
  }
}
