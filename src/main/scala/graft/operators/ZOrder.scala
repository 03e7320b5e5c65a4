package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout — multi-dimension clustering for
  * scan pruning. Sorting a table by ONE column gives parquet row-group
  * min/max skipping on that column only; interleaving the bits of two
  * columns and range-partitioning + sorting by the interleaved value
  * gives useful min/max locality on BOTH columns at once, so filters
  * on either dimension (or both) skip most files. This is the layout
  * story at 100 TB: the cluster pass is one range shuffle at write
  * time, and every later query pays proportionally fewer bytes.
  *
  * The interleave is the classic shift-mask bit spread (no loops, no
  * UDF, no custom expression): four shift-OR-mask steps widen a 16-bit
  * value so its bits occupy even positions of a 32-bit lane, then
  * z = spread(a) | spread(b) << 1. Pure `Column` arithmetic — it stays
  * inside whole-stage codegen, and the DuckDB oracle states the same
  * four steps with the same masks, so the value is cross-engine exact.
  */
object ZOrder {

  private val Masks = Seq(
    8 -> 0x00FF00FFL,
    4 -> 0x0F0F0F0FL,
    2 -> 0x33333333L,
    1 -> 0x55555555L)

  /** Spread the low 16 bits of `x` over even bit positions 0,2,..,30. */
  private[operators] def spread16(x: Column): Column =
    Masks.foldLeft(x.cast("long").bitwiseAND(lit(0xFFFFL))) {
      case (v, (shift, mask)) =>
        v.bitwiseOR(shiftleft(v, shift)).bitwiseAND(lit(mask))
    }

  /** 32-bit Morton code of two 16-bit dimensions: a's bits at even
    * positions, b's at odd. Values outside [0, 65535] are masked to
    * their low 16 bits — quantize first (see [[quantize16]]). */
  def zValue(a: Column, b: Column): Column =
    spread16(a).bitwiseOR(shiftleft(spread16(b), 1))

  /** Rank-free linear quantizer onto the 16-bit grid: maps `c` from
    * [lo, hi] to [0, 65535], clamping outliers. Pick lo/hi from column
    * stats (an approx-quantile pass) — exact ranks would be another
    * corpus shuffle for no pruning benefit. */
  def quantize16(c: Column, lo: Double, hi: Double): Column = {
    val scaled = (c.cast("double") - lit(lo)) / lit(hi - lo) * lit(65535.0)
    least(greatest(floor(scaled), lit(0.0)), lit(65535.0)).cast("long")
  }

  /** Cluster `df` for writing: compute the z-value of the two (already
    * 16-bit) dimension columns, range-partition into `numFiles` splits
    * and sort within each — one shuffle, then each output file covers
    * a compact z-range = a small rectangle in (a, b) space, which is
    * what makes min/max skipping effective on both columns. */
  def layout(
      df: DataFrame,
      colA: String,
      colB: String,
      numFiles: Int): DataFrame = {
    val z = df.withColumn("zval", zValue(col(colA), col(colB)))
    z.repartitionByRange(numFiles, col("zval"))
      .sortWithinPartitions("zval")
  }
}
