package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Morton z-value arithmetic + the clustered-layout property. */
class ZOrderSpec extends SparkSpec {

  /** Bit-by-bit reference interleave (the definition, not the fast
    * spread — the operator must agree with this). */
  private def mortonRef(a: Int, b: Int): Long =
    (0 until 16).foldLeft(0L) { (acc, i) =>
      acc |
        (((a >> i) & 1).toLong << (2 * i)) |
        (((b >> i) & 1).toLong << (2 * i + 1))
    }

  test("zValue matches the bit-by-bit definition on known points") {
    val s = spark
    import s.implicits._
    val pts = Seq((3, 1), (0, 0), (65535, 0), (0, 65535), (65535, 65535),
      (1, 0), (0, 1), (12345, 54321), (54321, 12345))
    val got = pts.toDF("a", "b")
      .select(ZOrder.zValue(col("a"), col("b")).as("z"))
      .collect().map(_.getLong(0)).toSeq
    assert(got === pts.map { case (a, b) => mortonRef(a, b) })
    // spot values: z(3,1) = 0b0111; x-only fills even bits, y-only odd
    assert(mortonRef(3, 1) === 7L)
    assert(mortonRef(65535, 0) === 0x55555555L)
    assert(mortonRef(0, 65535) === 0xAAAAAAAAL)
  }

  test("zValue agrees with the definition on random 16-bit pairs") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(42)
    val pts = Seq.fill(200)((rnd.nextInt(65536), rnd.nextInt(65536)))
    val got = pts.toDF("a", "b")
      .select(ZOrder.zValue(col("a"), col("b")).as("z"))
      .collect().map(_.getLong(0)).toSeq
    assert(got === pts.map { case (a, b) => mortonRef(a, b) })
  }

  test("quantize16 maps [lo, hi] to the 16-bit grid and clamps") {
    val s = spark
    import s.implicits._
    val got = Seq(-10.0, 0.0, 250.0, 500.0, 9999.0)
      .toDF("v")
      .select(ZOrder.quantize16(col("v"), 0.0, 500.0).as("q"))
      .collect().map(_.getLong(0)).toSeq
    assert(got(0) === 0L)      // below lo clamps
    assert(got(1) === 0L)
    assert(got(2) === 32767L)  // floor(250/500 * 65535)
    assert(got(3) === 65535L)
    assert(got(4) === 65535L)  // above hi clamps
  }

  test("layout: partitions carry sorted, non-overlapping z-ranges") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7)
    val df = Seq.fill(2000)((rnd.nextInt(65536), rnd.nextInt(65536)))
      .toDF("x", "y")
    val parts = ZOrder.layout(df, "x", "y", numFiles = 4)
      .select("zval").rdd
      .mapPartitionsWithIndex((i, it) =>
        Iterator((i, it.map(_.getLong(0)).toVector)))
      .collect().sortBy(_._1).map(_._2).filter(_.nonEmpty)
    assert(parts.length > 1)
    parts.foreach(p => assert(p === p.sorted, "within-partition sort"))
    parts.sliding(2).foreach { pair =>
      if (pair.length == 2)
        assert(pair(0).last <= pair(1).head,
          "range partitions must be ordered and disjoint")
    }
    // the layout pass only reorders — no rows gained or lost
    assert(parts.map(_.size).sum === 2000)
  }
}
