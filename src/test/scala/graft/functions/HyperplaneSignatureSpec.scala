package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HyperplaneSignatureSpec extends SparkSpec {

  private def sigOf(v: Seq[Double], tables: Int = 8, bits: Int = 16,
      seed: Long = 42L): Seq[Long] = {
    val s = spark
    import s.implicits._
    Seq(Tuple1(v)).toDF("e")
      .select(HyperplaneSignature(col("e"), tables, bits, seed).as("s"))
      .head().getSeq[Long](0)
  }

  private val rng = new scala.util.Random(7)
  private val base = Array.fill(64)(rng.nextGaussian())

  test("deterministic, one key per table, tables disjoint in key space") {
    val a = sigOf(base.toSeq)
    assert(a == sigOf(base.toSeq))
    assert(a.length == 8)
    // high bits carry the table index: no cross-table key collisions
    assert(a.map(_ >>> 48) == (0L until 8L))
  }

  test("sign bits are scale-invariant (no normalization pass needed)") {
    assert(sigOf(base.toSeq) == sigOf(base.map(_ * 37.5).toSeq))
  }

  test("near-identical vectors share a band key; random vectors do not") {
    val near = base.clone(); near(0) += 1e-4
    assert(sigOf(base.toSeq).intersect(sigOf(near.toSeq)).nonEmpty)
    val other = Array.fill(64)(rng.nextGaussian())
    assert(sigOf(base.toSeq).intersect(sigOf(other.toSeq)).isEmpty)
  }

  test("different seeds give different hyperplanes") {
    assert(sigOf(base.toSeq, seed = 42L) != sigOf(base.toSeq, seed = 43L))
  }

  test("codegen path matches the static helper (and interpreted eval)") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val df = Seq(Tuple1(base.toSeq)).toDF("e")
    val viaPlan = df.select(
      HyperplaneSignature(col("e"), 4, 12, 42L).as("s"))
      .head().getSeq[Long](0)
    val direct = HyperplaneSignature
      .compute(new GenericArrayData(base), 4, 12, 42L)
      .toLongArray().toSeq
    assert(viaPlan == direct)
    // null elements contribute 0 to the dot product (still keys)
    val withNull = df.select(
      HyperplaneSignature(
        array(lit(1.0), lit(null).cast("double"), lit(-2.0)), 2, 8, 1L)
        .as("s")).head().getSeq[Long](0)
    assert(withNull.length == 2)
  }
}
