package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SortedIntersectCountSpec extends SparkSpec {

  test("equals size(array_intersect) on random sorted-distinct arrays") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7)
    def randSet(): Seq[String] = {
      val n = rnd.nextInt(12)
      (0 until n).map(_ => s"w${rnd.nextInt(20)}").distinct.sorted
    }
    val df = (1 to 300).map(i => (i.toLong, randSet(), randSet()))
      .toDF("id", "a", "b")
    val rows = df.select(col("id"),
        SortedIntersectCount(col("a"), col("b")).as("merge"),
        size(array_intersect(col("a"), col("b"))).as("builtin"))
      .collect()
    rows.foreach { r =>
      assert(r.getInt(1) == r.getInt(2), s"row ${r.getLong(0)}")
    }
  }

  test("empty sides, identical sides, disjoint sides, and null array") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, Seq("a", "b", "c"), Seq("a", "b", "c")),
      (2L, Seq.empty[String], Seq("a")),
      (3L, Seq("a", "b"), Seq("c", "d")),
      (4L, Seq("a", "b", "d"), Seq("b", "c", "d"))
    ).toDF("id", "a", "b")
    val got = df.select(col("id"),
        SortedIntersectCount(col("a"), col("b")).as("c"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == Map(1L -> 3, 2L -> 0, 3L -> 0, 4L -> 2))
    // null input array → null result (BinaryExpression null semantics)
    val withNull = Seq((1L, Seq("a"))).toDF("id", "a")
      .select(SortedIntersectCount(col("a"),
        lit(null).cast("array<string>")).as("c"))
      .head()
    assert(withNull.isNullAt(0))
  }

  test("interpreted eval matches codegen (static helper is the single " +
      "implementation)") {
    val s = spark
    import s.implicits._
    val df = Seq((Seq("a", "c", "e"), Seq("b", "c", "d", "e")))
      .toDF("a", "b")
    val viaCodegen = df
      .select(SortedIntersectCount(col("a"), col("b"))).head().getInt(0)
    // force interpreted path
    val expr = SortedIntersectCount(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq("a", "c", "e"),
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.StringType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq("b", "c", "d", "e"),
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.StringType)))
    assert(expr.eval(null) == viaCodegen && viaCodegen == 2)
  }
}
