package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {

  test("saltedAgg: count matches unsalted groupBy on a skewed key") {
    val s = spark
    import s.implicits._
    // 10k rows on one hot key, trickle on others
    val rows = (1 to 10000).map(i => ("hot", i)) ++
      (1 to 57).map(i => (s"cold${i % 3}", i))
    val df = rows.toDF("k", "v")
    val salted = Skew.saltedAgg(df, Seq("k"),
      partial = count(lit(1)), merge = p => sum(p), outputCol = "n")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val plain = df.groupBy("k").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == plain)
  }

  test("saltedCollectSet: same distinct values as plain collect_set") {
    val s = spark
    import s.implicits._
    val df = (1 to 2000).map(i => ("hot", i % 37)).toDF("k", "v")
    val out = Skew.saltedCollectSet(df, Seq("k"), "v")
      .head().getSeq[Int](1).toSet
    assert(out == (0 until 37).toSet)
  }
}
