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

  test("saltedJoin: bit-identical to the plain join on a hot key") {
    val s = spark
    import s.implicits._
    // 5k rows on hot key 1, plus a tail; dim covers keys 1..40 — and
    // fact key 999 has NO dim match (left-join fact-side safety)
    val fact = ((1 to 5000).map(i => (1L, i)) ++
      (1 to 200).map(i => ((i % 40 + 1).toLong, i)) ++
      Seq((999L, -1))).toDF("k", "v")
    val dim = (1 to 40).map(i => (i.toLong, s"d$i")).toDF("k", "name")
    def sorted(df: org.apache.spark.sql.DataFrame) =
      df.select("k", "v", "name").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).sorted.toSeq
    assert(sorted(Skew.saltedJoin(fact, dim, Seq("k"), saltBuckets = 8))
      == sorted(fact.join(dim, Seq("k"))))
    // left join: the unmatched fact row survives exactly once
    val left = Skew.saltedJoin(fact, dim, Seq("k"), saltBuckets = 8, "left")
    assert(left.filter(col("k") === 999L).count() == 1)
    assert(left.count() == fact.join(dim, Seq("k"), "left").count())
  }

  test("saltedJoin: shuffles on the composite (key, salt) when the dim " +
      "side cannot broadcast") {
    val s = spark
    import s.implicits._
    val fact = (1 to 1000).map(i => (1L, i)).toDF("k", "v")
    val dim = (1 to 40).map(i => (i.toLong, s"d$i")).toDF("k", "name")
    val saved = spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val p = Skew.saltedJoin(fact, dim, Seq("k"), saltBuckets = 8)
        .queryExecution.executedPlan.toString
      // both sides exchange on (k, _salt) — the hot key k=1 is spread
      // over 8 reducer keys instead of collapsing onto one
      val composite = "hashpartitioning\\(k#\\d+L?, _salt#\\d+".r
      assert(composite.findAllIn(p).length == 2,
        s"expected 2 composite-key exchanges:\n${p.take(1500)}")
    } finally saved match {
      case Some(v) =>
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", v)
      case None =>
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("saltedJoin: rejects join types that multiply unmatched dim rows") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, 1)).toDF("k", "v")
    val dim = Seq((1L, "d")).toDF("k", "name")
    intercept[IllegalArgumentException] {
      Skew.saltedJoin(df, dim, Seq("k"), 8, "right")
    }
    intercept[IllegalArgumentException] {
      Skew.saltedJoin(df, dim, Seq("k"), 8, "full_outer")
    }
  }
}
