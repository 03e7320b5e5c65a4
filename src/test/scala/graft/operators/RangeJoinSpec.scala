package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {

  private def fixture = {
    val s = spark
    import s.implicits._
    val points = Seq(
      (1L, 7L, 5L),    // inside A
      (2L, 7L, 10L),   // on A's hi boundary (inclusive) and B's lo
      (3L, 7L, 25L),   // inside no interval
      (4L, 7L, -3L),   // inside the negative-domain interval C
      (5L, 9L, 5L),    // right value, wrong key
      (6L, 7L, 107L)   // inside the bucket-spanning interval D
    ).toDF("point_id", "user_id", "p")
    val intervals = Seq(
      (10L, 7L, 0L, 10L),    // A
      (11L, 7L, 10L, 20L),   // B — shares boundary 10 with A
      (12L, 7L, -8L, -1L),   // C — negative domain
      (13L, 7L, 90L, 130L)   // D — spans many width-4 buckets
    ).toDF("iv_id", "user_id", "lo", "hi")
    (points, intervals)
  }

  test("pointInInterval: inclusive bounds, keys respected, negative domain, multi-bucket spans") {
    val (points, intervals) = fixture
    val out = RangeJoin.pointInInterval(points, intervals, Seq("user_id"),
      "p", "lo", "hi", bucketWidth = 4L)
      .select("point_id", "iv_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((1L, 10L), (2L, 10L), (2L, 11L), (4L, 12L), (6L, 13L)))
  }

  test("pointInInterval: half-open upper bound drops the boundary match") {
    val (points, intervals) = fixture
    val out = RangeJoin.pointInInterval(points, intervals, Seq("user_id"),
      "p", "lo", "hi", bucketWidth = 4L, inclusiveHi = false)
      .select("point_id", "iv_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((1L, 10L), (2L, 11L), (4L, 12L), (6L, 13L)))
  }

  test("pointInInterval: no duplicate pairs regardless of bucket width") {
    val (points, intervals) = fixture
    for (w <- Seq(1L, 3L, 7L, 1000L)) {
      val out = RangeJoin.pointInInterval(points, intervals, Seq("user_id"),
        "p", "lo", "hi", bucketWidth = w).select("point_id", "iv_id")
      assert(out.count() == out.distinct().count(), s"width $w duplicates")
      assert(out.count() == 5, s"width $w wrong row count")
    }
  }

  test("pointInInterval plans an equi-join, never a nested loop") {
    val (points, intervals) = fixture
    val saved = spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val p = RangeJoin.pointInInterval(points, intervals, Seq("user_id"),
        "p", "lo", "hi", bucketWidth = 4L)
        .queryExecution.executedPlan.toString
      assert(!p.contains("BroadcastNestedLoopJoin") &&
        !p.contains("CartesianProduct"), p.take(800))
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
        p.take(800))
      // exactly one shuffle per side — the equi-join's own
      assert("Exchange hashpartitioning".r.findAllIn(p).length == 2,
        p.take(800))
    } finally saved match {
      case Some(v) => spark.conf.set("spark.sql.autoBroadcastJoinThreshold", v)
      case None => spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }
}
