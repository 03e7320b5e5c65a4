package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EventsSpec extends SparkSpec {

  test("sessionize: 30-min gap rule with crafted timeline") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, "2024-01-01 00:00:00", 7L),
      (2L, "2024-01-01 00:10:00", 7L), // +10min — same session
      (3L, "2024-01-01 00:50:00", 7L), // +40min — new session
      (4L, "2024-01-01 01:10:00", 7L), // +20min — same session
      (5L, "2024-01-01 00:05:00", 9L)  // other user
    ).toDF("event_id", "ts_s", "user_id")
      .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")
    val out = Events.sessionize(df).orderBy("event_id")
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 2L, 5L -> 1L))
  }

  test("extractProps/propsAgg: JSON payload parsed and aggregated") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, "click", """{"k": 10}"""),
      (2L, "click", """{"k": 20}"""),
      (3L, "view", """{"k": 7}"""),
      (4L, "view", "not json")
    ).toDF("event_id", "event_type", "props")
    val ext = Events.extractProps(df)
    assert(ext.filter(col("event_id") === 1L).head().getAs[Int]("k") == 10)
    assert(ext.filter(col("event_id") === 4L).head().isNullAt(
      ext.columns.indexOf("k"))) // malformed -> null, not a crash
    val agg = Events.propsAgg(df).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(agg("click") == (2L, 15.0))
    assert(agg("view")._1 == 2L)
  }

  test("sessionize: exact-boundary gap (== gap) stays in session") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, "2024-01-01 00:00:00", 1L),
      (2L, "2024-01-01 00:30:00", 1L) // exactly 1800s: not > gap
    ).toDF("event_id", "ts_s", "user_id")
      .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")
    val out = Events.sessionize(df).select("session_idx")
      .collect().map(_.getLong(0))
    assert(out.toSet == Set(1L))
  }
}
