package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream relational operators over the `events` table shape
  * (event_id, ts, user_id, event_type, value, props).
  *
  * Scale notes: sessionize is ONE shuffle (hash-partition by user_id) +
  * an in-partition sort; both window functions share the same
  * (partition, order) spec so Catalyst evaluates them in a single
  * Window operator — no second exchange. At 100 TB a skewed power-user
  * key would dominate its partition; AQE skew handling does not apply
  * inside window functions, so pathological keys need a per-user
  * time-bucket pre-split (documented, not needed at test scale).
  */
object Events {

  /** Parse the JSON `props` payload into typed columns (`from_json`
    * with an explicit DDL schema — no inference pass, fixed output
    * shape at any scale). */
  def extractProps(events: DataFrame, ddl: String = "k INT",
      propsCol: String = "props"): DataFrame = {
    val parsed = events.withColumn("_p",
      from_json(col(propsCol), org.apache.spark.sql.types.StructType.fromDDL(ddl)))
    org.apache.spark.sql.types.StructType.fromDDL(ddl).fieldNames
      .foldLeft(parsed)((d, f) => d.withColumn(f, col(s"_p.$f")))
      .drop("_p")
  }

  /** Per-event-type stats over the extracted JSON metric: one
    * partial-aggregated shuffle; avg rounded (merge-order float). */
  def propsAgg(events: DataFrame): DataFrame =
    extractProps(events)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(avg(col("k")), 6).as("avg_k"))

  /** Gap-based sessionization: a new session starts when the gap to the
    * user's previous event exceeds `gapMinutes`. Emits a per-user
    * 1-based `session_idx` via a running sum over session starts —
    * exactly SQL-window-expressible, so oracle-checkable. */
  def sessionize(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val gapSec = col("ts").cast("long") -
      lag(col("ts"), 1).over(byUser).cast("long")
    val isNew = when(gapSec.isNull || gapSec > gapMinutes * 60L, 1).otherwise(0)
    events
      .withColumn("is_new", isNew)
      .withColumn("session_idx", sum(col("is_new")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select("event_id", "user_id", "ts", "session_idx")
  }
}
