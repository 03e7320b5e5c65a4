package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured-Streaming-first transforms. Each function is written
  * against the unified DataFrame API so the SAME code path serves batch
  * (driver verify/bench, DuckDB-oracle-checkable) and `readStream`
  * sources (ScalaTest drives it with a MemoryStream).
  */
object StreamOps {

  /** Event-time tumbling-window aggregation per event_type: event count
    * and (6dp-rounded) value sum. Pass `watermark` when the input is a
    * stream — late data beyond it is dropped and window state is
    * evicted, which is what bounds state size on an unbounded stream.
    *
    * Scale notes: one shuffle keyed by (window, event_type) with
    * map-side partial aggregation; the double sum is rounded because
    * partial-agg merge order is nondeterministic across partitions. */
  def windowedEventCounts(
      events: DataFrame,
      windowDur: String = "1 hour",
      watermark: Option[String] = None): DataFrame = {
    val in = watermark.fold(events)(w => events.withWatermark("ts", w))
    in.groupBy(window(col("ts"), windowDur), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 6).as("total_value"))
      .select(
        col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("event_type"), col("n_events"), col("total_value"))
  }
}
