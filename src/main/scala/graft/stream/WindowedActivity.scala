package graft.stream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-time windowed conversation-activity aggregation with a watermark —
  * the streaming-aggregation face of the engine (north-star: "watermarks +
  * windowed aggs"). Per (event-time window, conv_id): turns seen, max LSN,
  * tool-call count. Append mode: a window is emitted exactly once, when the
  * watermark passes its end; events later than the watermark are dropped by
  * Spark's state store (bounded state at 10^10 events — the watermark IS
  * the state-size contract).
  *
  * Reference analogue: owid-etl has no event-time semantics at all (batch
  * mtime polling); this is the Spark-native upgrade the CDC tail enables.
  */
object WindowedActivity {

  /** `events` must carry (conv_id, turn_idx, op, lsn, tool, ts). Returns
    * the windowed aggregate stream (append-mode-ready).
    */
  def perConversation(events: DataFrame,
                      windowLen: String = "10 minutes",
                      lateness: String = "5 minutes"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), windowLen), col("conv_id"))
      .agg(
        count(lit(1)).as("n_changes"),
        max(col("lsn")).as("max_lsn"),
        count(when(col("tool").isNotNull, lit(1))).as("n_tool_changes"))
      .select(
        col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("conv_id"), col("n_changes"), col("max_lsn"), col("n_tool_changes"))
}
