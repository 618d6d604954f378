package graft.stream

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.model.{ChangeEvent, Schemas}

/** Streaming analytics over the WAL beyond the CDC apply itself:
  * watermarked event-time aggregation and custom keyed state — the
  * `readStream → transform → writeStream` surface of the engine
  * (capability row "Stream" in SURVEY.md §1.1).
  */
object StreamOps {

  /** Change-event stream from a WAL directory. */
  def walStream(spark: SparkSession, walDir: String, maxFilesPerTrigger: Int = 4): DataFrame =
    spark.readStream
      .schema(Schemas.changeEvent)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(walDir)

  /** Event-time windowed op counts with a watermark: how many I/U/D per
    * tumbling window, late events beyond the watermark dropped.
    */
  def windowedOpCounts(events: DataFrame, windowDur: String = "1 minute",
                       watermark: String = "2 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowDur), col("op"))
      .agg(count(lit(1)).as("n"), max(col("lsn")).as("max_lsn"))
      .select(col("window.start").as("window_start"), col("op"), col("n"), col("max_lsn"))

  /** Per-conversation running state via mapGroupsWithState: events seen,
    * highest turn observed, last LSN — the typed custom-state path
    * (`KeyValueGroupedDataset.mapGroupsWithState`).
    */
  final case class ConvState(conv_id: String, events: Long, maxTurn: Int, lastLsn: Long)

  def conversationState(events: Dataset[ChangeEvent]): Dataset[ConvState] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.conv_id)
      .mapGroupsWithState[ConvState, ConvState](GroupStateTimeout.NoTimeout()) {
        (key: String, it: Iterator[ChangeEvent], state: GroupState[ConvState]) =>
          var s = state.getOption.getOrElse(ConvState(key, 0L, -1, -1L))
          it.foreach { e =>
            s = ConvState(key, s.events + 1, math.max(s.maxTurn, e.turn_idx),
              math.max(s.lastLsn, e.lsn))
          }
          state.update(s)
          s
      }
  }
}
