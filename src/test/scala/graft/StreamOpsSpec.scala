package graft

import org.apache.spark.sql.streaming.OutputMode
import graft.gen.WalGen
import graft.model.ChangeEvent
import graft.stream.StreamOps

class StreamOpsSpec extends SparkSpec {
  import spark.implicits._

  test("watermarked windowed op counts over the WAL stream match batch") {
    val dir = tmpDir("sw")
    val cfg = WalGen.Config(numEvents = 6000, numConvs = 60)
    try {
      WalGen.writeWal(spark, s"$dir/wal", cfg, numChunks = 3)
      // 1 file per trigger → the watermark advances BETWEEN micro-batches,
      // finalizing earlier windows (append mode emits nothing otherwise)
      val q = StreamOps.windowedOpCounts(StreamOps.walStream(spark, s"$dir/wal", maxFilesPerTrigger = 1))
        .writeStream.outputMode(OutputMode.Append)
        .format("memory").queryName("wincounts")
        .option("checkpointLocation", s"$dir/cp")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      // Append mode only emits FINALIZED windows (watermark passed). The
      // last windows stay pending — compare emitted ones against batch.
      val got = spark.table("wincounts")
        .select("window_start", "op", "n").collect()
        .map(r => (r.getTimestamp(0), r.getString(1)) -> r.getLong(2)).toMap
      assert(got.nonEmpty, "no finalized windows emitted")
      val batch = StreamOps.windowedOpCounts(
        spark.read.schema(graft.model.Schemas.changeEvent).parquet(s"$dir/wal"))
        .collect().map(r => (r.getTimestamp(0), r.getString(1)) -> r.getLong(2)).toMap
      got.foreach { case (k, n) => assert(batch(k) == n, s"window $k: $n vs ${batch(k)}") }
    } finally rmrf(dir)
  }

  test("mapGroupsWithState tracks per-conversation running state") {
    val dir = tmpDir("st")
    val cfg = WalGen.Config(numEvents = 3000, numConvs = 25)
    try {
      WalGen.writeWal(spark, s"$dir/wal", cfg, numChunks = 2)
      val events = StreamOps.walStream(spark, s"$dir/wal").as[ChangeEvent]
      val q = StreamOps.conversationState(events)
        .writeStream.outputMode(OutputMode.Update)
        .format("memory").queryName("convstate")
        .option("checkpointLocation", s"$dir/cp")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      // latest state per conversation (Update mode appends every change)
      val latest = spark.table("convstate")
        .groupBy("conv_id")
        .agg(org.apache.spark.sql.functions.max("events").as("events"),
          org.apache.spark.sql.functions.max("maxTurn").as("maxTurn"),
          org.apache.spark.sql.functions.max("lastLsn").as("lastLsn"))
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getInt(2), r.getLong(3))).toMap
      // driver-side expectation from the deterministic generator
      val expected = (0L until cfg.numEvents).map(WalGen.eventAt(_, cfg))
        .groupBy(_.conv_id).map { case (c, es) =>
          c -> (es.size.toLong, es.map(_.turn_idx).max, es.map(_.lsn).max) }
      assert(latest.keySet == expected.keySet)
      expected.foreach { case (c, e) => assert(latest(c) == e, s"state mismatch for $c") }
    } finally rmrf(dir)
  }
}
