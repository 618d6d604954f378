package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.stream.WindowedActivity

/** Watermarked event-time windowed aggregation: windows emit exactly once
  * when the watermark passes, and events later than the watermark are
  * dropped (bounded state).
  */
class WindowedActivitySpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Int): Timestamp = new Timestamp(min * 60000L) // epoch-aligned: window boundaries at exact 10-min marks

  test("windows close on watermark; late events beyond the lateness bound are dropped") {
    val dir = tmpDir("wact")
    try {
      implicit val sc: org.apache.spark.sql.SQLContext = spark.sqlContext
      val input = MemoryStream[(String, Int, String, Long, String, Timestamp)]
      val df = input.toDF().toDF("conv_id", "turn_idx", "op", "lsn", "tool", "ts")
      val out = WindowedActivity.perConversation(df,
        windowLen = "10 minutes", lateness = "5 minutes")
      val q = out.writeStream
        .format("memory").queryName("wact_out").outputMode("append")
        .option("checkpointLocation", s"$dir/cp")
        .start()
      try {
        // window [0,10): 2 changes for c1 (one with a tool), 1 for c2
        input.addData(
          ("c1", 0, "I", 1L, null, ts(1)),
          ("c1", 1, "I", 2L, "search", ts(4)),
          ("c2", 0, "I", 3L, null, ts(7)))
        q.processAllAvailable()
        // nothing emitted yet — the watermark has not passed minute 10
        assert(spark.table("wact_out").count() == 0)

        // advance event time far past window end + lateness → [0,10) closes
        input.addData(("c1", 2, "U", 4L, null, ts(21)))
        q.processAllAvailable()
        val closed = spark.table("wact_out").collect()
          .map(r => r.getString(2) -> (r.getLong(3), r.getLong(4), r.getLong(5))).toMap
        assert(closed("c1") == ((2L, 2L, 1L)), s"c1 window wrong: $closed")
        assert(closed("c2") == ((1L, 3L, 0L)), s"c2 window wrong: $closed")

        // a straggler for the CLOSED window (event time 3, watermark ~16):
        // dropped by the watermark — the emitted window is immutable
        input.addData(("c1", 9, "U", 99L, null, ts(3)))
        // push the watermark further so any (incorrect) re-aggregation would flush
        input.addData(("c1", 3, "U", 5L, null, ts(40)))
        q.processAllAvailable()
        val after = spark.table("wact_out").collect()
          .filter(r => r.getString(2) == "c1" && r.getTimestamp(0).equals(ts(0)))
        assert(after.length == 1 && after(0).getLong(3) == 2L,
          s"late event must not reopen or double-emit the closed window: ${after.mkString(",")}")
      } finally q.stop()
    } finally rmrf(dir)
  }
}
