package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.stream.StreamingDedup

/** Stateful streaming exact-dedup: first-seen doc per digest survives,
  * within and across micro-batches (state store), deterministic winner.
  */
class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  test("streaming exact dedup: first arrival wins within and across micro-batches") {
    val dir = tmpDir("sdedup")
    try {
      implicit val sc: org.apache.spark.sql.SQLContext = spark.sqlContext
      val input = MemoryStream[(Long, String)]
      val out = StreamingDedup.dropExactDuplicates(
        input.toDF().toDF("doc_id", "text"), "text", "doc_id")
      val q = out.writeStream
        .format("memory").queryName("sdedup_out").outputMode("append")
        .option("checkpointLocation", s"$dir/cp")
        .start()
      try {
        // batch 1: an in-batch duplicate pair (7, 3 share text) + a distinct
        input.addData((3L, "alpha beta"), (7L, "alpha beta"), (10L, "gamma"))
        q.processAllAvailable()
        val b1 = spark.table("sdedup_out").collect()
          .map(r => r.getLong(1) -> r.getString(2)).toMap
        assert(b1.keySet == Set(3L, 10L), s"in-batch dup must keep min id: $b1")

        // batch 2: cross-batch duplicates (both texts already seen) + one new
        input.addData((99L, "alpha beta"), (100L, "gamma"), (11L, "delta"))
        q.processAllAvailable()
        val b2 = spark.table("sdedup_out").collect().map(_.getLong(1)).toSet
        assert(b2 == Set(3L, 10L, 11L),
          s"cross-batch duplicates must be suppressed by the state store: $b2")

        // batch 3: replayed copy of the very first doc — still suppressed
        input.addData((3L, "alpha beta"))
        q.processAllAvailable()
        assert(spark.table("sdedup_out").count() == 3)
      } finally q.stop()
    } finally rmrf(dir)
  }

  test("streaming dedup state runs on the RocksDB state store (the 10^10-doc provider)") {
    // The HDFS-backed default keeps state on the JVM heap; at 10^10
    // distinct digests the production choice is RocksDB. Same semantics,
    // different provider — this pins that the op is provider-agnostic.
    val dir = tmpDir("sdedup-rocks")
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    try {
      spark.conf.set(key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      implicit val sc: org.apache.spark.sql.SQLContext = spark.sqlContext
      val input = MemoryStream[(Long, String)]
      val out = StreamingDedup.dropExactDuplicates(
        input.toDF().toDF("doc_id", "text"), "text", "doc_id")
      val q = out.writeStream
        .format("memory").queryName("sdedup_rocks_out").outputMode("append")
        .option("checkpointLocation", s"$dir/cp")
        .start()
      try {
        input.addData((1L, "x y"), (2L, "x y"))
        q.processAllAvailable()
        input.addData((3L, "x y"), (4L, "fresh"))
        q.processAllAvailable()
        val ids = spark.table("sdedup_rocks_out").collect().map(_.getLong(1)).toSet
        assert(ids == Set(1L, 4L), s"RocksDB-backed dedup wrong: $ids")
      } finally q.stop()
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
      rmrf(dir)
    }
  }
}
