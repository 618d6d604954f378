package graft.tools

import org.apache.spark.sql.SparkSession
import graft.gen.WalGen
import graft.lake.{FileEntry, LakeTable}
import graft.merge.CdcMerge
import graft.model.Schemas

/** Steady-state soak of the LAKE-BACKED dedup maintenance
  * ([[graft.stream.DedupMaintenance.startLake]]): a sustained CDC stream
  * (Zipf-hot conversations, duplicate deliveries, deletes) is applied
  * batch-by-batch while the maintenance loop follows the changelog,
  * refreshing the on-disk signature store and logging pairs.
  *
  * The claims under test, per window:
  *  - catch-up wall stays FLAT as the stream ages (first-third vs
  *    last-third mean) — refresh cost tracks the batch, not the corpus
  *    or stream age;
  *  - the store's delta tail and file count stay BOUNDED by the
  *    compaction cadence, never by stream age (the LSM invariant).
  *
  * Usage: runMain graft.tools.LakeMaintSoak [events] [batches]
  * Prints one JSON line.
  */
object LakeMaintSoak {

  def main(args: Array[String]): Unit = {
    val events = args.headOption.map(_.toLong).getOrElse(1000000L)
    val batches = args.lift(1).map(_.toInt).getOrElse(32)
    val spark = SparkSession.builder()
      .appName("graft-lake-maint-soak")
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.driver.memory", sys.env.getOrElse("SPARK_DRIVER_MEM", "24g"))
      .config("spark.hadoop.fs.file.impl", classOf[graft.util.FastLocalFileSystem].getName)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val work = java.nio.file.Files.createTempDirectory("lakemaintsoak").toString
    val cfg = WalGen.Config(numEvents = events,
      numConvs = math.max(100L, events / 100), maxTurns = 20)
    val table = LakeTable.create(spark, s"$work/t", Schemas.transcript, numBuckets = 16)
    val h = graft.stream.DedupMaintenance.startLake(table, "text", s"$work/pairs",
      s"$work/store", minJaccard = 0.8, pollMs = 50L, numPids = 256,
      compactEvery = 4)
    val walls = scala.collection.mutable.ArrayBuffer.empty[Double]
    val deltaTails = scala.collection.mutable.ArrayBuffer.empty[Int]
    val fileCounts = scala.collection.mutable.ArrayBuffer.empty[Int]
    try {
      // rounding boundaries, not a truncated fixed chunk: b*events/batches
      // covers EVERY requested event (a fixed events/batches chunk drops
      // the remainder while the JSON still reports the full count)
      (0 until batches).foreach { b =>
        CdcMerge.apply(table,
          WalGen.events(spark, cfg, b.toLong * events / batches,
            (b + 1).toLong * events / batches).toDF(), b.toLong)
        val target = table.currentVersion
        val t0 = System.nanoTime()
        val deadline = System.currentTimeMillis() + 600000
        while (h.processedVersion < target && h.failure.isEmpty &&
               System.currentTimeMillis() < deadline) Thread.sleep(20)
        h.failure.foreach(e => throw new IllegalStateException("maintenance died", e))
        require(h.processedVersion >= target, s"maintenance stalled at batch $b")
        walls += (System.nanoTime() - t0) / 1e9
        val m = h.store.bandStore.manifest
        deltaTails += m.files.count(_.kind == FileEntry.DELTA)
        fileCounts += m.files.size
      }
    } finally h.close()

    def third(xs: Seq[Double], which: Int): Double = {
      // fewer than 3 windows cannot support a first-vs-last-third
      // comparison — fall back to the whole-series mean rather than
      // printing a fake 0.00-vs-0.00 "flat" result
      val n = xs.size / 3
      val slice =
        if (n == 0) xs
        else if (which == 0) xs.take(n)
        else xs.takeRight(n)
      slice.sum / math.max(1, slice.size)
    }
    def pct(xs: Seq[Double], p: Double): Double = {
      val s = xs.sorted
      s(math.min(s.size - 1, (p * s.size).toInt))
    }
    val storeRows = h.store.snapshot().count()
    val liveRows = table.snapshot().count()
    // an all-empty pair log has partition dirs but no data files — reads
    // as zero, not as a schema-inference error
    val pairRows = scala.util.Try(spark.read.parquet(s"$work/pairs").count()).getOrElse(0L)
    println(
      f"""{"metric":"lake_maint_soak","events":$events,"batches":$batches,""" +
      f""""wall_p50_sec":${pct(walls.toSeq, 0.5)}%.2f,"wall_p95_sec":${pct(walls.toSeq, 0.95)}%.2f,""" +
      f""""wall_first_third_sec":${third(walls.toSeq, 0)}%.2f,"wall_last_third_sec":${third(walls.toSeq, 2)}%.2f,""" +
      f""""delta_tail_max":${deltaTails.max},"delta_tail_end":${deltaTails.last},""" +
      f""""file_count_max":${fileCounts.max},"file_count_end":${fileCounts.last},""" +
      f""""store_rows":$storeRows,"table_live_rows":$liveRows,"pair_log_rows":$pairRows,""" +
      f""""store_numPids":${h.store.bandStore.numPids}}""")
    spark.stop()
  }
}
