package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase-level timing of the q_zorder_skip pipeline (round-6 diagnosis):
  * bootstrap write vs zorder rewrite vs skipping read, each labeled.
  * Not part of the driver contract.
  */
object ZProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val tmp = s"/dev/shm/graft-zprobe-${ProcessHandle.current().pid()}"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(tmp))
    SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    val s = SparkSession.builder().master(s"local[$cpus]")
      .appName("zprobe")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "16777216")
      .config("spark.storage.memoryMapThreshold", "2147483647")
      .config("spark.hadoop.fs.file.impl", classOf[graft.util.FastLocalFileSystem].getName)
      .config("spark.sql.parquet.compression.codec", "snappy")
      .config("spark.local.dir", s"$tmp/spark-local")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s.range(1000000).selectExpr("sum(id)").collect()

    def phase[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[zprobe] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }

    import graft.lake.LakeTable
    import graft.merge.{Bootstrap, Compactor}
    (1 to 2).foreach { rep =>
      println(s"[zprobe] === rep $rep ===")
      val ev = s.read.parquet(s"$sfDir/events.parquet")
      val rows = ev.select(
        concat(lit("u"), col("user_id")).as("conv_id"),
        col("event_id").cast("int").as("turn_idx"),
        col("event_type").as("role"),
        col("props").as("text"),
        lit(null).cast("string").as("tool"),
        col("ts").cast("timestamp").as("ts"))
      val tdir = s"$tmp/t-$rep"
      val table = phase("create")(LakeTable.create(s, tdir, graft.model.Schemas.transcript, 8))
      phase("bootstrap")(Bootstrap.load(table, rows, snapshotLsn = 1L << 40))
      val mrf = math.max(4096L, table.manifest.totalRows / 32)
      // decomposed zorder: resolve read, quantile pass, z-expr build, write
      val m = table.manifest
      val resolved = phase("z:resolve-plan")(table.snapshotPhysical(m, None))
      phase("z:resolve-count")(resolved.count())
      phase("z:zColumn(approxQuantile)")(
        graft.lake.ZOrder.zColumn(resolved, Seq("ts")))
      phase("zorder-full")(Compactor.zorder(table, Seq("ts"), maxRecordsPerFile = mrf))
      val out = phase("read-plan")(table.snapshotWhere(
          col("ts") >= lit("2024-01-25 00:00:00").cast("timestamp") &&
          col("role") === "click")
        .select(col("conv_id"), col("turn_idx"), col("role"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("ts_str"))
        .orderBy("turn_idx"))
      phase("read-count")(println("rows=" + out.count()))
    }
    s.stop()
    graft.merge.CdcMerge.deleteRecursively(java.nio.file.Paths.get(tmp))
  }
}
