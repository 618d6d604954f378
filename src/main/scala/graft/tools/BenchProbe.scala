package graft.tools

import scala.jdk.CollectionConverters._
import org.apache.spark.sql.SparkSession
import graft.gen.WalGen
import graft.lake.LakeTable
import graft.merge.CdcMerge
import graft.model.Schemas
import graft.stream.CdcStream

/** Parameterized CDC-apply probe: runMain graft.tools.BenchProbe
  *   <cores> <events> <numBuckets> <salt> <maxFilesPerTrigger> [walDir]
  * Prints per-batch wallMs (from manifest lineage) + total events/sec.
  */
object BenchProbe {
  def main(args: Array[String]): Unit = {
    if (args(0) == "gen") { // gen <events> <dir> [chunks]
      val spark = SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false").getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      val events = args(1).toLong
      val cfg = WalGen.Config(numEvents = events, numConvs = math.max(100L, events / 200))
      WalGen.writeWal(spark, args(2), cfg, args.lift(3).map(_.toInt).getOrElse(8))
      println(s"[probe] generated $events events -> ${args(2)}")
      spark.stop(); return
    }
    if (args(0) == "timeq") { // timeq <cores> <sfDir> <query...> : best-of-3 per query
      val cores = args(1).toInt
      SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
      val spark = SparkSession.builder().master(s"local[$cores]")
        .config("spark.sql.shuffle.partitions", cores.toString)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false").getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      args.drop(3).foreach { q =>
        val best = (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          graft.SparkEntry.queries(q)(spark, args(2)).count()
          (System.nanoTime() - t0) / 1e9
        }.min
        println(f"[probe] $q: best $best%.2fs")
      }
      spark.stop(); return
    }
    if (args(0) == "cpu") { // cpu <cores> <rows> : pure-compute scaling probe
      // The engine's COMPUTE path (codegen'd hash/dedup arithmetic) with no
      // filesystem or shuffle-write involvement: spark.range → chained
      // xxhash64 → order-invariant decimal sum. Pinned-child wall time at
      // two levels separates "does the engine's plan scale" from the
      // host's kernel/FS ceiling (which the scan/apply probes hit).
      val cores = args(1).toInt
      val rows = args.lift(2).map(_.toLong).getOrElse(400000000L)
      SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
      val spark = SparkSession.builder().master(s"local[$cores]")
        .config("spark.sql.shuffle.partitions", cores.toString)
        .config("spark.ui.enabled", "false").getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      import org.apache.spark.sql.functions._
      val df = spark.range(0, rows, 1, cores * 4)
      val h = (1 to 8).foldLeft(col("id"))((c, _) => xxhash64(c))
      df.select(sum(lit(0L))).collect() // warm codegen/JIT
      for (_ <- 1 to 3) {
        val t0 = System.nanoTime()
        df.select(sum(h.cast("decimal(38,0)"))).collect()
        println(f"[probe] cpu $cores cores, $rows rows: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      }
      spark.stop(); return
    }
    if (args(0) == "scan") { // scan <cores> <dir> : read-only scaling probe
      val cores = args(1).toInt
      SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
      val spark = SparkSession.builder().master(s"local[$cores]")
        .config("spark.sql.shuffle.partitions", cores.toString)
        .config("spark.sql.files.maxPartitionBytes", sys.env.getOrElse("GRAFT_BENCH_MPB", "16777216"))
        .config("spark.hadoop.fs.file.impl", classOf[graft.util.FastLocalFileSystem].getName)
        .config("spark.ui.enabled", "false").getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      import org.apache.spark.sql.functions._
      val df = spark.read.parquet(args(2))
      df.count() // warm listing
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        df.select(sum(xxhash64(df.columns.map(col).toIndexedSeq: _*).cast("decimal(38,0)"))).collect()
        println(f"[probe] scan$i cores=$cores: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      }
      spark.stop(); return
    }
    val cores = args(0).toInt
    val events = args(1).toLong
    val buckets = args(2).toInt
    val salt = args(3).toInt
    val mft = args(4).toInt
    val walDir = args.lift(5)
    SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    // GRAFT_MASTER=spark://host:7077 runs against a real standalone
    // cluster (multi-executor; `cores` then only sizes shuffle
    // parallelism); default is local[cores]
    val master = sys.env.getOrElse("GRAFT_MASTER", s"local[$cores]")
    val builder0 = SparkSession.builder().master(master)
    val builder1 = sys.env.get("GRAFT_JARS").map(builder0.config("spark.jars", _)).getOrElse(builder0)
    val builder2 = sys.env.get("GRAFT_EXEC_CORES").map(builder1.config("spark.executor.cores", _)).getOrElse(builder1)
    val spark = sys.env.get("GRAFT_EXEC_MEM").map(builder2.config("spark.executor.memory", _)).getOrElse(builder2)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes",
        sys.env.getOrElse("GRAFT_BENCH_MPB", "16777216")) // 16MB: scans split across cores
      // avoid mmap for shuffle/storage blocks: 32 threads page-faulting
      // mapped files serialize on the kernel mmap_lock (this VM is
      // sys-time-bound there); streaming reads scale
      .config("spark.storage.memoryMapThreshold",
        sys.env.getOrElse("GRAFT_BENCH_MMAP", "2147483647"))
      .config("spark.local.dir",
        sys.env.get("GRAFT_BENCH_TMP").map(_ + "/spark-local")
          .getOrElse(System.getProperty("java.io.tmpdir")))
      .config("spark.hadoop.fs.file.impl", classOf[graft.util.FastLocalFileSystem].getName)
      .config("spark.sql.parquet.compression.codec",
        sys.env.getOrElse("GRAFT_BENCH_CODEC", "snappy"))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (sys.env.contains("GRAFT_STAGES")) {
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val si = sc.stageInfo
          val ms = for {s <- si.submissionTime; c <- si.completionTime} yield c - s
          println(s"[stage] id=${si.stageId} tasks=${si.numTasks} wall=${ms.getOrElse(-1L)}ms " +
            s"cpu=${si.taskMetrics.executorCpuTime / 1000000}ms run=${si.taskMetrics.executorRunTime}ms " +
            s"gc=${si.taskMetrics.jvmGCTime}ms shufW=${si.taskMetrics.shuffleWriteMetrics.bytesWritten / 1048576}MB " +
            s"name=${si.name.take(60)}")
        }
      })
    }
    // poor-man's sampling profiler: histogram executor + driver-result
    // thread stacks every 200ms, dump top frames at exit
    val profHist = new java.util.concurrent.ConcurrentHashMap[String, java.lang.Integer]()
    if (sys.env.contains("GRAFT_PROF")) {
      val t = new Thread(() => {
        while (true) {
          Thread.sleep(200)
          val stacks = Thread.getAllStackTraces
          stacks.forEach { (th, st) =>
            if (st.nonEmpty && (th.getName.startsWith("Executor task launch") ||
                th.getName.contains("result-getter") || th.getName == "main")) {
              val frame = st.take(3).map(f => f.getClassName.split('.').last + "." + f.getMethodName)
                .mkString(" <- ")
              profHist.merge(s"[${if (th.getName == "main") "main" else "exec"}] $frame", 1, (a, b) => a + b)
            }
          }
        }
      })
      t.setDaemon(true); t.start()
    }
    val base = sys.env.get("GRAFT_BENCH_TMP").map(java.nio.file.Paths.get(_))
    base.foreach(java.nio.file.Files.createDirectories(_))
    val work = (base match {
      case Some(b) => java.nio.file.Files.createTempDirectory(b, "probe")
      case None => java.nio.file.Files.createTempDirectory("probe")
    }).toString
    val cfg = WalGen.Config(numEvents = events, numConvs = math.max(100L, events / 200))
    val wal = walDir.getOrElse { WalGen.writeWal(spark, s"$work/wal", cfg, 8); s"$work/wal" }
    val table = LakeTable.create(spark, s"$work/t", Schemas.transcript, buckets)
    println(f"[probe] calib ${graft.util.DetHash.calibrateMops()}%.0f Mops")
    val t0 = System.nanoTime()
    if (sys.env.contains("GRAFT_BATCHMODE")) {
      // bypass streaming: apply the WAL as `mft`-chunk batches directly
      val chunks = {
        val s = java.nio.file.Files.list(java.nio.file.Paths.get(wal))
        try s.iterator().asScala
          .filter(_.toString.endsWith(".parquet")).toSeq.sortBy(_.toString)
        finally s.close()
      }
      chunks.grouped(mft).zipWithIndex.foreach { case (grp, i) =>
        val df = spark.read.schema(Schemas.changeEvent).parquet(grp.map(_.toString): _*)
        CdcMerge.apply(table, df, i.toLong, salt)
      }
    } else {
      CdcStream.runToCompletion(spark, wal, table, s"$work/cp", mft, salt)
    }
    val secs = (System.nanoTime() - t0) / 1e9
    val m = table.manifest
    println(s"[probe] cores=$cores salt=$salt buckets=$buckets mft=$mft files=${m.files.size}")
    m.lineage.foreach(c => println(s"[probe]   epoch=${c.epoch} rows=${c.batchRows} wallMs=${c.wallMs}"))
    println(f"[probe] total ${secs}%.1fs -> ${events / secs}%.0f ev/s")
    if (sys.env.contains("GRAFT_PROF")) {
      import scala.jdk.CollectionConverters._
      profHist.asScala.toSeq.sortBy(-_._2.intValue).take(25).foreach { case (k, v) =>
        println(s"[prof] $v  $k")
      }
    }
    spark.stop()
  }
}
