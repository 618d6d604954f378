package graft.lake

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import graft.model.Schemas
import graft.merge.{Bootstrap, Compactor}

/** Scan-integrated data skipping (GraftFileIndex): pushed-down WHERE
  * predicates prune files at physical planning for BOTH the SQL surface
  * and the plain DataFrame read path, observed through the scan's own
  * `numFiles` metric; results stay exact against an in-memory twin.
  */
class SkippingSqlSpec extends graft.SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  /** Files actually selected by every parquet scan in the executed plan —
    * recursing through AQE wrappers and materialized query stages, whose
    * subtrees plain `collect` cannot reach.
    */
  private def scannedFiles(df: DataFrame): Long = {
    df.collect()
    def scans(p: org.apache.spark.sql.execution.SparkPlan): Seq[FileSourceScanExec] = {
      val here = p match {
        case f: FileSourceScanExec => Seq(f)
        case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => scans(q.plan)
        case _ => Nil
      }
      here ++ p.children.flatMap(scans)
    }
    scans(df.queryExecution.executedPlan).distinct.map(_.metrics("numFiles").value).sum
  }

  test("pushed filters prune lake files in SQL and DataFrame reads alike") {
    val dir = tmpDir("sqlskip")
    spark.sparkContext
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .withExtensions(new graft.functions.GraftExtensions)
        .getOrCreate()
      val rows = (0 until 2000).map { i =>
        (s"c${i % 89}", i, if (i % 2 == 0) "user" else "assistant",
         s"text-$i", null.asInstanceOf[String],
         ts(f"2024-01-${1 + (i * 30 / 2000)}%02d 12:00:00"))
      }.toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")
      val t = LakeTable.create(s2, s"$dir/t", Schemas.transcript, 4)
      Bootstrap.load(t, rows, snapshotLsn = 2000L)
      Compactor.zorder(t, Seq("ts"), maxRecordsPerFile = 64L)
      val totalFiles = t.manifest.files.size
      assert(totalFiles >= 16, s"need many files to demonstrate skipping, got $totalFiles")
      graft.sql.LakeCatalog.register("skiptbl", s"$dir/t")
      try {
        // SQL surface: narrow ts window prunes most files
        val q = s2.sql("SELECT count(*) AS n FROM skiptbl WHERE " +
          "ts >= TIMESTAMP '2024-01-05 00:00:00' AND ts < TIMESTAMP '2024-01-07 00:00:00'")
        val expected = rows.filter(col("ts") >= lit(ts("2024-01-05 00:00:00")) &&
          col("ts") < lit(ts("2024-01-07 00:00:00"))).count()
        assert(q.collect()(0).getLong(0) == expected)
        val sqlScanned = scannedFiles(q)
        assert(sqlScanned > 0 && sqlScanned < totalFiles / 2,
          s"SQL skipping too weak: scanned $sqlScanned of $totalFiles files")

        // DataFrame API gets the same skipping with no special call
        val dfScanned = scannedFiles(
          t.snapshot().filter(col("ts") >= lit(ts("2024-01-29 00:00:00"))))
        assert(dfScanned < totalFiles / 2,
          s"DataFrame skipping too weak: scanned $dfScanned of $totalFiles files")

        // filterless scan reads everything, count exact
        val full = s2.sql("SELECT count(*) AS n FROM skiptbl")
        assert(full.collect()(0).getLong(0) == 2000L)
        assert(scannedFiles(full) == totalFiles.toLong)

        // non-clustered predicate: still exact (pruning may or may not help)
        val m = s2.sql("SELECT conv_id, turn_idx FROM skiptbl WHERE conv_id = 'c7' ORDER BY turn_idx")
        assert(m.collect().length == rows.filter(col("conv_id") === "c7").count().toInt)

        // self-join + aggregate over pruned scans stays exact
        val j = s2.sql(
          """SELECT a.role, count(*) AS n FROM skiptbl a
            |JOIN skiptbl b ON a.conv_id = b.conv_id AND a.turn_idx = b.turn_idx
            |WHERE a.ts >= TIMESTAMP '2024-01-28 00:00:00' GROUP BY a.role ORDER BY a.role""".stripMargin)
        val want = rows.filter(col("ts") >= lit(ts("2024-01-28 00:00:00")))
          .groupBy("role").count().orderBy("role")
          .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
        assert(j.collect().map(r => (r.getString(0), r.getLong(1))).toSeq == want)
      } finally graft.sql.LakeCatalog.unregister("skiptbl")
    } finally rmrf(dir)
  }

  test("MOR shape keeps delta-bucket scans unpruned: update masked by a filter cannot resurrect") {
    val dir = tmpDir("sqlskip-mor")
    try {
      val t = LakeTable.create(spark, s"$dir/t", Schemas.transcript, 1)
      def batch(rows: org.apache.spark.sql.Row*): DataFrame =
        spark.createDataFrame(spark.sparkContext.parallelize(rows), Schemas.changeEvent)
      def ev(op: String, lsn: Long, role: String): org.apache.spark.sql.Row =
        org.apache.spark.sql.Row(op, lsn, "conv", 1, role, "x", null, ts("2024-01-01 00:00:00"))
      graft.merge.CdcMerge.apply(t, batch(ev("I", 1L, "user")), epoch = 0L)
      Compactor.compact(t, Set(0))
      graft.merge.CdcMerge.apply(t, batch(ev("U", 2L, "assistant")), epoch = 1L)
      // the pushed role='user' predicate must NOT prune the delta scan
      // below the resolve window — the stale base row would win
      val leak = t.snapshot().filter(col("role") === "user").collect()
      assert(leak.isEmpty, s"stale row leaked through scan-level skipping: ${leak.toSeq}")
    } finally rmrf(dir)
  }
}
