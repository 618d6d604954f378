package graft

import org.apache.spark.sql.functions._
import graft.gen.WalGen
import graft.lake.LakeTable
import graft.merge.{CdcMerge, Compactor}
import graft.model.Schemas

/** Time travel + incremental changelog reads over manifest versions. */
class TimeTravelSpec extends SparkSpec {

  test("snapshotAt reproduces historical states; changesBetween feeds the CDC log") {
    val dir = tmpDir("tt")
    val cfg = WalGen.Config(numEvents = 8000, numConvs = 80)
    try {
      val table = LakeTable.create(spark, s"$dir/t", Schemas.transcript, numBuckets = 4)
      val versionAfter = (0 until 4).map { b =>
        CdcMerge.apply(table, WalGen.events(spark, cfg, b * 2000L, (b + 1) * 2000L).toDF(), b.toLong)
        table.currentVersion
      }
      // historical snapshot equals oracle of the prefix
      val oracle2 = WalGen.oracleState(cfg.copy(numEvents = 4000))
      val snap2 = table.snapshotAt(versionAfter(1))
        .select("conv_id", "turn_idx", "text").collect()
        .map(r => ((r.getString(0), r.getInt(1)), r.getString(2))).toMap
      assert(snap2.size == oracle2.size)
      oracle2.foreach { case (k, e) => assert(snap2(k) == e.text) }

      // changelog between v1 and v3 = deduped events of batches 1..2
      val changes = table.changesBetween(versionAfter(0), versionAfter(2))
      val lsns = changes.agg(min(col(Schemas.LSN_COL)), max(col(Schemas.LSN_COL))).collect()(0)
      assert(lsns.getLong(0) >= 2000 && lsns.getLong(1) <= 5999, lsns.toString)
      assert(changes.columns.contains(Schemas.DELETED_COL))
      assert(changes.filter(col(Schemas.DELETED_COL)).count() > 0) // tombstones flow through

      // compaction commits contribute no changes
      Compactor.compact(table, Set(0, 1, 2, 3))
      val vCompact = table.currentVersion
      assert(table.changesBetween(versionAfter(3), vCompact).count() == 0)
      // latest snapshot still matches full oracle after compaction
      val oracleAll = WalGen.oracleState(cfg)
      assert(table.snapshotAt(vCompact).count() == oracleAll.size)
    } finally rmrf(dir)
  }

  test("changelog retention: vacuum honors the retention window; reads past it fail loudly, never partially") {
    val dir = tmpDir("ttv")
    val cfg = WalGen.Config(numEvents = 4000, numConvs = 40)
    try {
      val table = LakeTable.create(spark, s"$dir/t", Schemas.transcript, numBuckets = 2)
      val versionAfter = (0 until 4).map { b =>
        CdcMerge.apply(table, WalGen.events(spark, cfg, b * 1000L, (b + 1) * 1000L).toDF(), b.toLong)
        table.currentVersion
      }
      Compactor.compact(table, Set(0, 1)) // deltas folded → only the retention window pins them
      val vCompact = table.currentVersion
      // retention wide enough → old deltas survive vacuum, changelog still reads
      table.vacuum(keepVersions = 1, changelogRetentionVersions = 10, graceMs = 0L)
      assert(table.changesBetween(versionAfter(0), versionAfter(2)).count() > 0)
      // no retention → deltas vacuumed; the changelog read must FAIL LOUDLY
      table.vacuum(keepVersions = 1, graceMs = 0L)
      val e = intercept[IllegalStateException] {
        table.changesBetween(versionAfter(0), versionAfter(2)).count()
      }
      assert(e.getMessage.contains("vacuum"))
      // current snapshot unaffected
      assert(table.snapshotAt(vCompact).count() == table.snapshot().count())
    } finally rmrf(dir)
  }
}
