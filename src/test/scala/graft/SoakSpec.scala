package graft

import org.apache.spark.sql.functions._
import graft.gen.WalGen
import graft.lake.{FileEntry, LakeTable, Manifest}
import graft.merge.CdcMerge
import graft.model.Schemas
import graft.stream.CdcStream

/** Longer streaming soak: enough micro-batches that compaction fires
  * INSIDE the streaming loop (not just when called directly), plus the
  * single-writer CAS guard.
  */
class SoakSpec extends SparkSpec {
  import spark.implicits._

  test("20-epoch stream triggers in-loop compaction and still matches oracle") {
    val dir = tmpDir("soak")
    val cfg = WalGen.Config(numEvents = 40000, numConvs = 200)
    try {
      WalGen.writeWal(spark, s"$dir/wal", cfg, numChunks = 20)
      val table = LakeTable.create(spark, s"$dir/t", Schemas.transcript, numBuckets = 4)
      CdcStream.runToCompletion(spark, s"$dir/wal", table, s"$dir/cp",
        maxFilesPerTrigger = 1, compactEvery = 6)
      val m = table.manifest
      // compaction ran at least once mid-stream: base files exist and no
      // bucket holds >= 2*compactEvery delta epochs
      assert(m.files.exists(_.kind == FileEntry.BASE), "no compaction happened in-loop")
      val maxDeltaEpochs = m.files.filter(_.kind == FileEntry.DELTA)
        .groupBy(_.bucket).values.map(_.map(_.epoch).distinct.size).maxOption.getOrElse(0)
      assert(maxDeltaEpochs < 12, s"deltas accumulated unboundedly: $maxDeltaEpochs epochs")
      val oracle = WalGen.oracleState(cfg)
      val got = table.snapshot().select("conv_id", "turn_idx", "text").collect()
        .map(r => ((r.getString(0), r.getInt(1)), r.getString(2))).toMap
      assert(got.size == oracle.size)
      oracle.foreach { case (k, e) => assert(got(k) == e.text, s"mismatch at $k") }
      // vacuum after the soak leaves the snapshot intact
      table.vacuum(keepVersions = 1, graceMs = 0L)
      assert(table.snapshot().count() == oracle.size)
    } finally rmrf(dir)
  }

  test("pinned lagging consumer under a steady stream: aggressive vacuum every batch never breaks its window; release reclaims") {
    val dir = tmpDir("soakpin")
    val cfg = WalGen.Config(numEvents = 16000, numConvs = 100)
    try {
      val table = LakeTable.create(spark, s"$dir/t", Schemas.transcript, numBuckets = 4)
      // first batch, then pin a consumer at that early version
      CdcMerge.apply(table, WalGen.events(spark, cfg, 0, 2000).toDF(), 0L)
      val pinned = table.currentVersion
      table.pin("lagging", pinned)
      val pinnedSnapshotRows = table.snapshotAt(pinned).count()
      // steady stream: 7 more batches, compaction + AGGRESSIVE vacuum after
      // each — without the pin this retention reclaims every old delta
      (1 to 7).foreach { b =>
        CdcMerge.apply(table,
          WalGen.events(spark, cfg, b * 2000L, (b + 1) * 2000L).toDF(), b.toLong)
        if (b % 3 == 0) graft.merge.Compactor.compactIfNeeded(table, deltaThreshold = 2)
        table.vacuum(keepVersions = 1, graceMs = 0L)
        table.vacuumMetadata(keepVersions = 1)
        // the pinned consumer's window stays fully readable at EVERY step
        assert(table.snapshotAt(pinned).count() == pinnedSnapshotRows)
        assert(table.changesBetween(pinned, table.currentVersion).count() > 0)
      }
      // final state matches the oracle (retention never touched live data)
      val oracle = WalGen.oracleState(cfg)
      assert(table.snapshot().count() == oracle.size)
      // release → the same retention reclaims the pinned version
      table.unpin("lagging")
      table.vacuum(keepVersions = 1, graceMs = 0L)
      table.vacuumMetadata(keepVersions = 1)
      assert(scala.util.Try(table.snapshotAt(pinned).count()).isFailure)
      assert(table.snapshot().count() == oracle.size)
    } finally rmrf(dir)
  }

  test("commit CAS rejects a stale writer") {
    val dir = tmpDir("cas")
    try {
      val table = LakeTable.create(spark, s"$dir/t", Schemas.transcript, numBuckets = 2)
      val m0 = table.manifest
      val mA = m0.copy(version = 1, lastEpoch = 0)
      table.commit(mA, expectedParent = 0)
      // a second writer still holding version 0 must fail, not clobber
      val mB = m0.copy(version = 1, lastEpoch = 99)
      val err = intercept[IllegalArgumentException](table.commit(mB, expectedParent = 0))
      assert(err.getMessage.contains("concurrent commit"))
      assert(table.manifest.lastEpoch == 0) // winner's state intact
    } finally rmrf(dir)
  }
}
