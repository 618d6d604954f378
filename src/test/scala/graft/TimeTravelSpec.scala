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

  test("consumer pins defer vacuum: a pinned version's snapshot AND changelog suffix survive aggressive retention; release reclaims") {
    val dir = tmpDir("ttp")
    val cfg = WalGen.Config(numEvents = 4000, numConvs = 40)
    try {
      val table = LakeTable.create(spark, s"$dir/t", Schemas.transcript, numBuckets = 2)
      val versionAfter = (0 until 4).map { b =>
        CdcMerge.apply(table, WalGen.events(spark, cfg, b * 1000L, (b + 1) * 1000L).toDF(), b.toLong)
        table.currentVersion
      }
      val pinned = versionAfter(0)
      table.pin("lagging-consumer", pinned)
      assert(table.pins == Map("lagging-consumer" -> pinned))
      Compactor.compact(table, Set(0, 1)) // folds deltas; only references pin them now
      // aggressive retention on BOTH axes — the pin must defer reclamation
      table.vacuum(keepVersions = 1, graceMs = 0L)
      table.vacuumMetadata(keepVersions = 1)
      val rowsAtPin = table.snapshotAt(pinned).count()
      assert(rowsAtPin > 0) // pinned snapshot still fully readable
      assert(table.changesBetween(pinned, versionAfter(3)).count() > 0) // unread suffix intact
      // a pin on a reclaimed version is an unsatisfiable promise → refuse
      intercept[IllegalArgumentException] { table.pin("too-late", -1L) }
      // a crash-leftover writeAtomic temp file in _refs is NOT a pin:
      // parsing it would crash vacuum (torn write) or mint a phantom pin
      // no unpin() could ever release
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$dir/t/_refs/ghost.tmp.abc123"), Array.emptyByteArray)
      assert(table.pins == Map("lagging-consumer" -> pinned))
      table.vacuum(keepVersions = 1, graceMs = 0L) // must not throw
      // release → the same retention now reclaims: read fails loudly
      table.unpin("lagging-consumer")
      assert(table.pins.isEmpty)
      table.vacuum(keepVersions = 1, graceMs = 0L)
      table.vacuumMetadata(keepVersions = 1)
      assert(scala.util.Try(table.snapshotAt(pinned).count()).isFailure)
      // current snapshot unaffected throughout
      assert(table.snapshot().count() > 0)
    } finally rmrf(dir)
  }

  test("vacuum fails loudly when a pinned version's manifest is unreadable — never silently deletes the pinned snapshot") {
    val dir = tmpDir("ttpl")
    val cfg = WalGen.Config(numEvents = 2000, numConvs = 20)
    try {
      val table = LakeTable.create(spark, s"$dir/t", Schemas.transcript, numBuckets = 2)
      val versionAfter = (0 until 3).map { b =>
        CdcMerge.apply(table, WalGen.events(spark, cfg, b * 600L, (b + 1) * 600L).toDF(), b.toLong)
        table.currentVersion
      }
      val pinned = versionAfter(0)
      table.pin("consumer", pinned)
      // simulate external damage: the pinned version's top manifest doc is
      // torn away (a mis-scoped cleanup job, a torn copy). Vacuum resolving
      // the pin's file set must now REFUSE rather than treat the pinned
      // snapshot as unreferenced and delete its files.
      val doc = java.nio.file.Paths.get(f"$dir/t/_manifests/manifest-$pinned%010d.json")
      val stash = java.nio.file.Paths.get(s"$dir/stash.json")
      java.nio.file.Files.move(doc, stash)
      val e = intercept[IllegalStateException] {
        table.vacuum(keepVersions = 1, graceMs = 0L)
      }
      assert(e.getMessage.contains("pin 'consumer'"), e.getMessage)
      // no data file was deleted by the refused vacuum: restore the
      // manifest and the pinned snapshot reads completely
      java.nio.file.Files.move(stash, doc)
      assert(table.snapshotAt(pinned).count() > 0)
    } finally rmrf(dir)
  }

  test("follower with pinName advances its durable pin past consumed windows") {
    val dir = tmpDir("ttf")
    val cfg = WalGen.Config(numEvents = 2000, numConvs = 20)
    try {
      val table = LakeTable.create(spark, s"$dir/t", Schemas.transcript, numBuckets = 2)
      CdcMerge.apply(table, WalGen.events(spark, cfg, 0L, 1000L).toDF(), 0L)
      val v0 = table.currentVersion
      val seen = new java.util.concurrent.atomic.AtomicLong(v0)
      val h = graft.stream.ChangelogFollower.follow(table, v0, pollMs = 20L,
        pinName = Some("ivm")) { (_, to) => seen.set(to) }
      try {
        assert(table.pins("ivm") == v0)
        CdcMerge.apply(table, WalGen.events(spark, cfg, 1000L, 2000L).toDF(), 1L)
        val v1 = table.currentVersion
        val deadline = System.currentTimeMillis() + 30000
        while (seen.get() < v1 && System.currentTimeMillis() < deadline) Thread.sleep(50)
        assert(seen.get() == v1)
        // pin advanced to the consumed version (poll until the post-callback write lands)
        while (table.pins("ivm") < v1 && System.currentTimeMillis() < deadline) Thread.sleep(50)
        assert(table.pins("ivm") == v1)
      } finally h.close()
      // close() does NOT release the pin — a stopped follower intends to resume
      assert(table.pins.contains("ivm"))
    } finally rmrf(dir)
  }

  test("restoreTo rolls the live state back as a NEW commit; history preserved; changelog refuses to cross it") {
    val dir = tmpDir("ttr")
    val cfg = WalGen.Config(numEvents = 6000, numConvs = 60)
    try {
      val table = LakeTable.create(spark, s"$dir/t", Schemas.transcript, numBuckets = 4)
      val versionAfter = (0 until 3).map { b =>
        CdcMerge.apply(table, WalGen.events(spark, cfg, b * 2000L, (b + 1) * 2000L).toDF(), b.toLong)
        table.currentVersion
      }
      val (v1, v3) = (versionAfter(0), versionAfter(2))
      def state(df: org.apache.spark.sql.DataFrame) =
        df.select("conv_id", "turn_idx", "text").collect()
          .map(r => ((r.getString(0), r.getInt(1)), r.getString(2))).toMap
      val stateV1 = state(table.snapshotAt(v1))
      val stateV3 = state(table.snapshotAt(v3))

      val newV = table.restoreTo(v1)
      assert(newV == v3 + 1 && table.currentVersion == newV)
      // live state == v1's, without copying data (same file paths re-referenced)
      assert(state(table.snapshot()) == stateV1)
      assert(table.manifest.files.map(_.path).toSet ==
        table.manifestAt(v1).files.map(_.path).toSet)
      // history preserved: the pre-restore state is still readable
      assert(state(table.snapshotAt(v3)) == stateV3)
      // the restore is a first-class lineage entry
      assert(table.manifest.lineage.last.op == "restore")
      assert(table.manifest.lineage.last.version == newV)
      // a changelog range crossing the restore refuses loudly
      val ex = intercept[IllegalStateException](table.changesBetween(v3, newV).count())
      assert(ex.getMessage.contains("RESTORE"), ex.getMessage)
      // ranges entirely before it still read
      assert(table.changesBetween(v1, v3).count() > 0)
      // writes continue on top of the restored state with exactly-once
      // tracking intact: replaying batch 1 reconverges to the 4000-event oracle
      CdcMerge.apply(table, WalGen.events(spark, cfg, 2000L, 4000L).toDF(), 10L)
      val oracle4 = WalGen.oracleState(cfg.copy(numEvents = 4000))
      assert(state(table.snapshot()) == oracle4.map { case (k, e) => k -> e.text })
      // changelog AFTER the restore reads the new deltas only
      assert(table.changesBetween(newV, table.currentVersion).count() > 0)
      // restore targets must be strictly earlier, existing versions
      intercept[IllegalArgumentException](table.restoreTo(table.currentVersion))
      intercept[Exception](table.restoreTo(0L))
    } finally rmrf(dir)
  }
}
