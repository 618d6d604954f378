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
