package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.gen.WalGen
import graft.lake.LakeTable
import graft.merge.{Bootstrap, CdcMerge}
import graft.model.Schemas

/** Snapshot-bootstrap + cutover: bulk load a state consistent at LSN S,
  * then tail the WAL from an OVERLAPPING position — the engine must
  * reconverge to the full-replay oracle, including the pre-S-delete
  * resurrection hazard the cutover gate exists for.
  */
class BootstrapSpec extends SparkSpec {
  import spark.implicits._

  /** Per-key latest state at lsn <= S, deletes removed, per-key lsn kept. */
  private def snapshotAt(cfg: WalGen.Config, s: Long) = {
    val ev = WalGen.events(spark, cfg, 0, cfg.numEvents).toDF().filter(col("lsn") <= s)
    CdcMerge.dedupMaxLsn(ev).filter(col("op") =!= "D").drop("op")
  }

  test("bootstrap at S + overlapping replay reconverges to full-replay oracle") {
    val dir = tmpDir("boot")
    val cfg = WalGen.Config(numEvents = 12000, numConvs = 120, maxTurns = 20)
    try {
      // WalGen LSNs are the effective event index — S at 60%, replay from 40%
      val s = (cfg.numEvents * 0.6).toLong
      val replayFrom = (cfg.numEvents * 0.4).toLong

      val table = LakeTable.create(spark, s"$dir/t", Schemas.transcript, numBuckets = 4)
      Bootstrap.load(table, snapshotAt(cfg, s), snapshotLsn = s)
      assert(table.manifest.maxLsn == s, "watermark stamped to the snapshot position")

      // tail from replayFrom: 20% of the stream overlaps the snapshot
      val tail = WalGen.events(spark, cfg, 0, cfg.numEvents).toDF()
        .filter(col("lsn") > replayFrom)
      Bootstrap.verifyNoGap(replayFrom + 1, s)
      val batches = 4
      val perLsn = (cfg.numEvents - replayFrom) / batches + 1
      (0 until batches).foreach { b =>
        val lo = replayFrom + b * perLsn
        val batch = tail.filter(col("lsn") > lo && col("lsn") <= lo + perLsn)
        CdcMerge(table, Bootstrap.cutoverGate(batch, s), epoch = b + 1L)
      }

      val oracle = WalGen.oracleState(cfg).toSeq.sortBy { case ((c, t), _) => (c, t) }
      val got = table.snapshot().orderBy("conv_id", "turn_idx")
        .select("conv_id", "turn_idx", "text").collect()
      assert(got.length == oracle.size)
      got.zip(oracle).foreach { case (r, ((c, t), e)) =>
        assert(r.getString(0) == c && r.getInt(1) == t && r.getString(2) == e.text,
          s"mismatch at ($c,$t)")
      }
    } finally rmrf(dir)
  }

  test("snapshot rows with lsn above the declared position are rejected") {
    val dir = tmpDir("boot-over")
    try {
      val table = LakeTable.create(spark, s"$dir/t", Schemas.transcript, numBuckets = 2)
      val snap = Seq(("c1", 0, "user", "x", "", Timestamp.valueOf("2024-03-01 10:00:00"), 99L))
        .toDF("conv_id", "turn_idx", "role", "text", "tool", "ts", "lsn")
      val e = intercept[IllegalArgumentException](Bootstrap.load(table, snap, snapshotLsn = 50L))
      assert(e.getMessage.contains("not consistent"))
    } finally rmrf(dir)
  }

  test("cutover gate blocks pre-snapshot resurrection; ungated replay resurrects") {
    def mkEvents(rows: (String, Long, String, Int, String)*) =
      rows.toDF("op", "lsn", "conv_id", "turn_idx", "text")
        .withColumn("role", lit("user")).withColumn("tool", lit(""))
        .withColumn("ts", lit(Timestamp.valueOf("2024-03-01 10:00:00")))
        .select(Schemas.changeEvent.fieldNames.map(col).toIndexedSeq: _*)

    // history: insert k at lsn 1, delete k at lsn 2; snapshot at S=2 is empty.
    // the tail re-delivers the ANCIENT insert (lsn 1) — a dup from before S.
    val ancientDup = mkEvents(("I", 1L, "k", 0, "ghost"))

    for (gated <- Seq(true, false)) {
      val dir = tmpDir(s"boot-res-$gated")
      try {
        val table = LakeTable.create(spark, s"$dir/t", Schemas.transcript, numBuckets = 2)
        val emptySnap = spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], Schemas.transcript)
        Bootstrap.load(table, emptySnap, snapshotLsn = 2L)
        val batch = if (gated) Bootstrap.cutoverGate(ancientDup, 2L) else ancientDup
        CdcMerge(table, batch, epoch = 1L)
        val n = table.snapshot().count()
        if (gated) assert(n == 0, "gate must drop the pre-snapshot duplicate")
        else assert(n == 1, "ungated replay resurrects — the hazard the gate closes")
      } finally rmrf(dir)
    }
  }

  test("gap between snapshot position and stream start is loud") {
    val e = intercept[IllegalArgumentException](Bootstrap.verifyNoGap(100L, 42L))
    assert(e.getMessage.contains("cutover gap"))
    Bootstrap.verifyNoGap(43L, 42L) // contiguous: fine
    Bootstrap.verifyNoGap(10L, 42L) // overlap: fine
  }
}
