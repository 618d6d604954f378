package graft

import org.apache.spark.sql.DataFrame
import graft.gen.WalGen
import graft.lake.LakeTable
import graft.merge.CdcMerge
import graft.model.Schemas
import graft.stream.IncrementalAgg

/** Changelog-driven incremental view maintenance: after each CDC commit,
  * refreshing the per-conversation aggregate from the changelog window must
  * equal a full recompute — including conversations that shrink via
  * tombstones — while touching only changed groups.
  */
class IncrementalAggSpec extends SparkSpec {

  private def canon(df: DataFrame): Map[String, (Long, Long, Long)] =
    df.collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap

  test("refresh(changelog window) == full recompute at every version") {
    val dir = tmpDir("incragg")
    val cfg = WalGen.Config(numEvents = 10000, numConvs = 80, deleteFrac = 0.1)
    try {
      val table = LakeTable.create(spark, s"$dir/t", Schemas.transcript, numBuckets = 4)
      var view = IncrementalAgg.full(table) // empty
      var lastVersion = table.currentVersion
      val per = cfg.numEvents / 4
      (0 until 4).foreach { b =>
        CdcMerge.apply(table,
          WalGen.events(spark, cfg, b * per, (b + 1) * per).toDF(), b.toLong)
        val v = table.currentVersion
        view = IncrementalAgg.refresh(table, view, lastVersion, v)
          .persist()
        view.count()
        lastVersion = v
        assert(canon(view) == canon(IncrementalAgg.full(table)),
          s"incremental view diverged after batch $b")
      }
      // deletes flowed through: at least one conversation lost turns vs
      // its max turn_idx footprint (tombstones shrink groups)
      assert(view.count() > 0)
    } finally rmrf(dir)
  }

  test("ChangelogFollower tails commits and sees every delta exactly once") {
    val dir = tmpDir("follow")
    val cfg = WalGen.Config(numEvents = 6000, numConvs = 50)
    try {
      val table = LakeTable.create(spark, s"$dir/t", Schemas.transcript, numBuckets = 2)
      val seen = new java.util.concurrent.atomic.AtomicLong(0)
      val windows = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
      val handle = graft.stream.ChangelogFollower.follow(table, table.currentVersion, pollMs = 50) {
        (changes, toV) => seen.addAndGet(changes.count()); windows.add((changes.count(), toV)) ; ()
      }
      val per = cfg.numEvents / 3
      var expected = 0L
      (0 until 3).foreach { b =>
        val st = CdcMerge.apply(table,
          WalGen.events(spark, cfg, b * per, (b + 1) * per).toDF(), b.toLong)
        expected += st.batchRows
        Thread.sleep(400) // let the follower drain between commits
      }
      // wait for the follower to catch up, then stop it
      val deadline = System.currentTimeMillis() + 20000
      while (seen.get() < expected && System.currentTimeMillis() < deadline) Thread.sleep(100)
      handle.close()
      assert(seen.get() == expected,
        s"follower saw ${seen.get()} delta rows, writers committed $expected")
    } finally rmrf(dir)
  }

  test("ChangelogFollower surfaces a callback failure instead of dying silently") {
    val dir = tmpDir("followfail")
    val cfg = WalGen.Config(numEvents = 500, numConvs = 10)
    try {
      val table = LakeTable.create(spark, s"$dir/t", Schemas.transcript, numBuckets = 2)
      val reported = new java.util.concurrent.atomic.AtomicReference[Throwable]()
      val handle = graft.stream.ChangelogFollower.follow(
        table, table.currentVersion, pollMs = 20, onError = reported.set) { (_, _) =>
        throw new RuntimeException("consumer exploded")
      }
      CdcMerge.apply(table, WalGen.events(spark, cfg, 0, 500).toDF(), 0L)
      val deadline = System.currentTimeMillis() + 20000
      while (handle.failure.isEmpty && System.currentTimeMillis() < deadline)
        Thread.sleep(50)
      assert(handle.failure.exists(_.getMessage == "consumer exploded"),
        s"failure not retained on handle: ${handle.failure}")
      assert(reported.get() != null, "onError callback did not fire")
      val closeErr = intercept[IllegalStateException](handle.close())
      assert(closeErr.getCause.getMessage == "consumer exploded")
    } finally rmrf(dir)
  }
}
