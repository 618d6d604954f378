package graft

import graft.gen.WalGen
import graft.lake.{FileEntry, LakeTable, Manifest}
import graft.merge.CdcMerge
import graft.model.Schemas

/** Bloom-filter file skipping: buildBlooms annotates delta files off the
  * write path; point lookups must skip excluded delta files with ZERO
  * false negatives, and annotated manifests must round-trip.
  */
class LakeBloomSpec extends SparkSpec {

  test("buildBlooms prunes delta files on point lookups with no false negatives") {
    val dir = tmpDir("bloom1")
    import spark.implicits._
    import java.sql.Timestamp
    // each batch writes a DISJOINT conversation set that INTERLEAVES the
    // lexicographic key space (batch e holds convs ≡ e mod 8) — so every
    // delta file's (minKey, maxKey) spans nearly the whole range and only
    // the bloom can skip it; this is the realistic delta shape (random
    // keys per batch), unlike contiguous ranges where footer stats win
    def batch(e: Int) = (0 until 50).flatMap { i =>
      val conv = f"conv-${i * 8 + e}%04d"
      (0 until 4).map(t => graft.model.ChangeEvent("I", e * 1000L + i * 10 + t,
        conv, t, "user", s"text $conv $t", "", new Timestamp(1700000000000L)))
    }.toDF()
    val convIds = (0 until 8).flatMap(e => (0 until 50).map(i => f"conv-${i * 8 + e}%04d"))
    try {
      val table = LakeTable.create(spark, s"$dir/t", Schemas.transcript, numBuckets = 2)
      (0 until 8).foreach { e => CdcMerge.apply(table, batch(e), e.toLong) }
      val preFiles = convIds.map(c => c -> table.filesForConversation(c)).toMap
      val preRows = convIds.map(c =>
        c -> table.readConversation(c).collect().map(_.toString).sorted.toSeq).toMap

      val annotated = table.buildBlooms(fpp = 0.03)
      assert(annotated > 0, "expected delta files to be annotated")
      val m = table.manifest
      assert(m.files.filter(_.kind == FileEntry.DELTA).forall(_.bloom.isDefined))
      assert(m.files.filter(_.kind == FileEntry.BASE).forall(_.bloom.isEmpty))

      // correctness: every conversation reads identically (no false negatives)
      convIds.foreach { c =>
        val rows = table.readConversation(c).collect().map(_.toString).sorted.toSeq
        assert(rows == preRows(c), s"bloom pruning changed rows for $c")
      }
      // effectiveness: each conv lives in 1 of 8 disjoint delta epochs, so
      // bloom pruning must cut the aggregate candidate set drastically
      val pre = convIds.map(preFiles(_).size).sum
      val post = convIds.map(table.filesForConversation(_).size).sum
      assert(post < pre, s"expected bloom pruning to shrink file sets: $pre -> $post")
      assert(post <= pre / 2, s"expected substantial pruning: $pre -> $post")

      // an absent key prunes to (almost) nothing among deltas
      val ghost = table.filesForConversation("no-such-conversation-xyz")
      assert(ghost.count(_.kind == FileEntry.DELTA) <= 1,
        s"ghost key should be bloom-excluded from nearly all deltas, got ${ghost.size}")

      // idempotence: second run annotates nothing, version unchanged
      val v = table.currentVersion
      assert(table.buildBlooms() == 0)
      assert(table.currentVersion == v)
    } finally rmrf(dir)
  }

  test("bloom-annotated manifests round-trip; bloom-only commit is invisible to the changelog") {
    val dir = tmpDir("bloom2")
    val cfg = WalGen.Config(numEvents = 1000, numConvs = 10)
    try {
      val table = LakeTable.create(spark, s"$dir/t", Schemas.transcript, numBuckets = 2)
      CdcMerge.apply(table, WalGen.events(spark, cfg, 0, 1000).toDF(), 0L)
      val v0 = table.currentVersion
      assert(table.buildBlooms() > 0)
      val v1 = table.currentVersion
      assert(v1 == v0 + 1)

      // round-trip: a FRESH LakeTable over the same root sees the blooms
      val reopened = LakeTable.load(spark, s"$dir/t")
      assert(reopened.manifest.files.filter(_.kind == FileEntry.DELTA)
        .forall(_.bloom.isDefined))

      // metadata-only commit: no delta files added → empty changelog slice
      assert(table.changesBetween(v0, v1).count() == 0)

      // time travel to the pre-bloom version still reads (old segments intact)
      assert(table.snapshotAt(v0).count() == table.snapshot().count())
    } finally rmrf(dir)
  }
}
