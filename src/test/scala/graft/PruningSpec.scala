package graft

import org.apache.spark.sql.functions._
import graft.gen.WalGen
import graft.lake.{FileEntry, LakeTable}
import graft.merge.{CdcMerge, Compactor}
import graft.model.Schemas

/** File-level key-range pruning: manifest (minKey, maxKey) from footer
  * stats + key-sorted compaction → single-conversation reads touch a
  * strict subset of the bucket's files.
  */
class PruningSpec extends SparkSpec {
  import spark.implicits._

  test("readConversation prunes to few files and matches the oracle") {
    val dir = tmpDir("prune")
    val cfg = WalGen.Config(numEvents = 20000, numConvs = 400, maxTurns = 20)
    try {
      val table = LakeTable.create(spark, s"$dir/t", Schemas.transcript, numBuckets = 2)
      (0 until 4).foreach { b =>
        CdcMerge.apply(table, WalGen.events(spark, cfg, b * 5000L, (b + 1) * 5000L).toDF(), b.toLong)
      }
      // small maxRecordsPerFile → several key-sorted base files per bucket
      Compactor.compact(table, Set(0, 1), maxRecordsPerFile = 500L)
      val m = table.manifest
      assert(m.files.forall(_.kind == FileEntry.BASE))
      assert(m.files.forall(f => f.minKey.isDefined && f.maxKey.isDefined))
      val oracle = WalGen.oracleState(cfg)
      val convId = oracle.keys.head._1
      val bucketFiles = m.files.count(_.bucket == table.bucketOf(convId, m.numBuckets))
      val pruned = table.filesForConversation(convId)
      assert(bucketFiles > 2, s"need multiple files per bucket for the test: $bucketFiles")
      assert(pruned.size < bucketFiles,
        s"no pruning: ${pruned.size} of $bucketFiles bucket files")
      // and the pruned read is correct
      val expect = oracle.collect { case ((c, t), e) if c == convId => t -> e.text }.toMap
      val got = table.readConversation(convId).collect()
        .map(r => r.getInt(1) -> r.getString(3)).toMap
      assert(got == expect)
      // unknown conversation: empty, no error
      assert(table.readConversation("conv-does-not-exist").count() == 0)
    } finally rmrf(dir)
  }
}
