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

  test("per-bucket merge-on-read: one delta file does not shuffle clean buckets") {
    import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Window => LWindow}
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    def scannedFiles(p: LogicalPlan): Seq[String] = p.collectLeaves().flatMap {
      case l: LogicalRelation => l.relation match {
        case fs: HadoopFsRelation => fs.location.inputFiles.toSeq
        case _ => Nil
      }
      case _ => Nil
    }
    val dir = tmpDir("mor")
    val cfg = WalGen.Config(numEvents = 8000, numConvs = 200, maxTurns = 20)
    try {
      val table = LakeTable.create(spark, s"$dir/t", Schemas.transcript, numBuckets = 4)
      CdcMerge.apply(table, WalGen.events(spark, cfg, 0, 8000).toDF(), 0L)
      Compactor.compact(table, Set(0, 1, 2, 3)) // all buckets now BASE-only
      // one more tiny batch touching a single conversation → delta in ONE bucket
      val ev = WalGen.events(spark, cfg, 0, 200).toDF()
      val cid = ev.select("conv_id").first().getString(0)
      CdcMerge.apply(table, ev.filter(col("conv_id") === cid), 1L)
      val m = table.manifest
      val dirtyBuckets = m.files.filter(_.kind == FileEntry.DELTA).map(_.bucket).toSet
      assert(dirtyBuckets.size == 1, s"expected one dirty bucket, got $dirtyBuckets")
      val df = table.snapshotPhysical(None)
      val plan = df.queryExecution.optimizedPlan
      val windows = plan.collect { case w: LWindow => w }
      assert(windows.size == 1, s"expected exactly one max-LSN window, got ${windows.size}")
      val windowed = scannedFiles(windows.head)
      val all = scannedFiles(plan)
      val dirty = dirtyBuckets.head
      assert(windowed.nonEmpty && windowed.forall(_.contains(s"bucket=$dirty")),
        s"window must only read the dirty bucket; read: ${windowed.mkString(",")}")
      assert(all.size > windowed.size, "clean buckets must be read OUTSIDE the window")
      // and the per-bucket split is still correct
      val dupKeys = table.snapshot().groupBy("conv_id", "turn_idx")
        .count().filter(col("count") > 1).count()
      assert(dupKeys == 0)
      assert(table.snapshot().count() > 0)
    } finally rmrf(dir)
  }
}
