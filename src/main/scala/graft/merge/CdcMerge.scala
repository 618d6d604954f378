package graft.merge

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import graft.lake.{CommitInfo, FileEntry, LakeTable, Manifest, SchemaEntry, SchemaReconciler}
import graft.model.Schemas._

/** The CDC apply: one micro-batch of change events → MERGE INTO the lake
  * table. Two physical strategies, both LSN-gated and replay-idempotent:
  *
  *  - **MergeOnRead** (default, write-optimized — the 10^10-events/day
  *    path): dedup the batch by max LSN, append it as per-bucket DELTA
  *    files, commit. O(batch) work per micro-batch, no join against the
  *    table. Readers resolve per-key max LSN across base+deltas;
  *    [[Compactor]] folds deltas back into base files when they pile up
  *    (amortized O(bucket)).
  *  - **CopyOnWrite** (read-optimized): full-outer join the deduped batch
  *    against the affected buckets' current state and rewrite those
  *    buckets — every read afterwards is a plain scan.
  *
  * This mirrors Iceberg's MOR/COW duality; the reference's analogue is the
  * threaded grapher upsert with per-variable checksum short-circuit
  * (owid-etl `etl/steps/__init__.py:887-936`, `etl/grapher_import.py:227-323`).
  *
  * Exactly-once: `foreachBatch` may replay a batch after a crash; commits
  * record the epoch and `apply` no-ops when `manifest.lastEpoch >= epoch`
  * (reference analogue: checksum-written-last commit protocol,
  * `etl/steps/__init__.py:938-953`).
  */
object CdcMerge {

  sealed trait Mode
  case object MergeOnRead extends Mode
  case object CopyOnWrite extends Mode

  /** `epoch` is the SOURCE epoch the caller presented; `effEpoch` the
    * internal epoch the files were actually recorded under (remapped to
    * stay monotone after fresh-checkpoint restarts) — manifest lookups by
    * epoch must use `effEpoch`, not `epoch`.
    */
  final case class Stats(
      epoch: Long, applied: Boolean, batchRows: Long,
      affectedBuckets: Int, wallMs: Long, effEpoch: Long = -1L)

  /** Keep the latest change per key within the batch:
    * `row_number() over (partition by key order by lsn desc) = 1`.
    * Duplicate deliveries of the same (key, lsn) collapse to one row.
    */
  def dedupMaxLsn(batch: DataFrame): DataFrame = {
    val w = Window.partitionBy(KEY_COLS.map(col): _*)
      .orderBy(col("lsn").desc, col("op").desc)
    batch.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn")
  }

  /** Same max-LSN-per-key semantics as [[dedupMaxLsn]], but as a hash
    * aggregation (`max_by(struct(*), struct(lsn, op))`): partial
    * aggregation combines duplicate keys map-side BEFORE the shuffle, so
    * the exchange carries only surviving rows — the hot-path choice for
    * merge-on-read. The ordering key is (lsn, op), matching the window
    * form's `lsn desc, op desc` tie-break EXACTLY: the synthetic WAL only
    * ever ties on identical duplicate deliveries, but the SQL MERGE
    * surface accepts arbitrary sources — two ops at one (key, lsn) must
    * resolve identically under MOR and CoW, and identically across
    * replays, or reconvergence breaks.
    */
  def dedupMaxLsnAgg(batch: DataFrame): DataFrame = {
    val all = struct(batch.columns.map(col).toIndexedSeq: _*)
    batch.groupBy(KEY_COLS.map(col): _*)
      .agg(max_by(all, struct(col("lsn"), col("op"))).as("__r"))
      .select(col("__r.*"))
  }

  private val trace = sys.env.contains("GRAFT_TRACE")
  @inline private def traced[T](label: String)(f: => T): T = {
    if (!trace) f
    else {
      val t = System.nanoTime()
      val r = f
      System.err.println(f"[merge-trace] $label: ${(System.nanoTime() - t) / 1e9}%.2fs")
      r
    }
  }

  def apply(table: LakeTable, batch: DataFrame, epoch: Long,
            saltBuckets: Int = 8, mode: Mode = MergeOnRead,
            streamId: String = "default",
            preCommit: () => Unit = () => ()): Stats = {
    val t0 = System.nanoTime()
    val spark = batch.sparkSession
    val m = table.manifest
    // Exactly-once is per (streamId, sourceEpoch), Delta-style: a replayed
    // micro-batch of the SAME stream no-ops; a DIFFERENT stream (e.g. a
    // restart with a fresh/deleted checkpoint resets foreachBatch epochs
    // to 0) must NOT be silently dropped — its batches are applied under a
    // remapped monotone internal epoch (content stays idempotent via the
    // per-key max-LSN gate).
    val sameStream = m.streamId == streamId
    if (sameStream && m.lastSourceEpoch >= epoch) {
      return Stats(epoch, applied = false, -1, 0, 0, effEpoch = m.lastEpoch)
    }
    if (!sameStream && m.streamId.nonEmpty && epoch <= m.lastEpoch)
      System.err.println(s"[cdc-merge] WARN: stream '$streamId' presented epoch " +
        s"$epoch <= lastEpoch ${m.lastEpoch} recorded for stream '${m.streamId}' " +
        "(fresh checkpoint against an existing table?) — applying under internal " +
        s"epoch ${m.lastEpoch + 1} instead of no-oping")
    val effEpoch = math.max(epoch, m.lastEpoch + 1)

    // ---- schema reconciliation (batch user-schema vs table schema) ----
    val incomingUser = StructType(batch.schema.fields.filterNot(f =>
      f.name == "op" || f.name == "lsn"))
    val currentUser = table.userSchema(m)
    val rec = SchemaReconciler.reconcile(currentUser, incomingUser) match {
      case Right(r) => r
      case Left(err) => throw new IllegalArgumentException(s"schema evolution rejected: $err")
    }
    val newUser = rec.schema
    val (schemas2, schemaId2) =
      if (rec.evolved) {
        val id = m.schemas.map(_.id).max + 1
        (m.schemas :+ SchemaEntry(id, newUser.toDDL), id)
      } else (m.schemas, m.currentSchemaId)

    // ---- dedup + align to physical shape ----
    val deduped = mode match {
      case MergeOnRead => dedupMaxLsnAgg(batch) // map-side partial combine
      case CopyOnWrite => dedupMaxLsn(batch)    // the canonical window form
    }
    val physTarget = physical(newUser)
    val asPhysical = LakeTable.alignTo(
      deduped
        .withColumn(LSN_COL, col("lsn"))
        .withColumn(DELETED_COL, col("op") === "D"),
      physTarget)

    // Unique per attempt: a second writer racing on the same effEpoch (e.g.
    // streaming writer + SQL MERGE on one table) must not share — and
    // deleteRecursively — this in-flight staging directory. Unique names
    // mean a CRASHED attempt's directory is never reclaimed by the retry,
    // so sweep abandoned staging dirs older than the grace window first
    // (in-flight writers are younger than it by construction).
    sweepStaleStaging(table)
    val staging = table.root.resolve(
      s"_staging/epoch-$effEpoch-${java.util.UUID.randomUUID().toString.take(8)}")

    val (newFiles, carried, affected) = mode match {
      case MergeOnRead =>
        // O(batch): write deduped rows as per-bucket DELTA files.
        // ADAPTIVE salting: one writer task per bucket keeps file count at
        // ~1 file/bucket/batch, but a bucket holding a hot conversation
        // (Zipf head) would straggle — so buckets whose PREVIOUS batch
        // share exceeded 2x fair share are split across `saltBuckets`
        // tasks on hash(turn_idx). Detection is free: per-bucket row
        // counts of the last delta epoch live in the manifest (one-batch
        // lag is fine for steady streams, and avoids a counting job +
        // full-batch persist).
        val lastDeltas = m.files.filter(f =>
          f.kind == FileEntry.DELTA && f.epoch == m.lastEpoch)
        val counts = lastDeltas.groupBy(_.bucket).view.mapValues(_.map(_.rows).sum).toMap
        val fair = math.max(1L, counts.values.sum / math.max(1, m.numBuckets))
        val hot = counts.filter(_._2 > 2 * fair).keys.toSeq
        val saltExpr =
          if (hot.isEmpty || saltBuckets <= 1) lit(0L)
          else when(col("bucket").isin(hot: _*),
            pmod(xxhash64(col("turn_idx")), lit(saltBuckets.toLong))).otherwise(lit(0L))
        val nParts = math.max(spark.sessionState.conf.numShufflePartitions,
          math.min(m.numBuckets + hot.size * (saltBuckets - 1), 4096))
        // sort within writer tasks: tight per-file (conv_id) ranges for
        // file-level pruning + better parquet encoding
        val salted = asPhysical
          .withColumn("bucket", table.bucketExpr(m.numBuckets))
          .repartition(nParts, col("bucket"), saltExpr)
          .sortWithinPartitions("bucket", "conv_id", "turn_idx")
        traced("delta-write")(
          salted.write.mode("overwrite").partitionBy("bucket").parquet(staging.toString))
        val files = traced("adopt-staged")(
          adoptStaged(table, spark, staging, effEpoch, schemaId2, FileEntry.DELTA, physTarget))
        (files, m.files, files.map(_.bucket).toSet)

      case CopyOnWrite =>
        val bucketed = asPhysical
          .withColumn("bucket", table.bucketExpr(m.numBuckets))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val aff0 = bucketed.select("bucket").distinct().collect().map(_.getInt(0)).toSet
        // close over shared-file coverage: after a REBUCKET, a pre-split
        // base file spans several current buckets — rewriting one of them
        // must rewrite the whole coverage component (the rewrite replaces
        // those files BY PATH below, so their sibling-bucket rows must be
        // in the output). Identity when no rebucket is in history.
        val aff = m.bucketClosure(aff0)
        if (aff.isEmpty) { bucketed.unpersist(); (Nil, m.files, Set.empty[Int]) }
        else {
          val inputPaths = m.filesForBuckets(aff).map(_.path).toSet
          val current = LakeTable.alignTo(table.snapshotPhysical(m, Some(aff)), physTarget)
          val payload = physTarget.fields.filterNot(f => KEY_COLS.contains(f.name))
          val u = bucketed.select(
            (KEY_COLS.map(col) ++ payload.map(f => col(f.name).as(s"_u_${f.name}"))): _*)
          val newer = col(s"_u_$LSN_COL").isNotNull &&
            (col(s"_u_$LSN_COL") > coalesce(col(LSN_COL), lit(Long.MinValue)))
          val mergedCols = KEY_COLS.map(col) ++ payload.map { f =>
            when(newer, col(s"_u_${f.name}")).otherwise(col(f.name)).as(f.name)
          }
          val merged = current.join(u, KEY_COLS, "full_outer").select(mergedCols.toSeq: _*)
          val salted = merged
            .withColumn("bucket", table.bucketExpr(m.numBuckets))
            .repartition(spark.sessionState.conf.numShufflePartitions,
              col("bucket"), pmod(xxhash64(col("turn_idx")), lit(saltBuckets.toLong)))
          salted.write.mode("overwrite").partitionBy("bucket").parquet(staging.toString)
          bucketed.unpersist()
          val files = adoptStaged(table, spark, staging, effEpoch, schemaId2, FileEntry.BASE, physTarget)
          (files, m.files.filterNot(f => inputPaths.contains(f.path)), aff)
        }
    }
    deleteRecursively(staging)

    // Commit with REBASE-on-conflict: an async compaction may win the CAS
    // between our manifest read and commit. A merge-on-read delta append is
    // always rebase-safe (it only ADDS files); the rebase re-reads the
    // current manifest, re-derives the carried file list, and retries.
    // Copy-on-write rewrote its buckets' contents from a snapshot — the
    // rebase is sound iff the concurrent commit touched NONE of those
    // buckets (a compactor folding OTHER buckets): our rewritten buckets'
    // inputs are then byte-identical under the new manifest, so we carry
    // its other-bucket files and retry. Any change WITHIN a rewritten
    // bucket invalidates the snapshot → loud single-committer abort.
    preCommit() // test seam: inject a concurrent commit into the window
    var base = m
    var attempt = 0
    while (true) {
      val carriedNow =
        if (base eq m) carried
        else mode match {
          case MergeOnRead => base.files
          case CopyOnWrite =>
            // a REBUCKET between our manifest read and commit changes the
            // coverage arithmetic under us — the rewrite's bucket closure
            // was computed at the old depth; abort rather than reason
            // about a moving space (the merge is retryable from scratch)
            if (base.numBuckets != m.numBuckets) throw new IllegalStateException(
              s"concurrent REBUCKET (${m.numBuckets} -> ${base.numBuckets} buckets) " +
              "during a copy-on-write merge — re-run the merge")
            val beforeMine = Manifest.coveringFiles(m.files, m.numBuckets, affected)
              .map(_.path).toSet
            val nowMine = Manifest.coveringFiles(base.files, base.numBuckets, affected)
              .map(_.path).toSet
            if (beforeMine == nowMine) base.files.filterNot(f => nowMine.contains(f.path))
            else throw new IllegalStateException(
              "concurrent commit touched copy-on-write bucket(s) " +
              s"${affected.toSeq.sorted.mkString(",")} — the rewrite's snapshot is stale; " +
              "CoW requires a single committer for overlapping buckets")
        }
      // a MOR delta append rebasing over a concurrent REBUCKET: our files
      // were routed at the OLD depth — stamp them so coverage reads them
      // correctly in the new space (the rebucket stamped only the files
      // in ITS manifest; ours were in flight)
      val newFilesNow =
        if ((base ne m) && base.numBuckets != m.numBuckets)
          newFiles.map(f => if (f.writePids.isEmpty) f.copy(writePids = Some(m.numBuckets)) else f)
        else newFiles
      require(base.schemas == m.schemas && base.currentSchemaId == m.currentSchemaId,
        "concurrent schema change during merge")
      // STRICT < on rebase: a concurrent commit that already recorded
      // exactly effEpoch would otherwise duplicate the internal epoch,
      // breaking changelog monotonicity (changesBetween filters
      // `epoch > fromEpoch`). Compactions never advance lastEpoch, so
      // rebasing over a compactor still passes.
      require((base eq m) || base.lastEpoch < effEpoch,
        s"concurrent WRITER detected (lastEpoch ${base.lastEpoch} >= epoch $effEpoch " +
          "after rebase) — one writer per table")
      val allFiles = carriedNow ++ newFilesNow
      val batchMaxLsn = math.max(base.maxLsn, newFiles.map(_.maxLsn).foldLeft(-1L)(math.max))
      val wallMs = (System.nanoTime() - t0) / 1000000
      val m2 = base.copy(
        version = base.version + 1,
        lastEpoch = effEpoch,
        streamId = streamId,
        lastSourceEpoch = epoch,
        currentSchemaId = schemaId2,
        schemas = schemas2,
        files = allFiles,
        totalRows = allFiles.map(_.rows).sum, // physical rows (deltas may shadow)
        maxLsn = batchMaxLsn,
        lineage = (base.lineage :+ CommitInfo(base.version + 1, effEpoch,
          newFiles.map(_.rows).sum, affected.toSeq.sorted, batchMaxLsn, wallMs,
          System.currentTimeMillis())).takeRight(1000))
      try {
        table.commit(m2, base.version)
        return Stats(epoch, applied = true, newFiles.map(_.rows).sum, affected.size, wallMs, effEpoch)
      } catch {
        // CAS lost → re-enter the loop; carriedNow then rebases (MOR) or
        // raises the explicit single-committer error (CoW)
        case _: IllegalArgumentException if attempt < 10 =>
          attempt += 1
          base = table.manifest
      }
    }
    throw new IllegalStateException(
      s"commit for epoch $effEpoch lost the CAS race 10 times — a concurrent writer is live")
  }

  /** Collect per-file stats straight from the parquet FOOTERS (row counts
    * + `_lsn` column min/max statistics Spark already wrote, plus
    * [[graft.lake.StatsHarvest]] per-column data-skipping bounds for the
    * USER columns of `statsSchema`) — a driver-side metadata read, not a
    * Spark job. Then move files into the table and return their entries.
    * `statsSchema` is the physical schema the staged files were written
    * under (passed explicitly: on a schema-evolving write its id is not
    * committed yet).
    */
  private[merge] def adoptStaged(table: LakeTable, spark: SparkSession,
                                 staging: java.nio.file.Path, epoch: Long,
                                 schemaId: Int, kind: String,
                                 statsSchema: StructType): Seq[FileEntry] = {
    // Always called right after a SUCCESSFUL write to `staging` — a missing
    // directory is never "no output" (an empty result still leaves the dir
    // + _SUCCESS); it means something deleted the staged data between write
    // and adopt (e.g. a mis-tuned staging GC). Committing Nil here would
    // silently drop the batch — or, in the compactor, remove a bucket's
    // files with no replacement. Fail loudly instead.
    if (!Files.exists(staging))
      throw new IllegalStateException(
        s"staged output vanished before adoption: $staging — " +
        "was the staging GC grace window set below the write duration?")
    val bucketRe = ".*bucket=(\\d+).*".r
    // walk stream closed eagerly: adoption runs on EVERY commit, and an
    // unclosed directory stream holds its fd until process exit — a
    // months-long stream of micro-batches would exhaust the fd table
    val parquetFiles = {
      val s = Files.walk(staging)
      try s.iterator().asScala
        .filter(p => p.getFileName.toString.endsWith(".parquet")).toSeq
      finally s.close()
    }
    val conf = spark.sessionState.newHadoopConf()
    // Footer reads are driver-side metadata I/O; done serially they become
    // a per-batch serial stage at 10k staged files — run them on a bounded
    // pool (ordering preserved by indexing futures).
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.max(1, math.min(16, parquetFiles.size)))
    // data-skipping stats: user columns + _deleted (the pushed !_deleted
    // filter then skips all-tombstone base files); _lsn stays out — its
    // watermark already has a dedicated manifest field (maxLsn)
    val userStats = StructType(statsSchema.fields.filterNot(_.name == LSN_COL))
    try parquetFiles.map(p => pool.submit(adoptOne(table, conf, bucketRe, epoch, schemaId, kind, userStats, p)))
      .map(_.get())
    finally pool.shutdown()
  }

  private def adoptOne(table: LakeTable, conf: org.apache.hadoop.conf.Configuration,
                       bucketRe: scala.util.matching.Regex, epoch: Long, schemaId: Int,
                       kind: String, statsSchema: StructType, p: java.nio.file.Path)
      : java.util.concurrent.Callable[FileEntry] = () => {
      val bucket = p.getParent.toString match {
        case bucketRe(b) => b.toInt
        case other => throw new IllegalStateException(s"no bucket dir in $other")
      }
      val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(p.toUri), conf)
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      val (rows, maxLsn, minKey, maxKey, colStats) = try {
        val blocks = reader.getFooter.getBlocks.asScala
        val rows = blocks.map(_.getRowCount).sum
        val maxLsn = blocks.flatMap { b =>
          b.getColumns.asScala.find(_.getPath.toDotString == LSN_COL)
            .flatMap(c => Option(c.getStatistics))
            .collect { case s if !s.isEmpty && s.hasNonNullValue =>
              s.genericGetMax.asInstanceOf[java.lang.Long].longValue() }
        }.foldLeft(-1L)(math.max)
        val keyStats = blocks.flatMap { b =>
          b.getColumns.asScala.find(_.getPath.toDotString == "conv_id")
            .flatMap(c => Option(c.getStatistics))
            .collect { case s if !s.isEmpty && s.hasNonNullValue =>
              (s.minAsString, s.maxAsString) }
        }
        val minKey = if (keyStats.isEmpty) None else Some(keyStats.map(_._1).min)
        val maxKey = if (keyStats.isEmpty) None else Some(keyStats.map(_._2).max)
        val colStats = graft.lake.StatsHarvest.fromBlocks(blocks.toSeq, statsSchema)
        (rows, maxLsn, minKey, maxKey, colStats)
      } finally reader.close()
      val bytes = Files.size(p)
      val rel = table.adoptStagedFile(p, bucket, epoch, kind)
      FileEntry(rel, bucket, rows, maxLsn, schemaId, kind, epoch, minKey, maxKey,
        colStats = colStats, bytes = Some(bytes))
  }

  private[graft] def deleteRecursively(p: java.nio.file.Path): Unit =
    if (Files.exists(p)) {
      val s = Files.walk(p)
      try s.iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
      finally s.close()
    }

  /** GC abandoned per-attempt staging dirs (a merge that crashed mid-write
    * leaves `_staging/epoch-N-<uuid>` behind and no retry ever reuses the
    * name). Staleness is judged by the SUBTREE's max mtime, not the top
    * dir's: a running parquet job touches only `_temporary/` and bucket
    * subdirectories, so the top-level dir's mtime is its creation time and
    * a long rewrite (> grace) would be swept mid-flight. A subtree with no
    * write activity for `olderThanMs` cannot belong to a live writer short
    * of a task stalled a full hour between file creations (raise the grace
    * if that is plausible in your environment).
    */
  private[graft] def sweepStaleStaging(table: LakeTable,
                                       olderThanMs: Long = 3600000L): Unit = {
    val dir = table.root.resolve("_staging")
    if (!Files.exists(dir)) return
    val cutoff = System.currentTimeMillis() - olderThanMs
    val kids = Files.list(dir)
    try kids.iterator().asScala.toSeq.foreach { d =>
      val stale = try {
        val walk = Files.walk(d)
        try walk.iterator().asScala
          .map(p => try Files.getLastModifiedTime(p).toMillis catch { case _: Throwable => Long.MaxValue })
          .max < cutoff
        finally walk.close()
      } catch { case _: Throwable => false }
      if (stale) try deleteRecursively(d) catch { case _: Throwable => () }
    } finally kids.close()
  }
}

/** Initial bulk load (bootstrap): write a SNAPSHOT DataFrame straight to
  * key-sorted BASE files — the "load the 100 TB history once, then start
  * the binlog tail" path. One pass: no per-key dedup window (the input is
  * a snapshot, at most one row per key), no merge against existing state
  * (the table must be empty). Rows may carry a per-key `lsn` column (the
  * key's last-applied LSN from the upstream snapshot) so the subsequent
  * stream's LSN gate composes correctly; absent that, pass `defaultLsn`.
  */
object BulkLoad {

  def load(table: LakeTable, snapshot: DataFrame, defaultLsn: Long = 0L,
           maxRecordsPerFile: Long = 0L, validateUniqueKeys: Boolean = true,
           saltBuckets: Int = 1): CdcMerge.Stats = {
    val t0 = System.nanoTime()
    val spark = snapshot.sparkSession
    val m = table.manifest
    require(m.files.isEmpty, "bulk load requires an EMPTY table (bootstrap only)")
    if (validateUniqueKeys) {
      // opt-out for huge loads: this is a full shuffle purely for the check
      val dups = snapshot.groupBy(KEY_COLS.map(col): _*)
        .count().filter(col("count") > 1).count()
      require(dups == 0, s"bulk-load input is not a snapshot: $dups duplicate keys")
    }
    val userDf =
      if (snapshot.columns.contains("lsn")) snapshot
      else snapshot.withColumn("lsn", lit(defaultLsn))
    val physTarget = physical(StructType(table.userSchema(m).fields))
    val asPhysical = LakeTable.alignTo(
      userDf.withColumn(LSN_COL, col("lsn")).withColumn(DELETED_COL, lit(false)),
      physTarget)
    val staging = table.root.resolve("_staging/bootstrap")
    CdcMerge.deleteRecursively(staging)
    val salt =
      if (saltBuckets <= 1) lit(0L)
      else pmod(xxhash64(col("turn_idx")), lit(saltBuckets.toLong))
    asPhysical
      .withColumn("bucket", table.bucketExpr(m.numBuckets))
      .repartition(math.max(spark.sessionState.conf.numShufflePartitions,
        m.numBuckets * saltBuckets), col("bucket"), salt)
      .sortWithinPartitions("bucket", "conv_id", "turn_idx")
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy("bucket").parquet(staging.toString)
    val newFiles = CdcMerge.adoptStaged(table, spark, staging, epoch = 0L,
      m.currentSchemaId, FileEntry.BASE, physTarget)
    CdcMerge.deleteRecursively(staging)
    val maxLsn = newFiles.map(_.maxLsn).foldLeft(-1L)(math.max)
    val wallMs = (System.nanoTime() - t0) / 1000000
    val m2 = m.copy(
      version = m.version + 1,
      lastEpoch = 0L,
      streamId = "bootstrap",
      lastSourceEpoch = 0L,
      files = newFiles,
      totalRows = newFiles.map(_.rows).sum,
      maxLsn = maxLsn,
      lineage = Seq(CommitInfo(m.version + 1, 0L, newFiles.map(_.rows).sum,
        newFiles.map(_.bucket).distinct.sorted, maxLsn, wallMs,
        System.currentTimeMillis())))
    table.commit(m2, m.version)
    CdcMerge.Stats(0L, applied = true, newFiles.map(_.rows).sum,
      newFiles.map(_.bucket).toSet.size, wallMs, effEpoch = 0L)
  }
}

/** Folds delta files back into per-key-resolved base files, bucket by
  * bucket — the amortized half of merge-on-read. Tombstones are KEPT in
  * the compacted base (a resurrect-guard for arbitrarily late stale
  * updates); `dropTombstones` exists for terminal compactions where the
  * upstream WAL is known to be fully drained.
  */
object Compactor {

  final case class Result(compactedBuckets: Seq[Int], wallMs: Long)

  /** Compact every bucket whose deltas span >= `deltaThreshold` DISTINCT
    * epochs (not raw file count — a salted hot bucket writes several delta
    * files per batch and must not trigger compaction more often for it).
    */
  def compactIfNeeded(table: LakeTable, deltaThreshold: Int = 4,
                      dropTombstones: Boolean = false): Option[Result] = {
    val due = dueBuckets(table, deltaThreshold)
    if (due.isEmpty) None else Some(compact(table, due.toSet, dropTombstones))
  }

  /** Buckets whose deltas span >= `deltaThreshold` distinct epochs. */
  def dueBuckets(table: LakeTable, deltaThreshold: Int): Seq[Int] =
    table.manifest.files.groupBy(_.bucket).collect {
      case (b, fs) if fs.filter(_.kind == FileEntry.DELTA)
        .map(_.epoch).distinct.size >= deltaThreshold => b
    }.toSeq.sorted

  def compact(table: LakeTable, buckets: Set[Int],
              dropTombstones: Boolean = false,
              maxRecordsPerFile: Long = 0L,
              clusterBy: Option[DataFrame => org.apache.spark.sql.Column] = None): Result = {
    val t0 = System.nanoTime()
    val spark = table.snapshot().sparkSession
    val m = table.manifest
    // close over shared-file coverage (identity without a REBUCKET in
    // history): a pre-split file spans several current buckets, and its
    // replacement-by-path below means its sibling buckets rewrite too
    val closed = m.bucketClosure(buckets)
    val inputPaths = m.filesForBuckets(closed).map(_.path).toSet
    val resolved1 = table.snapshotPhysical(m, Some(closed)) // max-LSN resolved, tombstones kept
    val resolved2 = if (dropTombstones)
      resolved1.filter(!col(graft.model.Schemas.DELETED_COL)) else resolved1
    // a clusterBy (zorder) computes quantile boundaries with ONE
    // approxQuantile job over `resolved` BEFORE the rewrite reads it again
    // — persist so the MOR resolve + scan run once, not twice
    val resolved = if (clusterBy.isDefined)
      resolved2.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    else resolved2
    val staging = table.root.resolve(s"_staging/compact-${m.version + 1}")
    CdcMerge.deleteRecursively(staging)
    // Default layout = key-sorted bases: disjoint per-file conv_id ranges
    // inside a bucket (with maxRecordsPerFile > 0) → manifest-level file
    // pruning for single-conversation reads. `clusterBy` overrides the
    // intra-bucket order (e.g. a z-value for multi-column data skipping;
    // see [[zorder]]) — point lookups then lean on blooms instead of
    // minKey/maxKey tightness.
    // The cluster value is MATERIALIZED as a column before the sort and
    // sorted as a plain attribute: SortExec's generated ordering evaluates
    // sort-key EXPRESSIONS per comparison (n·log n times), so sorting
    // directly on the z expression — a 2^bits-step HOF per evaluation —
    // multiplies its cost ~2·log₂(rows)×. Measured on a 100k-row zorder
    // rewrite: 40.6 s sorting on the expression vs ~1 s on the column.
    val bucketed = resolved.withColumn("bucket", table.bucketExpr(m.numBuckets))
    val (toSort, sortCols, dropAfter) = clusterBy match {
      case Some(mk) => (bucketed.withColumn("__cluster", mk(resolved)),
        Seq(col("bucket"), col("__cluster")), Seq("__cluster"))
      case None => (bucketed, Seq(col("bucket"), col("conv_id"), col("turn_idx")), Nil)
    }
    toSort
      .repartition(spark.sessionState.conf.numShufflePartitions, col("bucket"))
      .sortWithinPartitions(sortCols: _*)
      .drop(dropAfter: _*)
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy("bucket").parquet(staging.toString)
    if (clusterBy.isDefined) resolved.unpersist()
    val newFiles = CdcMerge.adoptStaged(table, spark, staging, m.lastEpoch,
      m.currentSchemaId, FileEntry.BASE,
      graft.model.Schemas.physical(table.userSchema(m)))
    CdcMerge.deleteRecursively(staging)
    val carried = m.files.filterNot(f => inputPaths.contains(f.path))
    val allFiles = carried ++ newFiles
    val wallMs = (System.nanoTime() - t0) / 1000000
    val m2 = m.copy(
      version = m.version + 1,
      files = allFiles,
      totalRows = allFiles.map(_.rows).sum,
      lineage = (m.lineage :+ CommitInfo(m.version + 1, m.lastEpoch,
        newFiles.map(_.rows).sum, closed.toSeq.sorted, m.maxLsn, wallMs,
        System.currentTimeMillis())).takeRight(1000))
    table.commit(m2, m.version)
    Result(closed.toSeq.sorted, wallMs)
  }

  /** Z-order the given buckets (default: all): a [[compact]] whose
    * intra-bucket layout is the Morton interleave of `cols`' quantile
    * bins ([[graft.lake.ZOrder]]) instead of the key sort — files then
    * carry tight min/max bounds on EVERY listed column, which is what
    * makes [[graft.lake.DataSkipping]] effective for multi-dimensional
    * predicates (e.g. ts ranges over transcripts). Buckets stay the
    * partition unit, so key-hash routing, MOR resolution, and all
    * concurrency rules are untouched; within a rewritten bucket the
    * (minKey, maxKey) ranges get looser — point lookups lean on blooms
    * (OPTIMIZE ... BLOOM) instead.
    *
    * `maxRecordsPerFile <= 0` auto-sizes to ~8 files per bucket (real
    * deployments should pass an explicit value tuned to row width — the
    * lever that trades file count against skip granularity).
    */
  def zorder(table: LakeTable, cols: Seq[String],
             buckets: Option[Set[Int]] = None,
             maxRecordsPerFile: Long = 0L,
             dropTombstones: Boolean = false): Result = {
    val m = table.manifest
    val bs = buckets.getOrElse(m.files.map(_.bucket).toSet)
    if (bs.isEmpty) return Result(Nil, 0L)
    val mrf =
      if (maxRecordsPerFile > 0L) maxRecordsPerFile
      else math.max(1L, m.totalRows / math.max(1, bs.size) / 8L)
    compact(table, bs, dropTombstones, mrf,
      clusterBy = Some(df => graft.lake.ZOrder.zColumn(df, cols)))
  }

  /** Compaction with OPTIMISTIC-CONCURRENCY commit — the maintenance-thread
    * form: the (slow) bucket rewrite runs off the streaming hot path while
    * writers keep committing; the commit then validates-and-retries
    * Iceberg-style.
    *
    * Rebase rules (per compacted bucket, against the pinned manifest m0):
    *  - files ADDED since the pin (a streaming writer's new deltas) are
    *    CARRIED alongside the rewritten base — correct under merge-on-read
    *    because resolve takes the per-key max LSN: the compacted base holds
    *    exactly the pinned files' winners (tombstones kept), and any
    *    concurrent delta rides on top exactly as it did before. Without
    *    this, a steady stream touching every bucket invalidates EVERY
    *    compaction and delta depth grows with stream age (measured: depth
    *    64 after 64 rapid batches under the abandon-on-any-write rule).
    *  - files REMOVED since the pin (a CoW rewrite or another compactor
    *    folded the bucket) → the rewrite is stale → staged output is
    *    abandoned and None returned.
    *  - `dropTombstones` requires quiescence: folding away a tombstone
    *    while a concurrent (late, stale) update could still arrive would
    *    resurrect the deleted key — any post-pin file in a compacted
    *    bucket aborts a tombstone-dropping compaction.
    * `preCommit` is a test seam to inject a concurrent commit into the
    * validation window deterministically.
    */
  def compactConcurrent(table: LakeTable, buckets: Set[Int],
                        dropTombstones: Boolean = false,
                        maxRecordsPerFile: Long = 0L,
                        maxRetries: Int = 20,
                        preCommit: () => Unit = () => ()): Option[Result] = {
    val t0 = System.nanoTime()
    val spark = table.snapshot().sparkSession
    val m0 = table.manifest
    // closure over shared-file coverage (identity without a REBUCKET in
    // history); the rewrite region is fixed at the PIN's depth — post-pin
    // files are never coarser, so the closed region cannot grow under us
    val closed = m0.bucketClosure(buckets)
    val inputFiles = m0.filesForBuckets(closed).map(_.path).toSet
    if (inputFiles.isEmpty) return None
    val resolved0 = // resolve from the PINNED manifest (not _current: a
      // concurrent writer must not change our input between pin and plan)
      table.snapshotPhysical(m0, Some(closed))
    val resolved = if (dropTombstones)
      resolved0.filter(!col(graft.model.Schemas.DELETED_COL)) else resolved0
    val staging = table.root.resolve(
      s"_staging/compact-c${m0.version}-${java.util.UUID.randomUUID().toString.take(8)}")
    CdcMerge.deleteRecursively(staging)
    resolved
      .withColumn("bucket", table.bucketExpr(m0.numBuckets))
      .repartition(spark.sessionState.conf.numShufflePartitions, col("bucket"))
      .sortWithinPartitions("bucket", "conv_id", "turn_idx")
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy("bucket").parquet(staging.toString)
    val newFiles = CdcMerge.adoptStaged(table, spark, staging, m0.lastEpoch,
      m0.currentSchemaId, FileEntry.BASE,
      graft.model.Schemas.physical(table.userSchema(m0)))
    CdcMerge.deleteRecursively(staging)
    preCommit()
    var attempt = 0
    while (attempt < maxRetries) {
      val cur = table.manifest
      // the rewrite region, re-indexed under `cur`: f (depth d, bucket b)
      // intersects {t : t mod m0.numBuckets ∈ closed} iff some closed
      // bucket shares b's residue at gcd(d, m0.numBuckets) — depths form
      // a divisibility chain, so the gcd is simply the coarser of the two
      // (this stays correct across a concurrent REBUCKET)
      def inRegion(f: FileEntry): Boolean = {
        val g = java.math.BigInteger.valueOf(cur.fileDepth(f))
          .gcd(java.math.BigInteger.valueOf(m0.numBuckets)).intValueExact()
        val r = java.lang.Math.floorMod(f.bucket, g)
        closed.exists(c => java.lang.Math.floorMod(c, g) == r)
      }
      val curPaths = cur.files.map(_.path).toSet
      val addedSincePin = cur.files.filter(f =>
        inRegion(f) && !inputFiles.contains(f.path))
      val stale = !inputFiles.subsetOf(curPaths) || // pinned input vanished → bucket was rewritten
        (dropTombstones && addedSincePin.nonEmpty)  // tombstone-drop needs quiescence
      if (stale) {
        newFiles.foreach(f => java.nio.file.Files.deleteIfExists(table.root.resolve(f.path)))
        return None
      }
      // rebasing over a concurrent REBUCKET: our bases were written at the
      // pin's depth — stamp them for the new space (the rebucket stamped
      // only the files in ITS manifest)
      val newFilesNow =
        if (cur.numBuckets != m0.numBuckets)
          newFiles.map(f => if (f.writePids.isEmpty) f.copy(writePids = Some(m0.numBuckets)) else f)
        else newFiles
      val allFiles = cur.files.filterNot(f => inputFiles.contains(f.path)) ++ newFilesNow
      val wallMs = (System.nanoTime() - t0) / 1000000
      val m2 = cur.copy(
        version = cur.version + 1,
        files = allFiles,
        totalRows = allFiles.map(_.rows).sum,
        lineage = (cur.lineage :+ CommitInfo(cur.version + 1, cur.lastEpoch,
          newFiles.map(_.rows).sum, closed.toSeq.sorted, cur.maxLsn, wallMs,
          System.currentTimeMillis())).takeRight(1000))
      try {
        table.commit(m2, cur.version)
        return Some(Result(closed.toSeq.sorted, wallMs))
      } catch {
        case _: IllegalArgumentException => attempt += 1 // CAS lost; rebase + retry
      }
    }
    newFiles.foreach(f => java.nio.file.Files.deleteIfExists(table.root.resolve(f.path)))
    None
  }
}
