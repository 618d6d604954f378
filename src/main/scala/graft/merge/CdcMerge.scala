package graft.merge

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructType}
import graft.lake.{CommitInfo, FileEntry, LakeTable, Manifest, SchemaEntry, SchemaReconciler}
import graft.model.Schemas._

/** The CDC apply: one micro-batch of change events → MERGE INTO the lake
  * table.
  *
  * Pipeline (all declarative DataFrame ops; Catalyst/Tungsten pick the
  * physical strategy):
  *   1. dedup within batch by key, keeping max LSN (window);
  *   2. determine affected buckets → read ONLY those buckets' files
  *      (manifest-level partition pruning);
  *   3. full-outer join current×updates on (conv_id, turn_idx) — the LSN
  *      comparison makes the apply order-insensitive and replay-idempotent;
  *      deletes become tombstones (kept so a stale lower-LSN update can
  *      never resurrect a deleted row);
  *   4. salted repartition on (bucket, hash(turn_idx) % salt) so one hot
  *      conversation fans out over `salt` writer tasks;
  *   5. write new bucket files to staging, collect per-file stats, adopt
  *      files, atomically commit the manifest.
  *
  * Exactly-once: `foreachBatch` may replay a batch after a crash; the commit
  * records the epoch and `apply` no-ops when `manifest.lastEpoch >= epoch`
  * (reference analogue: checksum-written-last commit protocol in owid-etl
  * `etl/steps/__init__.py:938-953` and the per-variable checksum
  * short-circuit `etl/grapher_import.py:287-289`).
  */
object CdcMerge {

  final case class Stats(
      epoch: Long, applied: Boolean, batchRows: Long, dedupedRows: Long,
      affectedBuckets: Int, wallMs: Long)

  /** Keep the latest change per key within the batch:
    * `row_number() over (partition by key order by lsn desc) = 1`.
    * Duplicate deliveries of the same (key, lsn) collapse to one row
    * (tie broken deterministically on op).
    */
  def dedupMaxLsn(batch: DataFrame): DataFrame = {
    val w = Window.partitionBy(KEY_COLS.map(col): _*)
      .orderBy(col("lsn").desc, col("op").desc)
    batch.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn")
  }

  /** Apply one change batch. `saltBuckets` bounds how many writer tasks a
    * single hot storage bucket fans out to.
    */
  def apply(table: LakeTable, batch: DataFrame, epoch: Long,
            saltBuckets: Int = 8): Stats = {
    val t0 = System.nanoTime()
    val spark = batch.sparkSession
    val m = table.manifest
    if (m.lastEpoch >= epoch) {
      // replayed micro-batch after restart → already committed, no-op
      return Stats(epoch, applied = false, -1, -1, 0, 0)
    }

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

    // ---- dedup + align ----
    val deduped = dedupMaxLsn(batch)
    val aligned = LakeTable.alignTo(deduped, StructType(
      StructType(Seq()).add("op", "string", nullable = false)
        .add("lsn", "long", nullable = false).fields ++ newUser.fields))
    val bucketed = aligned
      .withColumn("_bucket", table.bucketExpr(m.numBuckets))

    // ---- affected buckets (small driver-side set; numBuckets is bounded) --
    val affected = bucketed.select("_bucket").distinct()
      .collect().map(_.getInt(0)).toSet
    if (affected.isEmpty) {
      // empty batch: still commit the epoch so replay bookkeeping advances
      val m2 = m.copy(version = m.version + 1, lastEpoch = epoch,
        schemas = schemas2, currentSchemaId = schemaId2,
        lineage = (m.lineage :+ CommitInfo(m.version + 1, epoch, 0, Nil, m.maxLsn,
          (System.nanoTime() - t0) / 1000000, System.currentTimeMillis())).takeRight(1000))
      table.commit(m2, m.version)
      return Stats(epoch, applied = true, 0, 0, 0, (System.nanoTime() - t0) / 1000000)
    }

    // ---- current snapshot of affected buckets only ----
    val physTarget = graft.model.Schemas.physical(newUser)
    val current = LakeTable.alignTo(table.snapshotPhysical(Some(affected)), physTarget)

    // ---- merge: full-outer on key, LSN-gated ----
    val payload = newUser.fields.filterNot(f => KEY_COLS.contains(f.name))
    val u = bucketed.select(
      (KEY_COLS.map(col) ++
        payload.map(f => col(f.name).as(s"_u_${f.name}")) ++
        Seq(col("op").as("_u_op"), col("lsn").as("_u_lsn"))): _*)
    val joined = current.join(u, KEY_COLS, "full_outer")
    val newer = col("_u_lsn").isNotNull &&
      (col("_u_lsn") > coalesce(col(LSN_COL), lit(Long.MinValue)))
    val isDel = col("_u_op") === "D"
    val mergedCols =
      KEY_COLS.map(col) ++
      payload.map { f =>
        when(newer, when(isDel, lit(null).cast(f.dataType)).otherwise(col(s"_u_${f.name}")))
          .otherwise(col(f.name)).as(f.name)
      } ++ Seq(
        when(newer, col("_u_lsn")).otherwise(col(LSN_COL)).as(LSN_COL),
        when(newer, isDel).otherwise(coalesce(col(DELETED_COL), lit(false))).as(DELETED_COL)
      )
    val merged = joined.select(mergedCols.toSeq: _*)

    // ---- salted write: hot conversations split across salt sub-partitions -
    val staging = table.root.resolve(s"_staging/epoch-$epoch")
    deleteRecursively(staging)
    val salted = merged
      .withColumn("bucket", table.bucketExpr(m.numBuckets))
      .repartition(spark.sessionState.conf.numShufflePartitions,
        col("bucket"), pmod(xxhash64(col("turn_idx")), lit(saltBuckets.toLong)))
    salted.write.mode("overwrite").partitionBy("bucket").parquet(staging.toString)

    // ---- per-file stats from the staged footers (cheap: one long column) --
    val staged = spark.read.parquet(staging.toString)
    val stats = staged
      .groupBy(input_file_name().as("file"), col("bucket"))
      .agg(count(lit(1)).as("rows"), max(col(LSN_COL)).as("maxLsn"))
      .collect()

    // ---- adopt files + commit ----
    val newFiles = stats.map { r =>
      val uri = new java.net.URI(r.getString(0))
      val p = Paths.get(uri.getPath)
      val bucket = r.getInt(1)
      val rel = table.adoptStagedFile(p, bucket, epoch)
      FileEntry(rel, bucket, r.getLong(2), if (r.isNullAt(3)) -1L else r.getLong(3), schemaId2)
    }.toSeq
    deleteRecursively(staging)
    val carried = m.files.filterNot(f => affected.contains(f.bucket))
    val allFiles = carried ++ newFiles
    val batchMaxLsn = math.max(m.maxLsn, newFiles.map(_.maxLsn).foldLeft(-1L)(math.max))
    val wallMs = (System.nanoTime() - t0) / 1000000
    val dedupedRows = -1L // not separately counted in the hot path
    val m2 = m.copy(
      version = m.version + 1,
      lastEpoch = epoch,
      currentSchemaId = schemaId2,
      schemas = schemas2,
      files = allFiles,
      totalRows = allFiles.map(_.rows).sum,
      maxLsn = batchMaxLsn,
      lineage = (m.lineage :+ CommitInfo(m.version + 1, epoch,
        newFiles.map(_.rows).sum, affected.toSeq.sorted, batchMaxLsn, wallMs,
        System.currentTimeMillis())).takeRight(1000))
    table.commit(m2, m.version)
    Stats(epoch, applied = true, newFiles.map(_.rows).sum, dedupedRows,
      affected.size, wallMs)
  }

  private def deleteRecursively(p: java.nio.file.Path): Unit =
    if (Files.exists(p))
      Files.walk(p).iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
}
