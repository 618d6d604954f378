package graft.merge

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.lake.LakeTable

/** Initial-snapshot bootstrap with a consistent cutover to the change
  * stream — the standard "full load, then tail the binlog from the load's
  * LSN" pattern every CDC deployment starts with.
  *
  * Reference analogue: owid-etl's first full run of a step materializes the
  * whole table and subsequent runs only fire when the input checksum moves
  * (`etl/steps/__init__.py:887-936`); here the "first full run" is a bulk
  * snapshot load consistent at one WAL position and the "subsequent runs"
  * are the tailed change events strictly after it.
  *
  * == Why the gate is not optional ==
  *
  * A snapshot consistent at LSN `S` carries NO tombstones: a key deleted at
  * `D <= S` is simply absent. The normal merge path survives duplicate /
  * ancient re-deliveries because tombstones are kept through compaction
  * (`Compactor` resurrect-guard), but after a bootstrap that guard does not
  * exist for pre-`S` deletes — a re-delivered insert with
  * `lsn < D <= S` would silently resurrect the deleted key. Filtering every
  * applied batch to `lsn > S` restores the invariant exactly: table state
  * already reflects ALL events with `lsn <= S` (that is what "consistent at
  * S" means), so the gate drops only events the snapshot has absorbed. The
  * gate composes with (does not replace) the per-key max-LSN dedup.
  *
  * The gate is a pushdown-friendly range predicate on the batch (a plain
  * `Filter` above the source scan), so at 10^10 events it costs nothing —
  * replayed prefixes are skipped at scan time, not resolved per key.
  */
object Bootstrap {

  /** Bulk-load `snapshot` (consistent at WAL position `snapshotLsn`) into
    * the empty `table`, stamping the table's LSN watermark to `snapshotLsn`
    * even where per-row LSNs lag it — the watermark asserts "everything
    * `<= S` is reflected", including row-less deletes.
    *
    * If `snapshot` carries a per-key `lsn` column it is preserved (each
    * row's LSN must be `<= snapshotLsn`); otherwise every row is stamped
    * with `snapshotLsn` itself.
    */
  def load(table: LakeTable, snapshot: DataFrame, snapshotLsn: Long,
           maxRecordsPerFile: Long = 0L, validateUniqueKeys: Boolean = true,
           saltBuckets: Int = 1): CdcMerge.Stats = {
    if (validateUniqueKeys && snapshot.columns.contains("lsn")) {
      val over = snapshot.filter(col("lsn") > snapshotLsn).limit(1).count()
      require(over == 0,
        s"snapshot row carries lsn > snapshotLsn=$snapshotLsn — the snapshot is not consistent at that position")
    }
    val stats = BulkLoad.load(table, snapshot, defaultLsn = snapshotLsn,
      maxRecordsPerFile = maxRecordsPerFile,
      validateUniqueKeys = validateUniqueKeys, saltBuckets = saltBuckets)
    // Raise the manifest watermark to the snapshot position (BulkLoad set
    // it to the max per-row LSN, which lags S when the newest changes were
    // deletes). Metadata-only commit; rereads nothing.
    val m = table.manifest
    if (m.maxLsn < snapshotLsn)
      table.commit(m.copy(version = m.version + 1, maxLsn = snapshotLsn,
        lineage = m.lineage :+ graft.lake.CommitInfo(m.version + 1, m.lastEpoch,
          0L, Nil, snapshotLsn, 0L, System.currentTimeMillis())), m.version)
    stats
  }

  /** The cutover filter: keep only events strictly after the snapshot
    * position. Apply to every batch of the tailed stream.
    */
  def cutoverGate(batch: DataFrame, snapshotLsn: Long): DataFrame =
    batch.filter(col("lsn") > snapshotLsn)

  /** Loud gap check for the first tailed batch: a WAL tail that starts
    * ABOVE the snapshot position has lost events (`S < lsn < firstLsn`
    * can never arrive) and the table would diverge silently. LSNs need not
    * be dense, so the only safe requirement is that the tail's first
    * delivered position does not exceed the first position the snapshot
    * has not absorbed… callers with dense LSNs get an exact check.
    */
  def verifyNoGap(firstBatchMinLsn: Long, snapshotLsn: Long): Unit =
    require(firstBatchMinLsn <= snapshotLsn + 1,
      s"cutover gap: stream starts at lsn=$firstBatchMinLsn but snapshot only covers <= $snapshotLsn; " +
        s"events in (${snapshotLsn}, $firstBatchMinLsn) are lost — re-snapshot or rewind the tail")
}
