package graft.stream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.lake.LakeTable
import graft.model.Schemas
import graft.ops.IncrementalDedup

/** Live near-duplicate maintenance over a lake table's change feed — the
  * engine-level wiring of [[ChangelogFollower]] × [[IncrementalDedup]]:
  * every committed version window is consumed as (tombstones → store
  * removal, upserts → latest-per-key resolve → signature refresh), and
  * the freshly emitted pairs are appended to a parquet log partitioned by
  * the window's end version (so a downstream consumer can itself read
  * the pair log incrementally, by version).
  *
  * Work per window is O(changed turns) on the expensive legs (see
  * IncrementalDedup); the follower holds a durable [[LakeTable.pin]] so
  * vacuum never reclaims an unconsumed window, and the pin also marks
  * where to resume after a restart (`table.pins(pinName)`).
  */
object DedupMaintenance {

  final class Handle private[DedupMaintenance] (
      follower: ChangelogFollower.Handle,
      storeRef: java.util.concurrent.atomic.AtomicReference[DataFrame],
      processedRef: java.util.concurrent.atomic.AtomicLong) extends AutoCloseable {
    /** The current signature store view (checkpointed; safe to query). */
    def store: DataFrame = storeRef.get()
    /** Last fully processed table version. */
    def processedVersion: Long = processedRef.get()
    def failure: Option[Throwable] = follower.failure
    override def close(): Unit = follower.close()
  }

  private type AtomicLong = java.util.concurrent.atomic.AtomicLong

  /** Start maintenance. `pairsDir`: parquet pair log root (one
    * `to_version=N` partition per consumed window). `fromVersion`: last
    * version already reflected in `initialStore` (0 + empty store for a
    * fresh start; `table.pins(pinName)` + a rebuilt store to resume).
    */
  def start(table: LakeTable, textColumn: String, pairsDir: String,
            fromVersion: Long = 0L,
            initialStore: Option[DataFrame] = None,
            bands: Int = 8, rowsPerBand: Int = 4, minJaccard: Double = 0.7,
            pollMs: Long = 200L, pinName: String = "dedup-maintenance"): Handle = {
    val spark = table.snapshot().sparkSession
    val storeRef = new java.util.concurrent.atomic.AtomicReference[DataFrame](
      initialStore.getOrElse(IncrementalDedup.emptyStore(spark)))
    val processedRef = new AtomicLong(fromVersion)
    val follower = ChangelogFollower.follow(table, fromVersion, pollMs,
      pinName = Some(pinName)) { (changes, toVersion) =>
      // resolve latest-per-key INSIDE the window (a window can span
      // several epochs of the same key)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(Schemas.KEY_COLS.map(col): _*)
        .orderBy(col(Schemas.LSN_COL).desc)
      val latest = changes.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1).drop("__rn")
        .withColumn("key", concat_ws("#", Schemas.KEY_COLS.map(col): _*))
        .localCheckpoint(true)
      val deleted = latest.filter(col(Schemas.DELETED_COL)).select("key")
      val upserts = latest.filter(!col(Schemas.DELETED_COL))
        .select(col("key"), col(textColumn).as("text"))
      var store = IncrementalDedup.remove(storeRef.get(), deleted, "key")
      if (upserts.head(1).nonEmpty) {
        val (s2, pairs) = IncrementalDedup.refresh(store, upserts, "text", "key",
          bands, rowsPerBand, minJaccard)
        store = s2
        pairs.withColumn("to_version", lit(toVersion))
          .write.mode("append").partitionBy("to_version").parquet(pairsDir)
      }
      storeRef.set(store)
      processedRef.set(toVersion)
    }
    new Handle(follower, storeRef, processedRef)
  }

  /** Read the pair log for windows in (fromVersion, toVersion] — the
    * incremental-consumer read path (partition-pruned by to_version).
    */
  def pairsBetween(spark: org.apache.spark.sql.SparkSession, pairsDir: String,
                   fromVersion: Long, toVersion: Long): DataFrame =
    spark.read.parquet(pairsDir)
      .filter(col("to_version") > fromVersion && col("to_version") <= toVersion)

  /** Resume after a restart: the durable pin says which version the pair
    * log fully reflects; the signature store is REBUILT from the live
    * snapshot AS OF that version (one O(corpus) signature pass — a
    * restart-time cost, not a per-window one; the pin guarantees the
    * manifest is still readable) and following continues from there.
    * Pairs for windows after the pin are re-derived exactly — replaying a
    * window appends the same pair rows, and `pairsBetween` reads by
    * version, so a consumer reading (pin, ∞) windows sees no gaps.
    */
  def resume(table: LakeTable, textColumn: String, pairsDir: String,
             bands: Int = 8, rowsPerBand: Int = 4, minJaccard: Double = 0.7,
             pollMs: Long = 200L, pinName: String = "dedup-maintenance"): Handle = {
    val pinned = table.pins.getOrElse(pinName,
      throw new IllegalStateException(
        s"no pin '$pinName' on ${table.root} — nothing to resume; use start()"))
    val spark = table.snapshot().sparkSession
    val asOf = table.snapshotAt(pinned)
      .withColumn("key", concat_ws("#", Schemas.KEY_COLS.map(col): _*))
      .select(col("key"), col(textColumn).as("text"))
    val store = IncrementalDedup
      .signatureOf(asOf, "text", "key", bands, rowsPerBand)
      .localCheckpoint(true)
    start(table, textColumn, pairsDir, fromVersion = pinned,
      initialStore = Some(store), bands = bands, rowsPerBand = rowsPerBand,
      minJaccard = minJaccard, pollMs = pollMs, pinName = pinName)
  }
}
