package graft.stream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.lake.LakeTable

/** Changelog-driven incremental view maintenance — the downstream-consumer
  * half of the CDC story (reference analogue: owid-etl's dirty-step partial
  * recompute, `etl/steps/__init__.py` checksum pruning, re-expressed over
  * the lake changelog instead of file mtimes).
  *
  * The changelog (`LakeTable.changesBetween`) carries per-key LATEST rows
  * (no before-images), so exact delta-application of non-invertible
  * aggregates is impossible; the scalable pattern is DELTA-DRIVEN PARTIAL
  * RECOMPUTE: read only the conversation ids touched in (fromVersion,
  * toVersion], recompute the aggregate for exactly those groups from the
  * snapshot (bucket- and file-pruned reads), and upsert the results into
  * the view. Work per refresh is O(changed groups), not O(table).
  */
/** Push-based changelog follower: poll the table's `_current` pointer and
  * hand every newly committed version range's change rows to a callback —
  * the "tail the lake table itself as a CDC feed" consumer loop (pairs
  * with [[IncrementalAgg]] for downstream view maintenance). Exactly-once
  * per (fromVersion, toVersion] window as long as the consumer tracks the
  * last version it processed (the callback receives `toVersion` for that).
  */
object ChangelogFollower {

  /** Follower handle: `failure` exposes the error that killed the loop (a
    * callback exception, or `changesBetween`'s loud vacuumed-delta error);
    * `close()` stops the loop and RETHROWS any such failure so a dead
    * follower can never be mistaken for a cleanly stopped one.
    */
  final class Handle private[ChangelogFollower] (
      stop: java.util.concurrent.atomic.AtomicBoolean,
      t: Thread,
      err: java.util.concurrent.atomic.AtomicReference[Throwable]) extends AutoCloseable {
    def failure: Option[Throwable] = Option(err.get())
    def isAlive: Boolean = t.isAlive
    /** Stop the loop and WAIT until the consumer thread is provably dead.
      * A callback outliving the first timed join (easy at scale — it
      * shingles, joins the store, writes parquet) is interrupted and
      * joined again; if it STILL will not die, close() throws rather than
      * return with a live consumer — a caller that then resumed the same
      * pin would otherwise run two loops appending to one pair log and
      * moving one pin in both directions.
      */
    override def close(): Unit = {
      stop.set(true)
      t.join(10000)
      if (t.isAlive) {
        t.interrupt()
        t.join(30000)
        if (t.isAlive) throw new IllegalStateException(
          "changelog follower thread still alive after interrupt — close() " +
          "refuses to return with a live consumer; do not resume this pin")
      }
      failure.foreach(e => throw new IllegalStateException(
        "changelog follower died before close()", e))
    }
  }

  private def isInterruption(e: Throwable): Boolean =
    Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(16).exists {
      t => t.isInstanceOf[InterruptedException] ||
        t.isInstanceOf[java.nio.channels.ClosedByInterruptException]
    }

  /** Start following; returns a handle whose `close()` stops the loop.
    * `fromVersion`: first version already seen (callbacks start after it).
    * `onError` fires immediately when the loop dies (default: stderr); the
    * failure is also retained on the handle and rethrown by `close()`.
    *
    * `pinName`: when set, the follower holds a durable [[LakeTable.pin]]
    * at its last-consumed version, ADVANCED after each successful
    * callback — vacuum then defers reclaiming the follower's unread
    * changelog suffix no matter how far it lags (the reference's
    * "consumer holds a reference → refuse the delete" guard,
    * `etl/grapher_import.py:457-575`, as a durable snapshot ref). The
    * pin survives crash/restart (resume from `table.pins(pinName)`) and
    * is deliberately NOT released by `close()` — a stopped follower still
    * intends to resume; release with `table.unpin` when decommissioning.
    */
  def follow(table: LakeTable, fromVersion: Long, pollMs: Long = 200L,
             pinName: Option[String] = None,
             onError: Throwable => Unit = e =>
               System.err.println(s"[changelog-follower] DIED: $e"))
            (f: (DataFrame, Long) => Unit): Handle = {
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val err = new java.util.concurrent.atomic.AtomicReference[Throwable]()
    pinName.foreach(n => table.pin(n, fromVersion))
    val t = new Thread(() => {
      var last = fromVersion
      try {
        while (!stop.get()) {
          val cur = table.currentVersion
          if (cur > last) {
            f(table.changesBetween(last, cur), cur)
            last = cur
            // advance only AFTER the callback: a crash mid-callback leaves
            // the pin at the last fully consumed version, so the retry's
            // window is still fully retained
            pinName.foreach(n => table.pin(n, cur))
          } else Thread.sleep(pollMs)
        }
      } catch {
        // a close()-requested interrupt is a clean shutdown even when the
        // interpreter/Spark wrapped the InterruptedException in its own
        // exception type — walk the cause chain before calling it a death
        case e: Throwable if stop.get() && isInterruption(e) => ()
        case e: Throwable => err.set(e); onError(e)
      }
    }, s"graft-changelog-follower")
    t.setDaemon(true)
    t.start()
    new Handle(stop, t, err)
  }
}

object IncrementalAgg {

  /** A maintained per-conversation aggregate row. */
  final case class ConvAgg(conv_id: String, n_turns: Long, max_lsn: Long,
                           n_tool_turns: Long)

  /** Compute the aggregate for every group present in `df` (live rows). */
  def aggregateOf(df: DataFrame): DataFrame =
    df.groupBy("conv_id").agg(
      count(lit(1)).as("n_turns"),
      max(col(graft.model.Schemas.LSN_COL)).as("max_lsn"),
      count(when(col("tool").isNotNull, lit(1))).as("n_tool_turns"))

  /** Full recompute — the verification baseline. */
  def full(table: LakeTable): DataFrame =
    aggregateOf(table.snapshotPhysical(None)
      .filter(!col(graft.model.Schemas.DELETED_COL)))

  /** Incremental refresh of `view` (the previous aggregate state) from the
    * changelog window (fromVersion, toVersion]. Returns the new view:
    * untouched groups carried as-is, touched groups recomputed (and
    * dropped when the conversation was fully deleted).
    */
  def refresh(table: LakeTable, view: DataFrame,
              fromVersion: Long, toVersion: Long): DataFrame = {
    // PIN the manifest at toVersion: the recompute must read the table AS
    // OF the window's end, not whatever has been committed since — mixing
    // versions would produce a view consistent with neither. The changelog
    // scan is persisted: it feeds three consumers (bucket set, semi-join,
    // anti-join) and must not re-read the delta chain per consumer.
    val mTo = table.manifestAt(toVersion)
    val changed = table.changesBetween(fromVersion, toVersion)
      .select("conv_id").distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // everything after the persist runs under a finally: a failing job
    // (vacuumed-changelog error at the bucket collect, a lost checkpoint
    // write) must not leak the persisted block — a catch-and-retry
    // follower would otherwise accumulate one orphaned cache per error
    try {
      // touched BUCKETS via the bucket expression — collects at most
      // numBuckets ints, never the conversation ids themselves
      val buckets = changed
        .select(table.bucketExpr(mTo.numBuckets).as("b"))
        .distinct().collect().map(_.getInt(0)).toSet
      // bucket-pruned snapshot read of ONLY the touched buckets, then group
      // filter to the touched conversations
      val touched = table.snapshotPhysical(mTo, Some(buckets))
        .filter(!col(graft.model.Schemas.DELETED_COL))
        .join(broadcast(changed), Seq("conv_id"), "left_semi")
      val recomputed = aggregateOf(touched)
      val next = view.join(changed, Seq("conv_id"), "left_anti") // carry untouched groups
        .unionByName(recomputed)
      // Materialize the new view eagerly (localCheckpoint): (a) the follower
      // loop feeds each refresh's output into the next — without truncation
      // the plan grows one join+union PER REFRESH; (b) the checkpointed
      // blocks are released by the ContextCleaner once the previous view is
      // dereferenced, so a long-running follower holds exactly one view
      // generation (+ the one being built) at a time. Local checkpointing
      // trades executor-loss resilience for speed — right in a single-JVM
      // follower; a cluster-grade follower should additionally persist the
      // view to a table every K refreshes so it can rebuild from
      // (tableVersion, view) instead of replaying history.
      next.localCheckpoint(eager = true)
    } finally changed.unpersist()
  }
}
