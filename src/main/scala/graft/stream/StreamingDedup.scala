package graft.stream

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** STREAMING exact deduplication: drop documents whose content digest was
  * already seen earlier in the stream — the stateful streaming twin of
  * [[graft.ops.DedupOps.dropExactDuplicates]], for ingest pipelines where
  * the corpus arrives as a stream and re-crawls/duplicate deliveries must
  * be suppressed online rather than by a nightly batch dedup.
  *
  * Built on `KeyValueGroupedDataset.flatMapGroupsWithState` (the Spark
  * state-store API): state is keyed by the md5 digest, one boolean per
  * distinct content. First arrival wins and is emitted; every later copy
  * is dropped. State lives in the checkpointed state store, so exactly
  * -once holds across restarts — a replayed micro-batch neither re-emits
  * nor double-counts.
  *
  * Scale shape: the shuffle is on the 128-bit digest (uniform by
  * construction — no skew), state is O(distinct contents) at ~48 bytes a
  * key. At 10^10 documents that is cluster-RocksDB territory: pass
  * `ttl` (processing-time timeout) to bound state for re-crawl windows —
  * a duplicate arriving after its digest's state expired is re-admitted
  * (documented trade: bounded state vs unbounded-window exactness).
  */
object StreamingDedup {

  final case class DocKey(digest: String)
  final case class DocRow(digest: String, doc_id: Long, text: String)

  /** Deduplicate a STREAMING DataFrame with columns (idCol, textCol):
    * emits exactly the first-seen row per distinct text. `ttl` bounds
    * per-digest state (None = exact over the whole stream).
    */
  def dropExactDuplicates(docs: DataFrame, textCol: String, idCol: String,
                          ttl: Option[java.time.Duration] = None): Dataset[DocRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val keyed = docs
      .select(md5(col(textCol)).as("digest"),
        col(idCol).cast("long").as("doc_id"), col(textCol).as("text"))
      .as[DocRow]
      .groupByKey(r => r.digest)
    val timeoutConf =
      if (ttl.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    keyed.flatMapGroupsWithState(OutputMode.Append, timeoutConf) {
      (digest: String, rows: Iterator[DocRow], state: GroupState[Boolean]) =>
        if (state.hasTimedOut) { state.remove(); Iterator.empty }
        else {
          val seen = state.getOption.getOrElse(false)
          val out =
            if (seen) Iterator.empty
            else {
              // min doc_id within the micro-batch: deterministic winner
              // when several copies land in the same batch
              val first = rows.minBy(_.doc_id)
              state.update(true)
              Iterator.single(first)
            }
          ttl.foreach(d => state.setTimeoutDuration(d.toMillis))
          out
        }
    }
  }
}
