package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-window preparation: split documents into fixed-token chunks
  * (with overlap) and pack documents into context-window-sized groups.
  * The reference stops at tabular reshaping; these are the LLM-pipeline
  * analogues, built in the two shapes that survive 100 TB:
  * chunking is a per-row HOF + explode (no shuffle beyond the explode's
  * own partitions), packing is ONE window over shard-local sorts (shards
  * are hash-disjoint, so the sort never sees more than corpus/shards
  * rows per partition — no global sort, no driver state).
  */
object ChunkOps {

  /** Explode each document into whitespace-token chunks of `chunkSize`
    * tokens, starting every `chunkSize - overlap` tokens (the standard
    * sliding context window). Output: idCol, chunk_idx (0-based),
    * chunk_text, n_tokens (tokens in this chunk; only the last chunk of
    * a document may be short). Whitespace-only documents yield no rows.
    */
  def chunkByTokens(df: DataFrame, idCol: String, textCol: String,
                    chunkSize: Int, overlap: Int = 0): DataFrame = {
    require(chunkSize > 0, s"chunkSize must be positive, got $chunkSize")
    require(overlap >= 0 && overlap < chunkSize,
      s"overlap must be in [0, chunkSize), got $overlap")
    val stride = chunkSize - overlap
    // STAGE the token array as a column: the slicing lambda below captures
    // it, and a HOF lambda re-evaluates captured non-attribute subtrees
    // per ELEMENT — with the split inlined, a document re-tokenized once
    // per chunk makes long documents quadratic (O(len · len/chunkSize)).
    // As an attribute the capture is a pointer read. CollapseProject keeps
    // the stage: the alias is non-cheap and multiply referenced.
    val toks = col("__toks")
    val n = size(toks)
    // chunk starts 0, stride, 2*stride, ... strictly below n
    val starts = filter(sequence(lit(0), greatest(n - 1, lit(0)), lit(stride)), s => s < n)
    df.filter(length(trim(col(textCol))) > 0)
      .select(col(idCol), split(trim(col(textCol)), "\\s+").as("__toks"))
      .select(col(idCol), posexplode(
        transform(starts, s => concat_ws(" ", slice(toks, s + 1, lit(chunkSize))))))
      .withColumnRenamed("pos", "chunk_idx")
      .withColumnRenamed("col", "chunk_text")
      .withColumn("n_tokens", size(split(col("chunk_text"), "\\s+")))
  }

  /** Assign documents to context-window "packs" of ~`targetTokens`
    * whitespace tokens, greedily in `idCol` order WITHIN each of
    * `shards` hash-disjoint shards: a document goes to the pack its
    * running token offset starts in (`(cumsum - n_tok) / target`), i.e.
    * concat-in-order-then-cut assignment — a pack can overflow by less
    * than one document, the standard trade for a single-pass packer.
    * Sharding keeps the sort partition-local: the plan is one hash
    * exchange on shard + an in-partition sort, never a global sort.
    * Output: idCol, shard, pack_id, n_tokens, cum_tokens.
    */
  def packGreedy(df: DataFrame, idCol: String, textCol: String,
                 targetTokens: Long, shards: Int = 64): DataFrame = {
    require(targetTokens > 0, s"targetTokens must be positive, got $targetTokens")
    require(shards > 0, s"shards must be positive, got $shards")
    val w = Window.partitionBy("shard").orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.filter(length(trim(col(textCol))) > 0)
      .select(col(idCol),
        pmod(col(idCol).cast("long"), lit(shards.toLong)).as("shard"),
        size(split(trim(col(textCol)), "\\s+")).cast("long").as("n_tokens"))
      .withColumn("cum_tokens", sum("n_tokens").over(w))
      .withColumn("pack_id", ((col("cum_tokens") - col("n_tokens")) / targetTokens)
        .cast("long"))
      .select(col(idCol), col("shard"), col("pack_id"), col("n_tokens"), col("cum_tokens"))
  }
}
