package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.gen.WalGen
import graft.lake.LakeTable
import graft.model.Schemas
import graft.stream.CdcStream

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship: full CDC pipeline end-to-end at toy scale — generate a
    * deterministic WAL (dups/reorder/deletes/hot keys), tail it with
    * Structured Streaming into a LakeTable via max-LSN MERGE, return the
    * final snapshot. Driver smoke-checks rows>0.
    */
  def entry(spark: SparkSession): DataFrame = {
    val work = java.nio.file.Files.createTempDirectory("graft-entry").toString
    val cfg = WalGen.Config(numEvents = 20000, numConvs = 200, maxTurns = 30)
    WalGen.writeWal(spark, s"$work/wal", cfg, numChunks = 4)
    val table = LakeTable.create(spark, s"$work/table", Schemas.transcript, numBuckets = 8)
    CdcStream.runToCompletion(spark, s"$work/wal", table, s"$work/cp", maxFilesPerTrigger = 2)
    table.snapshot().orderBy("conv_id", "turn_idx")
  }

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Queries.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Queries.oracle
}
