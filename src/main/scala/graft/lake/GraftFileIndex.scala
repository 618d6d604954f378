package graft.lake

import java.nio.file.{Files, Path}
import org.apache.hadoop.fs.FileStatus
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{And, Expression, Literal}
import org.apache.spark.sql.execution.datasources.{FileIndex, PartitionDirectory}
import org.apache.spark.sql.types.StructType

/** Manifest-backed [[FileIndex]] with data skipping — the Spark-native
  * integration point for [[DataSkipping]] (Delta's TahoeFileIndex shape):
  * `FileSourceStrategy` hands every file scan's PUSHED data filters to
  * `listFiles` at physical planning, and this index answers with only the
  * files whose [[ColStat]] bounds can satisfy them. Because the lake read
  * path builds its scans through this index, BOTH the SQL surface
  * (`SELECT ... WHERE` on a registered table) and the DataFrame API
  * (`snapshot().filter(...)`) skip files with no extra user code.
  *
  * == Why this is MOR-sound by construction ==
  *
  * Per-key max-LSN resolution makes naive file pruning unsound (a skipped
  * newer row would crown a stale row the winner — see [[DataSkipping]]).
  * Here the plan SHAPE enforces the rule instead of bespoke bucket logic:
  * clean (all-base) buckets scan directly, so user predicates push down to
  * their scans and prune per file; delta-bearing buckets sit BELOW the
  * resolve window, which Catalyst never pushes user predicates through —
  * their scans receive no skippable filters and read whole, exactly the
  * conservative whole-bucket behavior soundness requires.
  *
  * File sizes come from the manifest (`FileEntry.bytes`, recorded at
  * adoption) so query planning touches NO per-file filesystem metadata —
  * a pre-field file (bytes absent) is stat()ed once as a fallback.
  * Modification times are reported as 0: they only feed the optional
  * `_metadata.file_modification_time` hidden column, never correctness.
  */
final class GraftFileIndex(
    spark: SparkSession,
    tableRoot: Path,
    entries: Seq[FileEntry],
    fileSchema: StructType
) extends FileIndex {

  private val statuses: Seq[(FileStatus, FileEntry)] = entries.map { e =>
    val p = tableRoot.resolve(e.path)
    val st = new FileStatus(e.bytes.getOrElse(Files.size(p)), false, 1,
      128L * 1024 * 1024, 0L, new org.apache.hadoop.fs.Path(p.toUri))
    (st, e)
  }

  override def rootPaths: Seq[org.apache.hadoop.fs.Path] =
    Seq(new org.apache.hadoop.fs.Path(tableRoot.toUri))

  override def listFiles(partitionFilters: Seq[Expression],
                         dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val pred = dataFilters.reduceOption(And).getOrElse(Literal.TrueLiteral)
    val kept = statuses.collect {
      case (st, e) if DataSkipping.mayMatch(fileSchema, e.colStats, e.rows, pred,
        DataSkipping.KeyBloom.testFor(e)) => st
    }
    Seq(PartitionDirectory(InternalRow.empty, kept.toArray))
  }

  override def inputFiles: Array[String] = statuses.map(_._1.getPath.toString).toArray
  override def refresh(): Unit = ()
  override def sizeInBytes: Long = statuses.map(_._1.getLen).sum
  override def partitionSchema: StructType = new StructType()
}
