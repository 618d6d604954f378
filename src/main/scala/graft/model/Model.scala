package graft.model

import java.sql.Timestamp
import org.apache.spark.sql.types._

/** Core data model for the CDC/incremental-ingest engine.
  *
  * The target table holds multi-turn conversation/agent transcripts keyed by
  * `(conv_id, turn_idx)` (BASELINE.json `input_hint`). Change events carry a
  * CDC op (`I`/`U`/`D`) and a globally monotone LSN.
  *
  * Reference analogue: the Table/Variable data model of owid-etl
  * (`lib/catalog/owid/catalog/tables.py:66`, `variables.py:71`), trimmed to
  * what the data plane needs. Per-column metadata travels in
  * `StructField.metadata` (see [[graft.ops.TableOps]]), not in a pandas-style
  * subclass.
  */
final case class TranscriptRow(
    conv_id: String,
    turn_idx: Int,
    role: String,
    text: String,
    tool: String,
    ts: Timestamp
)

/** One WAL/binlog record. `op` is "I" | "U" | "D"; for "D" the payload
  * columns are null. `lsn` is globally monotone; the generator injects
  * duplicate and reordered deliveries (FIXTURES.md F2).
  */
final case class ChangeEvent(
    op: String,
    lsn: Long,
    conv_id: String,
    turn_idx: Int,
    role: String,
    text: String,
    tool: String,
    ts: Timestamp
)

object Schemas {
  /** Logical (user-facing) transcript schema. */
  val transcript: StructType = StructType(Seq(
    StructField("conv_id", StringType, nullable = false),
    StructField("turn_idx", IntegerType, nullable = false),
    StructField("role", StringType),
    StructField("text", StringType),
    StructField("tool", StringType),
    StructField("ts", TimestampType)
  ))

  /** WAL record schema = op + lsn + transcript columns. */
  val changeEvent: StructType = StructType(
    StructField("op", StringType, nullable = false) +:
    StructField("lsn", LongType, nullable = false) +:
    transcript.fields.toSeq
  )

  /** Internal bookkeeping columns stored in every lake data file. */
  val LSN_COL = "_lsn"
  val DELETED_COL = "_deleted"
  val KEY_COLS: Seq[String] = Seq("conv_id", "turn_idx")

  /** Physical schema = user schema + (_lsn, _deleted). */
  def physical(user: StructType): StructType =
    StructType(user.fields.toSeq :+
      StructField(LSN_COL, LongType, nullable = false) :+
      StructField(DELETED_COL, BooleanType, nullable = false))
}
