package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.{Metadata, MetadataBuilder, StructField, StructType}
import org.json4s.{Formats, NoTypeHints}
import org.json4s.jackson.Serialization

/** Per-column metadata that travels with the schema — the Spark-native
  * replacement for owid-etl's `VariableMeta` carried on pandas Series
  * subclasses (`lib/catalog/owid/catalog/variables.py:71-154`,
  * `meta.py:206-398`, trimmed to the data-plane fields).
  *
  * Stored as a JSON string under key `graft.meta` in
  * `StructField.metadata`, so every Spark op that preserves the schema
  * (select/filter/join/union) transports it for free.
  */
/** One typed processing-log entry — mirrors owid-etl's `LogEntry`
  * (`lib/catalog/owid/catalog/processing_log.py:46-66`): which variable an
  * operation produced, from which parents. `target` is the entry's output
  * handle: downstream entries reference their parents by the parent's LAST
  * target (processing_log.py:96-117), so a chain of entries reconstructs
  * every output column's full ancestry. Targets are deterministic
  * (`variable#op<n>`), not random hashes — replayability beats uniqueness
  * across unrelated pipelines.
  */
final case class ProcEntry(
    variable: String,
    operation: String,
    target: String,
    parents: List[String] = Nil,
    comment: Option[String] = None
)

final case class VariableMeta(
    title: Option[String] = None,
    unit: Option[String] = None,
    shortUnit: Option[String] = None,
    description: Option[String] = None,
    origins: List[String] = Nil,
    processing: List[ProcEntry] = Nil
) {
  /** How downstream entries should name this variable as a parent: the
    * last entry's target, else the variable's own column name.
    */
  def parentRef(name: String): String =
    processing.lastOption.map(_.target).getOrElse(name)

  /** Append a typed entry for `operation` producing `variable`. */
  def logOp(variable: String, operation: String, parents: List[String],
            comment: Option[String] = None): VariableMeta = {
    val target = s"$variable#$operation${processing.length + 1}"
    copy(processing =
      processing :+ ProcEntry(variable, operation, target, parents, comment))
  }
}

object VariableMeta {
  implicit val formats: Formats = Serialization.formats(NoTypeHints)
  val KEY = "graft.meta"

  def toSpark(m: VariableMeta): Metadata =
    new MetadataBuilder().putString(KEY, Serialization.write(m)).build()

  def fromSpark(md: Metadata): Option[VariableMeta] =
    if (md.contains(KEY)) Some(Serialization.read[VariableMeta](md.getString(KEY)))
    else None

  /** Field-combination rules when two variables meet — mirrors owid-etl
    * `combine_variables_metadata` (`variables.py:363-568`): unit kept iff
    * identical, title kept iff identical (else dropped), origins unioned,
    * processing logs concatenated (no new entry — see [[combine]]).
    */
  def combineFields(a: VariableMeta, b: VariableMeta): VariableMeta = VariableMeta(
    title = if (a.title == b.title) a.title else None,
    unit = if (a.unit == b.unit) a.unit else None,
    shortUnit = if (a.shortUnit == b.shortUnit) a.shortUnit else None,
    description = if (a.description == b.description) a.description else None,
    origins = (a.origins ++ b.origins).distinct,
    processing = (a.processing ++ b.processing).distinct
  )

  /** Combine two variables' metadata AND record the combining operation as
    * a typed entry whose parents are each side's last target.
    */
  def combine(a: VariableMeta, aName: String, b: VariableMeta, bName: String,
              op: String, targetVariable: String): VariableMeta =
    combineFields(a, b).logOp(targetVariable, op,
      List(a.parentRef(aName), b.parentRef(bName)))
}

/** Table-level metadata (owid-etl `TableMeta`, `meta.py:206-263` trimmed):
  * short name, title, primary key, dataset channel.
  */
final case class TableMeta(
    shortName: String,
    title: Option[String] = None,
    description: Option[String] = None,
    primaryKey: List[String] = Nil,
    channel: Option[String] = None
)

object TableMeta {
  implicit val formats: Formats = Serialization.formats(NoTypeHints)
  def toJson(m: TableMeta): String = Serialization.writePretty(m)
  def fromJson(s: String): TableMeta = Serialization.read[TableMeta](s)
}

object MetaOps {
  /** Read a column's VariableMeta from the DataFrame schema. */
  def varMeta(df: DataFrame, column: String): Option[VariableMeta] =
    df.schema.fields.find(_.name == column).flatMap(f => VariableMeta.fromSpark(f.metadata))

  /** Attach/replace a column's VariableMeta (schema-only op: `as` with
    * explicit metadata; no shuffle, no data rewrite).
    */
  def withVarMeta(df: DataFrame, column: String, meta: VariableMeta): DataFrame = {
    val cols = df.schema.fields.map { f =>
      if (f.name == column)
        org.apache.spark.sql.functions.col(f.name).as(f.name, VariableMeta.toSpark(meta))
      else org.apache.spark.sql.functions.col(f.name)
    }
    df.select(cols.toSeq: _*)
  }

  /** Lift a plain DataFrame transform into a metadata-keeping one: metadata
    * of columns that survive (same name) is re-attached after `f`. Mirrors
    * owid-etl's `keep_metadata` decorator (`tables.py:2066-2102`).
    */
  def keepMeta(f: DataFrame => DataFrame)(df: DataFrame): DataFrame = {
    val before = df.schema.fields.map(x => x.name -> x.metadata).toMap
    val out = f(df)
    val cols = out.schema.fields.map { fo =>
      before.get(fo.name) match {
        case Some(md) if md.contains(VariableMeta.KEY) =>
          org.apache.spark.sql.functions.col(fo.name).as(fo.name, md)
        case _ => org.apache.spark.sql.functions.col(fo.name)
      }
    }
    out.select(cols.toSeq: _*)
  }
}
