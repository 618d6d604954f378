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

/** `varType`/`sortOrder` mirror the reference's logical variable types
  * (`meta.py:25` `VARIABLE_TYPE` incl. "ordinal", `meta.py:262` `sort`):
  * an ordinal variable carries its category order as DATA-independent
  * metadata, so melt/pivot/concat round-trips keep the axis order intact
  * (Spark has no categorical dtype; the order lives here instead of in a
  * pandas CategoricalDtype).
  */
final case class VariableMeta(
    title: Option[String] = None,
    unit: Option[String] = None,
    shortUnit: Option[String] = None,
    description: Option[String] = None,
    origins: List[String] = Nil,
    processing: List[ProcEntry] = Nil,
    varType: Option[String] = None,
    sortOrder: List[String] = Nil
) {
  /** How downstream entries should name this variable as a parent: the
    * last entry's target, else the variable's own column name.
    */
  def parentRef(name: String): String =
    processing.lastOption.map(_.target).getOrElse(name)

  /** Append a typed entry for `operation` producing `variable`. The target
    * mixes a hash of the parent refs into the deterministic suffix: two
    * INDEPENDENTLY built histories that later meet via combineFields must
    * not mint the same target for different-parent entries (a
    * target-keyed ancestry walk would silently drop one branch).
    */
  def logOp(variable: String, operation: String, parents: List[String],
            comment: Option[String] = None): VariableMeta = {
    val sig = java.lang.Long.toHexString(graft.util.DetHash.splitmix64(
      parents.mkString("\u0000").hashCode.toLong ^ (processing.length.toLong << 32))).take(6)
    val target = s"$variable#$operation${processing.length + 1}-$sig"
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
    processing = (a.processing ++ b.processing).distinct,
    // logical type + category order: kept iff the sides agree — two
    // ordinals with DIFFERENT orders must not silently pick one axis
    varType = if (a.varType == b.varType) a.varType else None,
    sortOrder = if (a.sortOrder == b.sortOrder) a.sortOrder else Nil
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
    * explicit metadata; no shuffle, no data rewrite). Column names are
    * taken VERBATIM via `df.col` — never through the dotted-path parser
    * (generated fan-out names like `v__age_1.5` would otherwise be read
    * as struct-field access and fail).
    */
  private def quoted(name: String): String = "`" + name.replace("`", "``") + "`"

  def withVarMeta(df: DataFrame, column: String, meta: VariableMeta): DataFrame = {
    require(df.columns.contains(column), s"no column '$column' to attach metadata to")
    val cols = df.schema.fields.map { f =>
      if (f.name == column) df.col(quoted(f.name)).as(f.name, VariableMeta.toSpark(meta))
      else df.col(quoted(f.name))
    }
    df.select(cols.toSeq: _*)
  }

  /** Re-attach `column`'s pre-transform metadata after an in-place rewrite
    * (`withColumn` REPLACES the field and silently drops its metadata) and
    * record the operation as a typed processing-log entry. `preDf` is the
    * DataFrame BEFORE the transform (where the metadata still lives);
    * no-op when the column carried none.
    */
  def relog(preDf: DataFrame, outDf: DataFrame, column: String, op: String,
            comment: Option[String] = None): DataFrame =
    varMeta(preDf, column) match {
      case Some(m) =>
        withVarMeta(outDf, column, m.logOp(column, op, List(m.parentRef(column)), comment))
      case None => outDf
    }

  /** Sort rows by a column's ORDINAL category order (from its
    * `sortOrder` metadata, reference `meta.py:262` + the grapher's
    * ordinal-axis inference `etl/grapher_model.py:1360`): known labels in
    * declared order, unknown labels after them alphabetically, nulls
    * last. Fails loudly when the column carries no ordinal order — a
    * silent lexicographic fallback would LOOK sorted and be wrong.
    */
  def sortOrdinal(df: DataFrame, colName: String, extraSort: Seq[String] = Nil): DataFrame = {
    import org.apache.spark.sql.functions._
    val order = varMeta(df, colName).map(_.sortOrder).getOrElse(Nil)
    require(order.nonEmpty,
      s"column '$colName' carries no ordinal sortOrder metadata — attach a " +
      "VariableMeta(varType=Some(\"ordinal\"), sortOrder=...) first")
    val pos = array_position(typedLit(order), col(colName))
    val rank = when(col(colName).isNull, lit(Long.MaxValue))
      .when(pos > 0, pos).otherwise(lit(order.size + 1L))
    df.orderBy((rank +: col(colName) +: extraSort.map(col)): _*)
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
          out.col(quoted(fo.name)).as(fo.name, md)
        case _ => out.col(quoted(fo.name))
      }
    }
    out.select(cols.toSeq: _*)
  }
}
