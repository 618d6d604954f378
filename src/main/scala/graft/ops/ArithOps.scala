package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Column arithmetic with metadata-combination semantics (SURVEY.md §2.8;
  * owid-etl `variables.py:170-231` + `combine_variables_metadata`
  * `variables.py:363-568`): the data-plane op is a plain codegen'd column
  * expression; metadata combination is a driver-side fold over
  * StructField.metadata.
  */
object ArithOps {

  /** df[target] = f(df[a], df[b]) with combined VariableMeta. */
  def combineColumns(df: DataFrame, a: String, b: String, target: String, op: String)
                    (f: (Column, Column) => Column): DataFrame = {
    val out = df.withColumn(target, f(col(a), col(b)))
    (MetaOps.varMeta(df, a), MetaOps.varMeta(df, b)) match {
      case (Some(ma), Some(mb)) =>
        MetaOps.withVarMeta(out, target, VariableMeta.combine(ma, a, mb, b, op, target))
      case (Some(ma), None) =>
        MetaOps.withVarMeta(out, target,
          ma.logOp(target, op, List(ma.parentRef(a), b)))
      case (None, Some(mb)) =>
        MetaOps.withVarMeta(out, target,
          mb.logOp(target, op, List(a, mb.parentRef(b))))
      case _ => out
    }
  }

  def add(df: DataFrame, a: String, b: String, target: String): DataFrame =
    combineColumns(df, a, b, target, "+")(_ + _)
  def sub(df: DataFrame, a: String, b: String, target: String): DataFrame =
    combineColumns(df, a, b, target, "-")(_ - _)
  def mul(df: DataFrame, a: String, b: String, target: String): DataFrame =
    combineColumns(df, a, b, target, "*")(_ * _)
  def div(df: DataFrame, a: String, b: String, target: String): DataFrame =
    combineColumns(df, a, b, target, "/")(_ / _)

  /** String→numeric parse with "nan" passthrough (owid-etl
    * `_convert_strings_to_numeric`, `data_metadata.py:243-258`).
    */
  def parseNumeric(c: Column): Column =
    when(lower(trim(c)) === "nan" || c.isNull, lit(null).cast("double"))
      .otherwise(c.cast("double"))

  /** Round to n significant figures (owid-etl `misc.py:703-801`). */
  def roundSigFigs(c: Column, figs: Int): Column = {
    val magnitude = floor(log10(abs(c)))
    val factor = pow(lit(10.0), lit(figs - 1) - magnitude)
    when(c === 0 || c.isNull, c).otherwise(round(c * factor) / factor)
  }
}
