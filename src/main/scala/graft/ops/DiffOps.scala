package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.NumericType

/** Tolerant dataset diff — the reference's production verification read
  * path (owid-etl `etl/datadiff.py:536-676`, `etl/tempcompare.py:97-121`):
  * compare two keyed tables and report, PER COLUMN, how many values differ
  * beyond an rtol/atol tolerance, plus key-set drift.
  *
  * numpy.isclose semantics for numeric columns:
  * `differs ⇔ |a - b| > atol + rtol·|b|` (b = the "right"/reference side);
  * null==null is equal, null vs value differs. Non-numeric columns use
  * null-safe equality.
  *
  * One full-outer join + ONE aggregation pass for all columns (a per-column
  * job would scan the tables N times — at 100 TB the scan dominates), then
  * the single agg row is exploded into the per-column report.
  */
object DiffOps {

  /** Per-column diff report between `a` and `b` joined on `keys`.
    * Output: one row per compared (non-key, common) column, ordered by
    * column name —
    * (column, n_compared, n_differs, max_abs_diff, n_only_a, n_only_b).
    * `max_abs_diff` is null for non-numeric columns and when the column has
    * no compared (both-present, both-non-null) pairs.
    */
  def diff(a: DataFrame, b: DataFrame, keys: Seq[String],
           rtol: Double = 1e-5, atol: Double = 1e-8): DataFrame = {
    val common = a.schema.fields.filter(f =>
      !keys.contains(f.name) && b.schema.fieldNames.contains(f.name))
    val valCols = common.map(_.name).toSeq
    val aT = a.select((keys.map(col) ++ valCols.map(c => col(c).as(s"__a_$c")) :+
      lit(true).as("__in_a")): _*)
    val bT = b.select((keys.map(col) ++ valCols.map(c => col(c).as(s"__b_$c")) :+
      lit(true).as("__in_b")): _*)
    val j = aT.join(bT, keys.toSeq, "full_outer")
    val inA = coalesce(col("__in_a"), lit(false))
    val inB = coalesce(col("__in_b"), lit(false))
    val both = inA && inB

    def differs(f: org.apache.spark.sql.types.StructField): Column = {
      val av = col(s"__a_${f.name}")
      val bv = col(s"__b_${f.name}")
      f.dataType match {
        case _: NumericType =>
          when(av.isNull && bv.isNull, lit(false))
            .when(av.isNull || bv.isNull, lit(true))
            .otherwise(abs(av.cast("double") - bv.cast("double")) >
              lit(atol) + lit(rtol) * abs(bv.cast("double")))
        case _ => !(av <=> bv)
      }
    }
    def absDiff(f: org.apache.spark.sql.types.StructField): Column = f.dataType match {
      case _: NumericType =>
        abs(col(s"__a_${f.name}").cast("double") - col(s"__b_${f.name}").cast("double"))
      case _ => lit(null).cast("double")
    }

    // keys-only frames (no common value column) still report key drift:
    // one synthetic "(keys)" row instead of an un-star-expandable empty
    // struct array
    if (common.isEmpty) {
      val one = j.agg(
        sum(when(both, 1L).otherwise(0L)).as("__cmp"),
        sum(when(inA && !inB, 1L).otherwise(0L)).as("__only_a"),
        sum(when(inB && !inA, 1L).otherwise(0L)).as("__only_b"))
      return one.select(
        lit("(keys)").as("column"),
        coalesce(col("__cmp"), lit(0L)).as("n_compared"),
        lit(0L).as("n_differs"),
        lit(null).cast("double").as("max_abs_diff"),
        coalesce(col("__only_a"), lit(0L)).as("n_only_a"),
        coalesce(col("__only_b"), lit(0L)).as("n_only_b"))
    }
    val aggs = common.toSeq.flatMap { f =>
      Seq(
        sum(when(both, 1L).otherwise(0L)).as(s"__cmp_${f.name}"),
        sum(when(both && differs(f), 1L).otherwise(0L)).as(s"__dif_${f.name}"),
        max(when(both, absDiff(f))).as(s"__mad_${f.name}"))
    } ++ Seq(
      sum(when(inA && !inB, 1L).otherwise(0L)).as("__only_a"),
      sum(when(inB && !inA, 1L).otherwise(0L)).as("__only_b"))
    val one = j.agg(aggs.head, aggs.tail: _*)
    val reportRows = common.toSeq.sortBy(_.name).map { f =>
      struct(
        lit(f.name).as("column"),
        coalesce(col(s"__cmp_${f.name}"), lit(0L)).as("n_compared"),
        coalesce(col(s"__dif_${f.name}"), lit(0L)).as("n_differs"),
        col(s"__mad_${f.name}").as("max_abs_diff"),
        coalesce(col("__only_a"), lit(0L)).as("n_only_a"),
        coalesce(col("__only_b"), lit(0L)).as("n_only_b"))
    }
    one.select(explode(array(reportRows: _*)).as("r")).select(col("r.*"))
  }

  /** True when nothing differs: every column's n_differs is 0 and the key
    * sets match (the reference's "datasets are equal within tolerance").
    */
  def isClose(a: DataFrame, b: DataFrame, keys: Seq[String],
              rtol: Double = 1e-5, atol: Double = 1e-8): Boolean = {
    val r = diff(a, b, keys, rtol, atol)
      .agg(sum(col("n_differs")).as("d"), max(col("n_only_a")).as("oa"),
        max(col("n_only_b")).as("ob")).collect()(0)
    (r.isNullAt(0) || r.getLong(0) == 0L) &&
      (r.isNullAt(1) || r.getLong(1) == 0L) && (r.isNullAt(2) || r.getLong(2) == 0L)
  }
}
