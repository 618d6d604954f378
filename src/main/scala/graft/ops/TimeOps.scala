package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-axis operators (SURVEY.md §2.5, §2.9): window functions, gap
  * densification, interpolation, gap-filling — all on (entity, time)
  * series like owid-etl's, all pure window/sequence/explode expressions
  * (no UDFs), so they stay inside WholeStageCodegen.
  */
object TimeOps {

  /** Rolling aggregate over the trailing `n` rows per entity (owid-etl
    * `rolling`, `tables.py:1229-1276`): e.g. rollingAvg(df, "country",
    * "year", "v", 3) = 3-year trailing mean.
    */
  def rollingAvg(df: DataFrame, entity: Seq[String], timeCol: String,
                 valueCol: String, n: Int, minPeriods: Int = 1): DataFrame = {
    val w = Window.partitionBy(entity.map(col): _*).orderBy(col(timeCol))
      .rowsBetween(-(n - 1), 0)
    val cnt = count(col(valueCol)).over(w)
    df.withColumn(s"${valueCol}_rolling",
      when(cnt >= minPeriods, avg(col(valueCol)).over(w)))
  }

  /** Lag-based percent change per entity series (owid-etl `pct_change`,
    * `variables.py:286-292`).
    */
  def pctChange(df: DataFrame, entity: Seq[String], timeCol: String,
                valueCol: String, periods: Int = 1): DataFrame = {
    val w = Window.partitionBy(entity.map(col): _*).orderBy(col(timeCol))
    df.withColumn(s"${valueCol}_pct_change",
      col(valueCol) / lag(col(valueCol), periods).over(w) - 1)
  }

  /** Densify the time axis (owid-etl `expand_time_column`,
    * `misc.py:109-349`). method:
    *  - "full_range": every entity gets the global [min,max] range;
    *  - "full_range_entity": each entity its own [min,max];
    *  - "observed": every entity × every observed time value.
    * Missing rows appear with null values.
    */
  def expandTimeColumn(df: DataFrame, entity: Seq[String], timeCol: String,
                       method: String = "full_range_entity"): DataFrame =
    expandTimeColumn(df, entity, timeCol, method, None, None, "none", Nil)

  /** Full `expand_time_column` (owid-etl `misc.py:109-349`, options at
    * `:138-145`): densify the time axis, optionally extending each spine
    * beyond the observed range (`since`/`until`, the reference's
    * `since_time`/`until_time`), then apply ONE fill strategy to the
    * introduced gaps — "none" | "ffill" | "bfill" | "zero" | "interpolate"
    * — over `fillCols` (default: every non-entity, non-time column). One
    * composed plan: spine explode → left join → window fill, no extra
    * shuffles beyond the join and the per-entity fill window.
    */
  def expandTimeColumn(df: DataFrame, entity: Seq[String], timeCol: String,
                       method: String, since: Option[Long], until: Option[Long],
                       fill: String, fillCols: Seq[String]): DataFrame = {
    // widen a [mn, mx] range by the since/until bounds (extend-only, like
    // the reference: since past mn extends backwards, until past mx forward)
    val timeType = df.schema(timeCol).dataType
    def lo(c: Column) = since.map(s => least(c, lit(s).cast(timeType))).getOrElse(c)
    def hi(c: Column) = until.map(u => greatest(c, lit(u).cast(timeType))).getOrElse(c)
    val spine = method match {
      case "full_range" =>
        val range = df.agg(min(col(timeCol)).as("mn"), max(col(timeCol)).as("mx"))
        df.select(entity.map(col): _*).distinct()
          .crossJoin(range)
          .select((entity.map(col) :+
            explode(sequence(lo(col("mn")), hi(col("mx")))).as(timeCol)): _*)
      case "full_range_entity" =>
        df.groupBy(entity.map(col): _*)
          .agg(min(col(timeCol)).as("mn"), max(col(timeCol)).as("mx"))
          .select((entity.map(col) :+
            explode(sequence(lo(col("mn")), hi(col("mx")))).as(timeCol)): _*)
      case "observed" =>
        df.select(entity.map(col): _*).distinct()
          .crossJoin(df.select(col(timeCol)).distinct())
      case other => throw new IllegalArgumentException(s"unknown method: $other")
    }
    val expanded = spine.join(df, entity :+ timeCol, "left")
    val targets =
      if (fillCols.nonEmpty) fillCols
      else df.columns.filterNot(c => entity.contains(c) || c == timeCol).toSeq
    fill match {
      case "none" => expanded
      case "zero" => targets.foldLeft(expanded)((d, c) =>
        d.withColumn(c, coalesce(col(c), lit(0).cast(df.schema(c).dataType))))
      case "ffill" => targets.foldLeft(expanded)((d, c) => ffill(d, entity, timeCol, c))
      case "bfill" => targets.foldLeft(expanded)((d, c) => bfill(d, entity, timeCol, c))
      case "interpolate" => targets.foldLeft(expanded)((d, c) => interpolate(d, entity, timeCol, c))
      case other => throw new IllegalArgumentException(s"unknown fill: $other")
    }
  }

  /** Forward-fill per entity: last non-null value at or before each row
    * (owid-etl fill strategies under `expand_time_column`,
    * `misc.py:138-145`).
    */
  def ffill(df: DataFrame, entity: Seq[String], timeCol: String, valueCol: String): DataFrame = {
    val w = Window.partitionBy(entity.map(col): _*).orderBy(col(timeCol))
      .rowsBetween(Window.unboundedPreceding, 0)
    MetaOps.relog(df,
      df.withColumn(valueCol, last(col(valueCol), ignoreNulls = true).over(w)),
      valueCol, "ffill")
  }

  /** Backward-fill per entity.
    *
    * Computed as a RUNNING `last` over descending time, not a
    * `first over (0, unboundedFollowing)`: Spark's unbounded-FOLLOWING
    * frame re-scans from the current row to the partition end for every
    * row (UnboundedFollowingWindowFunctionFrame), O(p²) per partition — a
    * hot entity with 10^6 points would pay 10^12 evaluations. The running
    * form is O(p) and costs only one extra in-partition sort; identical
    * values (same rows in frame; on a unique (entity, time) axis the two
    * are exactly equivalent, and with duplicate times both forms are
    * order-dependent in the same way).
    */
  def bfill(df: DataFrame, entity: Seq[String], timeCol: String, valueCol: String): DataFrame = {
    val w = Window.partitionBy(entity.map(col): _*).orderBy(col(timeCol).desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    MetaOps.relog(df,
      df.withColumn(valueCol, last(col(valueCol), ignoreNulls = true).over(w)),
      valueCol, "bfill")
  }

  /** Per-entity linear interpolation over the time axis with
    * limit_direction="both" semantics (owid-etl `misc.py:59-108` /
    * `geo.py:656-722`): interior gaps are linearly interpolated between
    * the previous and next observation; leading/trailing gaps take the
    * nearest observation. Pure window expressions: prev/next value and
    * their time positions, then a linear weight by time distance.
    */
  def interpolate(df: DataFrame, entity: Seq[String], timeCol: String,
                  valueCol: String): DataFrame = {
    val back = Window.partitionBy(entity.map(col): _*).orderBy(col(timeCol))
      .rowsBetween(Window.unboundedPreceding, 0)
    // next-observation leg as a RUNNING last over DESCENDING time — same
    // O(p²) unbounded-following frame avoidance as [[bfill]]; one extra
    // in-partition sort, no extra exchange, identical values
    val fwdRev = Window.partitionBy(entity.map(col): _*).orderBy(col(timeCol).desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val v = col(valueCol)
    val tAt = when(v.isNotNull, col(timeCol))
    val prevV = last(v, ignoreNulls = true).over(back)
    val prevT = last(tAt, ignoreNulls = true).over(back)
    val nextV = last(v, ignoreNulls = true).over(fwdRev)
    val nextT = last(tAt, ignoreNulls = true).over(fwdRev)
    val interp = when(v.isNotNull, v)
      .when(prevV.isNull, nextV) // leading gap
      .when(nextV.isNull, prevV) // trailing gap
      .when(nextT === prevT, prevV)
      .otherwise(prevV + (nextV - prevV) *
        ((col(timeCol) - prevT).cast("double") / (nextT - prevT).cast("double")))
    MetaOps.relog(df, df.withColumn(valueCol, interp), valueCol, "interpolate")
  }

  /** One row per time unit in [startCol, endCol] (owid-etl
    * `explode_rows_by_time_range`, `misc.py:350-412`) — literally
    * `explode(sequence(...))`.
    */
  def explodeTimeRange(df: DataFrame, startCol: String, endCol: String,
                       asCol: String): DataFrame =
    df.withColumn(asCol, explode(sequence(col(startCol), col(endCol))))

  /** Cross-join all entities × the full observed time range (owid-etl
    * `fill_date_gaps`, `geo.py:1342-1359`).
    */
  def fillTimeGaps(df: DataFrame, entity: Seq[String], timeCol: String): DataFrame =
    expandTimeColumn(df, entity, timeCol, "full_range")
}
