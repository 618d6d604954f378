package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Aggregation operators (SURVEY.md §2.4) with owid-etl's NaN-aware
  * semantics, expressed as extra aggregate expressions (partial + final
  * hash aggregation for free — no UDAF).
  */
object AggOps {

  /** NaN-aware grouped aggregation (owid-etl `groupby_agg`,
    * `datautils/dataframes.py:248-353`): the group's aggregate becomes null
    * when it has more than `numAllowedNulls` nulls, more than
    * `fracAllowedNulls` null fraction, or fewer than `minNumValues`
    * non-null values.
    */
  def groupbyAggNanAware(df: DataFrame, keys: Seq[String], valueCol: String,
                         agg: String = "sum",
                         numAllowedNulls: Option[Long] = None,
                         fracAllowedNulls: Option[Double] = None,
                         minNumValues: Option[Long] = None): DataFrame = {
    val v = col(valueCol)
    val aggExpr = agg match {
      case "sum" => sum(v)
      // exact order-invariant double sum (decimal accumulation)
      case "dsum" => sum(v.cast("decimal(18,4)")).cast("double")
      case "avg" | "mean" => avg(v)
      case "min" => min(v)
      case "max" => max(v)
      case "count" => count(v)
      case other => throw new IllegalArgumentException(s"unsupported agg: $other")
    }
    val base = df.groupBy(keys.map(col): _*).agg(
      aggExpr.as("__agg"),
      count(v).as("__n_values"),
      count(when(v.isNull, lit(1))).as("__n_nulls"),
      count(lit(1)).as("__n_total"))
    val gates = Seq(
      numAllowedNulls.map(n => col("__n_nulls") <= n),
      fracAllowedNulls.map(f => col("__n_nulls") <= col("__n_total") * f),
      minNumValues.map(m => col("__n_values") >= m)
    ).flatten
    val ok = gates.reduceOption(_ && _).getOrElse(lit(true))
    base.select((keys.map(col) :+ when(ok, col("__agg")).otherwise(lit(null)).as(valueCol)): _*)
  }

  /** Region aggregation with a "must-have members" gate (owid-etl
    * `add_region_aggregates`, `etl/data_helpers/geo.py:267-456`; the
    * set-subset custom agg at `geo.py:398` becomes collect_set +
    * array_intersect): sum member rows into one region row per group, but
    * only emit the region when every mandatory member contributed.
    *
    * `memberOf`: (member -> region) mapping, broadcast-joined.
    * `mustHave`: (region -> mandatory members).
    */
  def regionAggregates(df: DataFrame, entityCol: String, keys: Seq[String],
                       valueCols: Seq[String], memberOf: Map[String, String],
                       mustHave: Map[String, Seq[String]] = Map.empty): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val mapping = memberOf.toSeq.toDF(entityCol, "__region")
    val joined = df.join(broadcast(mapping), Seq(entityCol), "inner")
    val aggs = valueCols.map(c => sum(col(c)).as(c)) :+
      collect_set(col(entityCol)).as("__members")
    val grouped = joined.groupBy((col("__region") +: keys.map(col)): _*).agg(aggs.head, aggs.tail: _*)
    val must = typedLit(mustHave.map { case (r, ms) => r -> ms })
    val required = element_at(must, col("__region"))
    val gate = required.isNull ||
      (size(array_intersect(required, col("__members"))) === size(required))
    grouped.filter(gate)
      .select((col("__region").as(entityCol) +: keys.map(col)) ++ valueCols.map(col): _*)
  }

  /** Per-group null counts (owid-etl `count_missing_in_groups`,
    * `dataframes.py:356-370`).
    */
  def countMissingInGroups(df: DataFrame, keys: Seq[String], valueCol: String): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(when(col(valueCol).isNull, lit(1))).as("n_missing"),
           count(lit(1)).as("n_total"))

  /** Order-invariant content checksum — sum of per-row xxhash64 over the
    * named columns, ANSI-safe via decimal accumulation (owid-etl
    * `calculate_checksum_data`, `etl/grapher_import.py:419-421`).
    */
  def contentChecksum(df: DataFrame, columns: Seq[String]): Column =
    sum(xxhash64(columns.sorted.map(col): _*).cast("decimal(38,0)"))

  /** min/max time span per group (owid-etl timespan formatting,
    * `grapher_import.py:605-616`).
    */
  def timespan(df: DataFrame, keys: Seq[String], timeCol: String): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(min(col(timeCol)).as("min_t"), max(col(timeCol)).as("max_t"))
}
