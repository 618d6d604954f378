package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Row}
import org.apache.spark.sql.functions._

/** Entity-resolution / harmonization + per-group apply (SURVEY.md §2.2
  * `harmonize_countries`, §2.11 groupby-apply).
  */
object HarmonizeOps {

  /** Canonicalize entity names from a mapping table with exclusions —
    * owid-etl `harmonize_countries` (`etl/data_helpers/geo.py:459-548`):
    * broadcast-join against the mapping, optionally drop excluded and
    * unmapped entities, collect unmapped names for warnings.
    * Returns (harmonized, unmappedValues).
    */
  def harmonize(df: DataFrame, column: String, mapping: Map[String, String],
                excluded: Seq[String] = Nil,
                dropUnmapped: Boolean = false): (DataFrame, Seq[String]) = {
    val base = if (excluded.nonEmpty) df.filter(!col(column).isin(excluded: _*)) else df
    val m = typedLit(mapping)
    val mapped = element_at(m, col(column))
    val unmapped = base.filter(mapped.isNull)
      .select(col(column)).distinct().limit(100)
      .collect().map(_.getString(0)).toSeq
    val out =
      if (dropUnmapped) base.filter(mapped.isNotNull).withColumn(column, mapped)
      else base.withColumn(column, coalesce(mapped, col(column)))
    (out, unmapped)
  }

  /** Arbitrary per-group transform — owid-etl `groupby().apply(func)`
    * (`tables.py:1148-1182`) as the typed Spark idiom:
    * `groupByKey(...).flatMapGroups`. Used only when the logic genuinely
    * can't be expressed with window/agg expressions.
    */
  def groupApply[K: Encoder, T: Encoder, U: Encoder](
      ds: Dataset[T], key: T => K)(f: (K, Iterator[T]) => IterableOnce[U]): Dataset[U] =
    ds.groupByKey(key).flatMapGroups((k: K, it: Iterator[T]) => f(k, it).iterator)
}
