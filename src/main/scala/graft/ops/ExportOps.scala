package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-key grouped JSON export — the reference's R2/S3 sink shape: one
  * `{entities, years, values}` JSON document per variable key (owid-etl
  * `etl/grapher/data_metadata.py:14-24`, uploaded per-variable in
  * `etl/grapher_import.py`).
  *
  * The document is built with string concat over a deterministically
  * sorted struct array (ONE hash aggregation per key, arrays never leave
  * the executor) instead of `to_json`, so the byte output is
  * engine-portable and oracle-checkable.
  */
object ExportOps {

  /** One row per key: (key, doc) where doc =
    * `{"entities":[...],"years":[...],"values":[...]}` with the three
    * arrays aligned and sorted by (time, entity). Numeric columns only —
    * the grapher export shape.
    */
  def perKeyJson(df: DataFrame, keyCol: String, entityCol: String,
                 timeCol: String, valueCol: String): DataFrame = {
    val packed = df.groupBy(col(keyCol).as("key"))
      .agg(array_sort(collect_list(struct(
        col(timeCol).as("t"), col(entityCol).as("e"), col(valueCol).as("v")))).as("rows"))
    def arr(field: String): Column =
      concat_ws(",", transform(col("rows"), r => r.getField(field).cast("string")))
    packed.select(col("key"),
      concat(lit("{\"entities\":["), arr("e"),
             lit("],\"years\":["), arr("t"),
             lit("],\"values\":["), arr("v"), lit("]}")).as("doc"))
  }

  /** The at-scale sink: one directory per key, one JSON line per doc —
    * a single dynamic-partition write job (no per-key driver loop).
    */
  def writePerKeyJson(df: DataFrame, keyCol: String, entityCol: String,
                      timeCol: String, valueCol: String, outDir: String): Unit =
    perKeyJson(df, keyCol, entityCol, timeCol, valueCol)
      .withColumn("key_part", col("key"))
      .repartition(col("key_part"))
      .write.mode("overwrite").partitionBy("key_part").json(outDir)
}
