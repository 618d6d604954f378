package graft.ops

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.json4s.{Formats, NoTypeHints}
import org.json4s.jackson.Serialization

/** Format readers/writers with metadata sidecars (SURVEY.md §2.1; owid-etl
  * `Table.read/to` dispatch `tables.py:147-192`, sidecar save/load
  * `tables.py:300-348`) and the dtype repack pass (owid-etl
  * `lib/repack/owid/repack/__init__.py:61-133`).
  */
object TableIO {
  implicit private val formats: Formats = Serialization.formats(NoTypeHints)

  private final case class Sidecar(table: TableMeta, fields: Map[String, VariableMeta])

  private def sidecarPath(dataPath: String) = Paths.get(dataPath + ".meta.json")

  /** Write parquet + `<path>.meta.json` sidecar carrying table + per-column
    * metadata (from StructField.metadata).
    */
  def writeParquet(df: DataFrame, path: String, meta: TableMeta): Unit = {
    df.write.mode("overwrite").parquet(path)
    val fields = df.schema.fields.flatMap(f =>
      VariableMeta.fromSpark(f.metadata).map(f.name -> _)).toMap
    Files.write(sidecarPath(path),
      Serialization.writePretty(Sidecar(meta, fields)).getBytes(StandardCharsets.UTF_8))
  }

  /** Read parquet, re-attaching sidecar metadata when present
    * (`read_parquet`, `tables.py:311-384`).
    */
  def readParquet(spark: SparkSession, path: String): (DataFrame, Option[TableMeta]) = {
    val df = spark.read.parquet(path)
    val sp = sidecarPath(path)
    if (Files.exists(sp)) {
      val sc = Serialization.read[Sidecar](new String(Files.readAllBytes(sp)))
      val out = sc.fields.foldLeft(df) { case (d, (c, m)) =>
        if (d.columns.contains(c)) MetaOps.withVarMeta(d, c, m) else d
      }
      (out, Some(sc.table))
    } else (df, None)
  }

  /** CSV reader with schema + snake_case normalization (capability of
    * `pr.read_csv`, `tables.py:1639-1797`).
    */
  def readCsv(spark: SparkSession, path: String, schema: Option[StructType] = None,
              header: Boolean = true): DataFrame = {
    val r = spark.read.option("header", header.toString)
    val df = schema.map(r.schema).getOrElse(r.option("inferSchema", "true")).csv(path)
    TableOps.underscore(df)
  }

  /** JSON-lines reader (capability of `pr.read_json`). */
  def readJson(spark: SparkSession, path: String, schema: Option[StructType] = None): DataFrame = {
    val r = spark.read
    schema.map(r.schema).getOrElse(r).json(path)
  }

  /** Excel origin reader (capability of `pr.read_excel` via the format
    * dispatch in `lib/datautils/owid/datautils/io/df.py:81`): pure-JVM
    * OOXML parse ([[XlsxReader]]), snake_case-normalized like the csv
    * reader.
    */
  def readExcel(spark: SparkSession, path: String, sheet: Option[String] = None): DataFrame =
    TableOps.underscore(XlsxReader.read(spark, path, sheet))

  /** Feather v2 (Arrow IPC file) origin reader (capability of
    * `pd.read_feather`, `io/df.py:74`) via [[FeatherReader]]. */
  def readFeather(spark: SparkSession, path: String): DataFrame =
    FeatherReader.read(spark, path)

  /** Row-oriented XML origin reader (capability of `pd.read_xml`,
    * `io/df.py:82`) via [[XmlReader]], snake_case-normalized. */
  def readXml(spark: SparkSession, path: String, rowTag: Option[String] = None): DataFrame =
    TableOps.underscore(XmlReader.read(spark, path, rowTag))

  /** Stata .dta origin reader (capability of `pd.read_stata`,
    * `io/df.py:73`) via [[StataReader]]: formats 117/118, value labels
    * applied, missing sentinels as nulls. */
  def readStata(spark: SparkSession, path: String): DataFrame =
    StataReader.read(spark, path)

  /** Width-narrowing repack: integral columns are downcast to the smallest
    * integer type that fits their observed min/max (lossless part of
    * owid-etl's `repack_series`/`shrink_integer`,
    * `repack/__init__.py:86-113`). One aggregate job for all columns.
    * `floatRtol > 0` additionally narrows double→float where the maximum
    * relative round-trip error stays within the tolerance — the reference's
    * deliberately LOSSY compaction (`series_eq`, rtol=1e-5,
    * `repack/__init__.py:136-154`), opt-in here.
    */
  def repack(df: DataFrame, floatRtol: Double = 0.0): DataFrame = {
    val packed = repackFloats(repackInts(df), floatRtol)
    packed
  }

  private def repackInts(df: DataFrame): DataFrame = {
    val intCols = df.schema.fields.filter(f => f.dataType == LongType || f.dataType == IntegerType)
    if (intCols.isEmpty) return df
    val aggs = intCols.flatMap(f => Seq(min(col(f.name)).cast("long").as(s"mn_${f.name}"),
      max(col(f.name)).cast("long").as(s"mx_${f.name}")))
    val row = df.select(aggs.toSeq: _*).collect()(0)
    intCols.foldLeft(df) { (d, f) =>
      val mn = if (row.isNullAt(row.fieldIndex(s"mn_${f.name}"))) 0L else row.getLong(row.fieldIndex(s"mn_${f.name}"))
      val mx = if (row.isNullAt(row.fieldIndex(s"mx_${f.name}"))) 0L else row.getLong(row.fieldIndex(s"mx_${f.name}"))
      val target: DataType =
        if (mn >= Byte.MinValue && mx <= Byte.MaxValue) ByteType
        else if (mn >= Short.MinValue && mx <= Short.MaxValue) ShortType
        else if (mn >= Int.MinValue && mx <= Int.MaxValue) IntegerType
        else LongType
      if (target != f.dataType) d.withColumn(f.name, col(f.name).cast(target)) else d
    }
  }

  private def repackFloats(df: DataFrame, rtol: Double): DataFrame = {
    if (rtol <= 0) return df
    val dblCols = df.schema.fields.filter(_.dataType == DoubleType)
    if (dblCols.isEmpty) return df
    // max relative error of a double->float->double round-trip, one job
    val aggs = dblCols.map { f =>
      val c = col(f.name)
      val rt = c.cast(FloatType).cast(DoubleType)
      max(when(c === 0.0 || c.isNull, lit(0.0))
        .otherwise(abs(rt - c) / abs(c))).as(f.name)
    }
    val row = df.select(aggs.toSeq: _*).collect()(0)
    dblCols.zipWithIndex.foldLeft(df) { case (d, (f, i)) =>
      val err = if (row.isNullAt(i)) 0.0 else row.getDouble(i)
      if (err <= rtol) d.withColumn(f.name, col(f.name).cast(FloatType)) else d
    }
  }
}
