package graft.ops

import java.io.FileInputStream
import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector._
import org.apache.arrow.vector.ipc.ArrowFileReader
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Feather v2 origin reader — the `pd.read_feather` capability of the
  * reference's format dispatch (`lib/datautils/owid/datautils/io/df.py:74`).
  * Feather v2 IS the Arrow IPC *file* format, and Spark already ships
  * arrow-java for its Python interop, so the reader is a thin walk over
  * `ArrowFileReader` record batches — no new dependency.
  *
  * DRIVER-SIDE by design, like [[XlsxReader]]: feather origins are
  * snapshot-scale inputs; the rows land in an ordinary distributed
  * DataFrame for everything downstream.
  *
  * Supported Arrow types: signed ints (8/16/32/64), float32/64, utf8,
  * bool, date32 (→ DateType), timestamp micros (→ TimestampType).
  * Anything else is rejected by name — silently stringifying an
  * unmodeled type would corrupt downstream schemas.
  */
object FeatherReader {

  private def sparkType(v: ValueVector): DataType = v match {
    case _: TinyIntVector => ByteType
    case _: SmallIntVector => ShortType
    case _: IntVector => IntegerType
    case _: BigIntVector => LongType
    case _: Float4Vector => FloatType
    case _: Float8Vector => DoubleType
    case _: VarCharVector => StringType
    case _: BitVector => BooleanType
    case _: DateDayVector => DateType
    case _: TimeStampMicroVector => TimestampType
    case other => throw new IllegalArgumentException(
      s"feather: unsupported arrow type for column '${other.getName}': " +
      other.getField.getType)
  }

  private def value(v: ValueVector, i: Int): Any = {
    if (v.isNull(i)) return null
    v match {
      case x: TinyIntVector => x.get(i)
      case x: SmallIntVector => x.get(i)
      case x: IntVector => x.get(i)
      case x: BigIntVector => x.get(i)
      case x: Float4Vector => x.get(i)
      case x: Float8Vector => x.get(i)
      case x: VarCharVector => new String(x.get(i), java.nio.charset.StandardCharsets.UTF_8)
      case x: BitVector => x.get(i) == 1
      case x: DateDayVector => java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(x.get(i).toLong))
      case x: TimeStampMicroVector => java.sql.Timestamp.from(
        java.time.Instant.EPOCH.plus(x.get(i), java.time.temporal.ChronoUnit.MICROS))
      case other => throw new IllegalArgumentException(
        s"feather: unsupported arrow type for column '${other.getName}'")
    }
  }

  def read(spark: SparkSession, path: String): DataFrame = {
    val allocator = new RootAllocator()
    val in = new FileInputStream(path)
    val reader = new ArrowFileReader(in.getChannel, allocator)
    try {
      val root = reader.getVectorSchemaRoot
      val vectors0 = root.getFieldVectors
      val n = vectors0.size()
      val rows: java.util.List[Row] = new java.util.ArrayList[Row]()
      var schema: StructType = null
      while (reader.loadNextBatch()) {
        val vectors = root.getFieldVectors
        if (schema == null)
          schema = StructType((0 until n).map { c =>
            val v = vectors.get(c)
            StructField(v.getName, sparkType(v), nullable = true)
          })
        (0 until root.getRowCount).foreach { r =>
          rows.add(Row.fromSeq((0 until n).map(c => value(vectors.get(c), r))))
        }
      }
      if (schema == null) // zero record batches: schema only
        schema = StructType((0 until n).map { c =>
          val v = vectors0.get(c)
          StructField(v.getName, sparkType(v), nullable = true)
        })
      spark.createDataFrame(rows, schema)
    } finally {
      reader.close(); in.close(); allocator.close()
    }
  }
}
