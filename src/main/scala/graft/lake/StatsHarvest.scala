package graft.lake

import scala.jdk.CollectionConverters._
import org.apache.parquet.column.statistics.Statistics
import org.apache.parquet.hadoop.metadata.BlockMetaData
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import org.apache.parquet.schema.LogicalTypeAnnotation
import org.apache.spark.sql.types._

/** Harvest per-column min/max/null-count [[ColStat]]s from parquet footer
  * metadata at file-adoption time — a driver-side metadata read off the
  * blocks the adopter already holds, no Spark job, no data I/O. These are
  * the Delta/Iceberg data-skipping statistics; [[DataSkipping]] consumes
  * them at read time to exclude whole files from a filtered scan.
  *
  * Values are rendered into the CATALYST-INTERNAL domain of the column's
  * Spark type so prune-time comparison needs no parquet knowledge:
  * timestamps as epoch micros, dates as epoch days, integrals as longs,
  * float/double via `toString` (exact round-trip), strings as raw UTF-8.
  *
  * Soundness notes:
  *  - Parquet drops min/max for float/double chunks that saw NaN, and for
  *    INT96 timestamps; absent bounds render as `min/max = None` = "may
  *    match anything". Pruning only ever acts on PRESENT bounds.
  *  - Binary (string) stats may be writer-truncated, but parquet's
  *    truncator preserves bound validity (see [[ColStat]] scaladoc).
  *  - `nulls` is poisoned to -1 (unknown) if ANY row group does not carry
  *    a null count, so all-null / no-null deductions never overreach.
  */
object StatsHarvest {

  /** Manifest-growth bound on wide tables: stats are harvested for the
    * first `MAX_STATS_COLS` columns of the stats schema, in schema order
    * (put skip-relevant columns first; the transcripts schema is 8 wide).
    */
  val MAX_STATS_COLS = 32

  /** One file's stats: schema-ordered, capped, keyed by column name.
    * Returns None only when nothing at all could be harvested.
    */
  def fromBlocks(blocks: Seq[BlockMetaData], schema: StructType): Option[Map[String, ColStat]] = {
    val out = schema.fields.iterator.take(MAX_STATS_COLS).flatMap { f =>
      columnStat(blocks, f.name, f.dataType).map(f.name -> _)
    }.toMap
    if (out.isEmpty) None else Some(out)
  }

  private def columnStat(blocks: Seq[BlockMetaData], name: String, dt: DataType): Option[ColStat] = {
    val chunks = blocks.map(b => b.getColumns.asScala.find(_.getPath.toDotString == name))
    // a column absent from ANY row group of a file written under a schema
    // that declares it would make per-file bounds meaningless — bail to
    // "unknown" (keep the file) rather than guess
    if (chunks.exists(_.isEmpty) || chunks.isEmpty) return None
    val cols = chunks.map(_.get)
    var nulls = 0L
    var nullsKnown = true
    var boundsKnown = true // EVERY chunk must contribute bounds or be provably all-null
    var minV: Option[Any] = None
    var maxV: Option[Any] = None
    val ord = ordering(dt).getOrElse(return None)
    cols.foreach { c =>
      val s: Statistics[_] = c.getStatistics
      if (s == null) { nullsKnown = false; boundsKnown = false }
      else {
        if (s.isNumNullsSet) nulls += s.getNumNulls else nullsKnown = false
        // a chunk with no usable min/max is NOT necessarily all-null:
        // parquet-mr suppresses chunk stats for oversized binary values
        // (and hasNonNullValue is then false). File-level bounds built
        // from the OTHER chunks would not cover this chunk's rows — an
        // unsound skip. Bounds survive only if every chunk either
        // contributes a convertible min/max or is PROVABLY all-null
        // (recorded null count == the chunk's value count).
        val provablyAllNull = s.isNumNullsSet && s.getNumNulls == c.getValueCount
        if (!provablyAllNull) {
          if (!s.isEmpty && s.hasNonNullValue) {
            (internal(dt, c, s.genericGetMin), internal(dt, c, s.genericGetMax)) match {
              case (Some(lo), Some(hi)) =>
                minV = Some(minV.fold(lo)(m => if (ord.lt(lo, m)) lo else m))
                maxV = Some(maxV.fold(hi)(m => if (ord.gt(hi, m)) hi else m))
              case _ => boundsKnown = false // unconvertible physical form (e.g. INT96)
            }
          } else boundsKnown = false
        }
      }
    }
    val stat = ColStat(
      if (boundsKnown) minV.map(render) else None,
      if (boundsKnown) maxV.map(render) else None,
      if (nullsKnown) nulls else -1L)
    if (stat.min.isEmpty && stat.max.isEmpty && stat.nulls < 0L) None else Some(stat)
  }

  /** Total ordering of the comparable-domain values for `dt`; None = type
    * not harvested (nested, decimal, binary-non-string, interval).
    */
  private[lake] def ordering(dt: DataType): Option[Ordering[Any]] = dt match {
    case ByteType | ShortType | IntegerType | LongType | TimestampType |
         TimestampNTZType | DateType =>
      Some(Ordering.Long.on[Any](_.asInstanceOf[Long]))
    case FloatType | DoubleType =>
      // values are -0.0/NaN-normalized on entry (internal/parse/literal),
      // so TotalOrdering here agrees with Spark's comparison semantics
      Some(Ordering.Double.TotalOrdering.on[Any](_.asInstanceOf[Double]))
    case StringType =>
      // UTF-8 UNSIGNED-BYTE order (what parquet binary stats and Spark's
      // UTF8String comparisons use) — Java's UTF-16 code-unit order
      // disagrees for supplementary characters vs the U+E000..U+FFFF range, which
      // would make pruning silently drop matching files
      Some(new Ordering[Any] {
        def compare(a: Any, b: Any): Int =
          org.apache.spark.unsafe.types.UTF8String.fromString(a.asInstanceOf[String])
            .compareTo(org.apache.spark.unsafe.types.UTF8String.fromString(b.asInstanceOf[String]))
      })
    case BooleanType => Some(Ordering.Boolean.on[Any](_.asInstanceOf[Boolean]))
    case _ => None
  }

  /** Normalize a fractional bound/literal so comparisons match Spark SQL:
    * -0.0 == 0.0 there, and a NaN BOUND is meaningless (writers that saw
    * NaN suppress stats; a NaN that leaks through must not order).
    */
  private def normFractional(d: Double): Option[Any] =
    if (d.isNaN) None else Some(if (d == 0.0d) 0.0d else d)

  /** Parquet footer value → comparable-domain value for `dt` (Long for
    * integrals/temporal, Double for fractional, String, Boolean). None =
    * the file's physical form carries no usable bound for this Spark type
    * (e.g. INT96 timestamps, or a physical/logical mismatch).
    */
  private def internal(dt: DataType,
                       c: org.apache.parquet.hadoop.metadata.ColumnChunkMetaData,
                       v: Any): Option[Any] = {
    val prim = c.getPrimitiveType
    (dt, prim.getPrimitiveTypeName) match {
      case (ByteType | ShortType | IntegerType, PrimitiveTypeName.INT32) =>
        Some(v.asInstanceOf[java.lang.Integer].longValue())
      case (DateType, PrimitiveTypeName.INT32) =>
        Some(v.asInstanceOf[java.lang.Integer].longValue())
      case (LongType, PrimitiveTypeName.INT64) =>
        Some(v.asInstanceOf[java.lang.Long].longValue())
      case (TimestampType | TimestampNTZType, PrimitiveTypeName.INT64) =>
        val micros = prim.getLogicalTypeAnnotation match {
          case t: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
            t.getUnit match {
              case LogicalTypeAnnotation.TimeUnit.MICROS => Some(v.asInstanceOf[java.lang.Long].longValue())
              case LogicalTypeAnnotation.TimeUnit.MILLIS => Some(v.asInstanceOf[java.lang.Long].longValue() * 1000L)
              case LogicalTypeAnnotation.TimeUnit.NANOS => Some(Math.floorDiv(v.asInstanceOf[java.lang.Long].longValue(), 1000L))
            }
          case _ => None
        }
        micros
      case (FloatType, PrimitiveTypeName.FLOAT) =>
        normFractional(v.asInstanceOf[java.lang.Float].doubleValue())
      case (DoubleType, PrimitiveTypeName.DOUBLE) =>
        normFractional(v.asInstanceOf[java.lang.Double].doubleValue())
      case (StringType, PrimitiveTypeName.BINARY) =>
        Some(v.asInstanceOf[org.apache.parquet.io.api.Binary].toStringUsingUTF8)
      case (BooleanType, PrimitiveTypeName.BOOLEAN) =>
        Some(v.asInstanceOf[java.lang.Boolean].booleanValue())
      case _ => None
    }
  }

  private def render(v: Any): String = v match {
    case s: String => s
    case other => other.toString
  }

  /** Prune-time inverse of [[render]]: a [[ColStat]] bound string back to
    * the comparable domain for `dt`. None = unparseable (treat as unknown).
    */
  private[lake] def parse(dt: DataType, s: String): Option[Any] = dt match {
    case ByteType | ShortType | IntegerType | LongType | TimestampType |
         TimestampNTZType | DateType => s.toLongOption
    case FloatType | DoubleType => s.toDoubleOption.flatMap(normFractional)
    case StringType => Some(s)
    case BooleanType => s.toBooleanOption
    case _ => None
  }

  /** A Catalyst LITERAL's internal value → the same comparable domain.
    * Must agree with [[parse]] exactly — both sides of every prune-time
    * comparison go through one of these two.
    */
  private[lake] def literal(dt: DataType, v: Any): Option[Any] = (dt, v) match {
    case (_, null) => None
    case (ByteType, b: Byte) => Some(b.toLong)
    case (ShortType, x: Short) => Some(x.toLong)
    case (IntegerType | DateType, i: Int) => Some(i.toLong)
    case (LongType | TimestampType | TimestampNTZType, l: Long) => Some(l)
    case (FloatType, f: Float) => normFractional(f.toDouble)
    case (DoubleType, d: Double) => normFractional(d)
    case (StringType, u: org.apache.spark.unsafe.types.UTF8String) => Some(u.toString)
    case (BooleanType, b: Boolean) => Some(b)
    case _ => None
  }
}
