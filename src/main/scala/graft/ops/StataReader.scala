package graft.ops

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Stata `.dta` origin reader — the `pd.read_stata` capability of the
  * reference's format dispatch (`lib/datautils/owid/datautils/io/df.py:73`),
  * pure JVM, for the modern tagged container (formats 117 and 118; the
  * public spec is `help dta` in Stata's documentation).
  *
  * Sections are located through the `<map>` offset table (absolute file
  * offsets written by every conforming writer) — never by scanning for
  * tag bytes, which could collide with string DATA content.
  *
  * Semantics follow pandas' defaults: value-labeled numeric columns come
  * back as their label STRINGS (convert_categoricals), and Stata missing
  * sentinels (`.`, `.a`-`.z` — values above each numeric type's missing
  * threshold) become nulls. Unlike pandas, missing support does NOT
  * force integer columns to float: they stay byte/short/int with null.
  *
  * Loud boundaries: big-endian files (MSF — none written since Stata 9),
  * `strL` columns (variable-length blobs; the reference's snapshot
  * inputs use fixed `str#`), business-calendar/date formats surface as
  * their raw numerics (same boundary as the xlsx reader's serials).
  *
  * DRIVER-SIDE by design like the other origin readers: .dta origins are
  * snapshot-scale inputs, not lake scans.
  */
object StataReader {

  private final case class Layout(varName: Int, fmt: Int, lblName: Int, nBytes: Int)
  // field widths per release: 117 = Stata 13, 118 = Stata 14+ (UTF-8)
  private val layouts = Map(117 -> Layout(33, 49, 33, 4), 118 -> Layout(129, 57, 129, 8))

  // type codes: 1..2045 fixed str#, 32768 strL, then numerics
  private val TDouble = 65526; private val TFloat = 65527
  private val TLong = 65528; private val TInt = 65529; private val TByte = 65530

  // missing-value thresholds ('.' and '.a'-'.z' sit above these)
  private val ByteMiss = 100; private val IntMiss = 32740
  private val LongMiss = 2147483620L
  private val FloatMiss = 1.701e38f; private val DoubleMiss = 8.988e307

  private def cstr(b: Array[Byte], at: Int, width: Int): String = {
    var end = at
    val stop = at + width
    while (end < stop && b(end) != 0) end += 1
    new String(b, at, end - at, StandardCharsets.UTF_8)
  }

  private def expectTag(b: Array[Byte], at: Int, tag: String): Int = {
    val t = s"<$tag>".getBytes(StandardCharsets.US_ASCII)
    require(b.length >= at + t.length && t.indices.forall(i => b(at + i) == t(i)),
      s"dta: expected <$tag> at offset $at")
    at + t.length
  }

  def read(spark: SparkSession, path: String): DataFrame = {
    val bytes = Files.readAllBytes(Paths.get(path))
    val head = new String(bytes, 0, math.min(120, bytes.length), StandardCharsets.US_ASCII)
    require(head.startsWith("<stata_dta><header><release>"),
      s"not a tagged .dta file (format 117/118): '$path'")
    val release = head.substring(28, 31).toInt
    val layout = layouts.getOrElse(release, throw new IllegalArgumentException(
      s"dta: unsupported release $release (supported: 117, 118)"))
    val bo = head.indexOf("<byteorder>") + 11
    require(head.substring(bo, bo + 3) == "LSF",
      "dta: big-endian (MSF) files are not supported")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)

    // header scalars live before any binary data — tag positions in the
    // header region are unambiguous
    val kAt = head.indexOf("<K>") + 3
    val nvar = buf.getShort(kAt) & 0xffff
    val nAt = head.indexOf("<N>") + 3
    val nobs = if (layout.nBytes == 8) buf.getLong(nAt)
               else (buf.getInt(nAt) & 0xffffffffL)
    require(nobs <= Int.MaxValue, s"dta: $nobs rows exceed a driver-side read")

    // <map> is found by WALKING the fixed header layout, not by scanning
    // (a user-written dataset label may contain tag-like text):
    // K and N sit before the label, so their head positions are exact
    val afterN = nAt + layout.nBytes + 4 // "</N>"
    val labelLen = if (release >= 118) buf.getShort(afterN + 7) & 0xffff
                   else bytes(afterN + 7) & 0xff
    val labelLenBytes = if (release >= 118) 2 else 1
    val afterLabel = afterN + 7 + labelLenBytes + labelLen + 8 // "<label>" len text "</label>"
    val tsLen = bytes(afterLabel + 11) & 0xff
    val afterTs = afterLabel + 11 + 1 + tsLen + 12 // "<timestamp>" len text "</timestamp>"
    val mapAt = afterTs + 9 // "</header>"
    // section offsets from <map>: 14 absolute int64s, each pointing at a
    // section's opening '<'
    val mapBody = expectTag(bytes, mapAt, "map")
    val off = (0 until 14).map(i => buf.getLong(mapBody + 8 * i))
    val (typesOff, namesOff, lblNamesOff, dataOff, lblsOff) =
      (off(2), off(3), off(6), off(9), off(11))

    val typesAt = expectTag(bytes, typesOff.toInt, "variable_types")
    val types = (0 until nvar).map(i => buf.getShort(typesAt + 2 * i) & 0xffff)
    types.zipWithIndex.foreach { case (t, i) =>
      require(t == TDouble || t == TFloat || t == TLong || t == TInt || t == TByte ||
        (t >= 1 && t <= 2045), t match {
          case 32768 => s"dta: column $i is strL (variable-length blob) — unsupported"
          case other => s"dta: column $i has unknown type code $other"
        })
    }
    val namesAt = expectTag(bytes, namesOff.toInt, "varnames")
    val names = (0 until nvar).map(i => cstr(bytes, namesAt + layout.varName * i, layout.varName))
    val lblNamesAt = expectTag(bytes, lblNamesOff.toInt, "value_label_names")
    val lblNames = (0 until nvar).map(i =>
      cstr(bytes, lblNamesAt + layout.lblName * i, layout.lblName))

    // value-label tables: <lbl> len(4) name(width) pad(3) n(4) txtlen(4)
    // off[n] val[n] txt — repeated until </value_labels>
    val labels = scala.collection.mutable.Map.empty[String, Map[Int, String]]
    var p = expectTag(bytes, lblsOff.toInt, "value_labels")
    val lblTag = "<lbl>".getBytes(StandardCharsets.US_ASCII)
    while (p + lblTag.length <= bytes.length &&
           lblTag.indices.forall(i => bytes(p + i) == lblTag(i))) {
      p += lblTag.length
      val tableLen = buf.getInt(p); p += 4
      val labName = cstr(bytes, p, layout.lblName); p += layout.lblName + 3
      val n = buf.getInt(p); val txtLen = buf.getInt(p + 4)
      require(tableLen == 8 + 8 * n + txtLen, s"dta: corrupt value-label table '$labName'")
      val offs = (0 until n).map(i => buf.getInt(p + 8 + 4 * i))
      val vals = (0 until n).map(i => buf.getInt(p + 8 + 4 * n + 4 * i))
      val txtAt = p + 8 + 8 * n
      labels(labName) = vals.zip(offs).map { case (v, o) =>
        v -> cstr(bytes, txtAt + o, txtLen - o)
      }.toMap
      p += tableLen
      p = expectTag(bytes, p, "/lbl")
    }

    def width(t: Int): Int = t match {
      case TDouble => 8; case TFloat => 4; case TLong => 4; case TInt => 2; case TByte => 1
      case s => s
    }
    val rowWidth = types.map(width).sum
    val colOff = types.scanLeft(0)(_ + width(_))

    val labeled = (0 until nvar).map(i =>
      lblNames(i).nonEmpty && labels.contains(lblNames(i)))
    val schema = StructType((0 until nvar).map { i =>
      val dt: DataType =
        if (labeled(i)) StringType
        else types(i) match {
          case TDouble => DoubleType; case TFloat => FloatType
          case TLong => IntegerType; case TInt => ShortType; case TByte => ByteType
          case _ => StringType
        }
      StructField(names(i), dt, nullable = true)
    })

    val dataAt = expectTag(bytes, dataOff.toInt, "data")
    val rows: java.util.List[Row] = new java.util.ArrayList[Row](nobs.toInt)
    (0 until nobs.toInt).foreach { r =>
      val base = dataAt + r * rowWidth
      rows.add(Row.fromSeq((0 until nvar).map { i =>
        val at = base + colOff(i)
        val code: Option[Long] = types(i) match { // numeric code pre-missing-check
          case TByte => Some(bytes(at).toLong)
          case TInt => Some(buf.getShort(at).toLong)
          case TLong => Some(buf.getInt(at).toLong)
          case _ => None
        }
        types(i) match {
          case TByte | TInt | TLong =>
            val v = code.get
            val miss = types(i) match {
              case TByte => v > ByteMiss
              case TInt => v > IntMiss
              case _ => v > LongMiss
            }
            if (miss) null
            else if (labeled(i)) labels(lblNames(i)).getOrElse(v.toInt,
              throw new IllegalArgumentException(
                s"dta: column '${names(i)}' value $v has no entry in value label " +
                s"'${lblNames(i)}'"))
            else types(i) match {
              case TByte => v.toByte; case TInt => v.toShort; case _ => v.toInt
            }
          case TDouble => val d = buf.getDouble(at); if (d >= DoubleMiss) null else d
          case TFloat => val f = buf.getFloat(at); if (f >= FloatMiss) null else f
          case s => cstr(bytes, at, s)
        }
      }))
    }
    spark.createDataFrame(rows, schema)
  }
}
