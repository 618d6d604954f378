package graft.ops

import java.util.zip.ZipFile
import javax.xml.parsers.DocumentBuilderFactory
import org.w3c.dom.{Document, Element}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Pure-JVM `.xlsx` origin reader — the `pr.read_excel` capability
  * (reference dispatch: `lib/datautils/owid/datautils/io/df.py:81`,
  * pandas `read_excel`) without an external dependency: an xlsx workbook
  * is a zip of small XML parts (OOXML SpreadsheetML).
  *
  * DRIVER-SIDE by design: excel origins are snapshot/config-scale inputs
  * a human maintained — kilobytes to a few megabytes — not data-lake
  * scans. The parsed rows land in an ordinary distributed DataFrame for
  * everything downstream.
  *
  * Supported: multiple sheets (by name or first-in-workbook order),
  * shared strings incl. rich-text runs, inline strings, numbers,
  * booleans, formula cached values, sparse rows (gap cells → null),
  * header row → column names (snake_cased by the TableIO wrapper).
  * Column types are inferred long → double → boolean → string over the
  * data rows, matching the csv reader's inference spirit.
  *
  * Documented boundary: cell STYLES are not read, so date cells surface
  * as their raw Excel serial numbers (a style-table date decode would be
  * guesswork without locale context; the reference's pandas reader
  * depends on openpyxl for the same).
  */
object XlsxReader {

  private def secureDom(): DocumentBuilderFactory = {
    val f = DocumentBuilderFactory.newInstance()
    f.setNamespaceAware(true)
    // an origin file is UNTRUSTED input: no external entities, no doctypes
    f.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
    f.setExpandEntityReferences(false)
    f
  }

  private def parseEntry(zip: ZipFile, name: String): Option[Document] =
    Option(zip.getEntry(name)).map { e =>
      val in = zip.getInputStream(e)
      try secureDom().newDocumentBuilder().parse(in) finally in.close()
    }

  private def elems(doc: Document, local: String): Seq[Element] = {
    val nl = doc.getElementsByTagNameNS("*", local)
    (0 until nl.getLength).map(nl.item(_).asInstanceOf[Element])
  }
  private def childElems(e: Element, local: String): Seq[Element] = {
    val nl = e.getElementsByTagNameNS("*", local)
    (0 until nl.getLength).map(nl.item(_).asInstanceOf[Element])
  }

  /** "B3" → 0-based column index 1 (letters only; digits are the row). */
  private[graft] def colIndex(ref: String): Int = {
    val letters = ref.takeWhile(_.isLetter).toUpperCase
    require(letters.nonEmpty, s"malformed cell ref '$ref'")
    letters.foldLeft(0)((acc, c) => acc * 26 + (c - 'A' + 1)) - 1
  }

  /** Raw cell grid of one sheet: rows of Option[String] plus a per-cell
    * "was this a boolean cell" marker used by type inference.
    */
  private def sheetGrid(zip: ZipFile, sheetPath: String,
                        shared: IndexedSeq[String]): Seq[Vector[(Option[String], Boolean)]] = {
    val doc = parseEntry(zip, sheetPath).getOrElse(
      throw new IllegalArgumentException(s"xlsx: missing worksheet part '$sheetPath'"))
    elems(doc, "row").map { row =>
      val cells = scala.collection.mutable.ArrayBuffer.empty[(Int, (Option[String], Boolean))]
      var nextCol = 0
      childElems(row, "c").foreach { c =>
        val at = Option(c.getAttribute("r")).filter(_.nonEmpty)
          .map(colIndex).getOrElse(nextCol)
        nextCol = at + 1
        val t = Option(c.getAttribute("t")).filter(_.nonEmpty).getOrElse("n")
        val v = childElems(c, "v").headOption.map(_.getTextContent)
        val value: Option[String] = t match {
          case "s" => v.map(idx => shared(idx.trim.toInt))
          case "inlineStr" =>
            // <is> may hold rich-text runs: concatenate every <t>
            childElems(c, "is").headOption
              .map(is => childElems(is, "t").map(_.getTextContent).mkString)
          case "b" => v.map(x => if (x.trim == "1") "true" else "false")
          case "e" => None // error cell → null
          case _ => v // "n", "str" (formula cached string)
        }
        cells += at -> (value, t == "b")
      }
      val width = cells.map(_._1).maxOption.map(_ + 1).getOrElse(0)
      val out = Array.fill[(Option[String], Boolean)](width)((None, false))
      cells.foreach { case (i, cv) => out(i) = cv }
      out.toVector
    }
  }

  /** Sheet name → worksheet zip path, in workbook order. */
  private def sheetTargets(zip: ZipFile): Seq[(String, String)] = {
    val wb = parseEntry(zip, "xl/workbook.xml").getOrElse(
      throw new IllegalArgumentException("not an xlsx workbook: missing xl/workbook.xml"))
    val rels = parseEntry(zip, "xl/_rels/workbook.xml.rels").getOrElse(
      throw new IllegalArgumentException("xlsx: missing xl/_rels/workbook.xml.rels"))
    val ridToTarget = elems(rels, "Relationship").map { r =>
      r.getAttribute("Id") -> r.getAttribute("Target")
    }.toMap
    elems(wb, "sheet").map { s =>
      val rid = Option(s.getAttributeNS(
        "http://schemas.openxmlformats.org/officeDocument/2006/relationships", "id"))
        .filter(_.nonEmpty)
        .getOrElse(s.getAttribute("r:id"))
      val target = ridToTarget.getOrElse(rid, throw new IllegalArgumentException(
        s"xlsx: sheet '${s.getAttribute("name")}' references unknown relationship '$rid'"))
      val path = if (target.startsWith("/")) target.stripPrefix("/")
                 else if (target.startsWith("xl/")) target else s"xl/$target"
      s.getAttribute("name") -> path
    }
  }

  private def sharedStrings(zip: ZipFile): IndexedSeq[String] =
    parseEntry(zip, "xl/sharedStrings.xml").map { doc =>
      elems(doc, "si").map(si => childElems(si, "t").map(_.getTextContent).mkString).toIndexedSeq
    }.getOrElse(IndexedSeq.empty)

  /** Read one sheet into a DataFrame: first row = header, remaining rows =
    * data, per-column types inferred (long → double → boolean → string).
    */
  def read(spark: SparkSession, path: String, sheet: Option[String] = None): DataFrame = {
    val zip = new ZipFile(path)
    try {
      val sheets = sheetTargets(zip)
      val target = sheet match {
        case Some(n) => sheets.find(_._1 == n).getOrElse(throw new IllegalArgumentException(
          s"xlsx: no sheet named '$n' (have: ${sheets.map(_._1).mkString(", ")})"))._2
        case None => sheets.headOption.getOrElse(
          throw new IllegalArgumentException("xlsx: workbook has no sheets"))._2
      }
      val grid = sheetGrid(zip, target, sharedStrings(zip))
      require(grid.nonEmpty, s"xlsx: sheet is empty in '$path'")
      val width = grid.map(_.size).max
      def pad(r: Vector[(Option[String], Boolean)]) =
        r.padTo(width, (Option.empty[String], false))
      val header = pad(grid.head).zipWithIndex.map { case ((v, _), i) =>
        v.map(_.trim).filter(_.nonEmpty).getOrElse(s"col_$i")
      }
      // duplicate headers get positional suffixes — loud renames beat
      // silently dropped columns
      val seen = scala.collection.mutable.Map.empty[String, Int]
      val names = header.map { h =>
        val n = seen.getOrElse(h, 0); seen(h) = n + 1
        if (n == 0) h else s"${h}_$n"
      }
      val data = grid.tail.map(pad)
      // drop fully-empty trailing rows (grid XML often carries them)
      val rows = data.filterNot(_.forall(_._1.isEmpty))
      InferredFrame.build(spark, names, rows, plainBool = false)
    } finally zip.close()
  }
}

/** Shared column-type inference + DataFrame construction for the
  * driver-side grid readers ([[XlsxReader]], [[XmlReader]]): per column,
  * long → double → boolean → string over the observed values; empty cells
  * are nulls. `plainBool = false` requires the source to have MARKED a
  * cell boolean (xlsx `t="b"` — the strings "true"/"false" in a text
  * column stay text); `plainBool = true` lets all-true/false columns
  * infer boolean (xml, where there is no cell typing).
  */
private[ops] object InferredFrame {
  private val LongRe = "[+-]?\\d{1,19}".r
  private def isLong(s: String) =
    LongRe.matches(s) && scala.util.Try(s.toLong).isSuccess
  private def isDouble(s: String) = scala.util.Try(s.toDouble).isSuccess

  def build(spark: SparkSession, names: Seq[String],
            rows: Seq[Vector[(Option[String], Boolean)]],
            plainBool: Boolean): DataFrame = {
    val width = names.size
    def colType(i: Int): DataType = {
      val vs = rows.flatMap(_(i)._1)
      val marked = rows.exists(_(i)._2)
      if (vs.isEmpty) StringType
      else if ((marked || plainBool) && vs.forall(v => v == "true" || v == "false")) BooleanType
      else if (vs.forall(isLong)) LongType
      else if (vs.forall(isDouble)) DoubleType
      else StringType
    }
    val types = (0 until width).map(colType)
    val schema = StructType(names.zip(types).map { case (n, t) =>
      StructField(n, t, nullable = true) })
    val sparkRows: java.util.List[Row] = new java.util.ArrayList[Row]()
    rows.foreach { r =>
      sparkRows.add(Row.fromSeq((0 until width).map { i =>
        r(i)._1.map { v =>
          types(i) match {
            case LongType => v.toLong
            case DoubleType => v.toDouble
            case BooleanType => v == "true"
            case _ => v
          }
        }.orNull
      }))
    }
    spark.createDataFrame(sparkRows, schema)
  }
}
