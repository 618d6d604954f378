package graft.ops

import java.io.FileInputStream
import javax.xml.parsers.DocumentBuilderFactory
import org.w3c.dom.Element
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Row-oriented XML origin reader — the `pd.read_xml` capability of the
  * reference's format dispatch (`lib/datautils/owid/datautils/io/df.py:82`)
  * with pandas' default orientation: each element matching the row tag
  * (default: every direct child of the document root) becomes one row;
  * its ATTRIBUTES and its simple child elements' text become columns.
  * Column set is the union across rows; missing fields are null. Types
  * are inferred long → double → boolean → string ([[InferredFrame]],
  * plain true/false columns infer boolean since xml carries no cell
  * typing).
  *
  * DRIVER-SIDE by design, like the xlsx/feather readers: xml origins are
  * snapshot-scale inputs. Doctypes are disallowed (untrusted input).
  * Nested structure below one level is rejected loudly rather than
  * silently flattened or stringified.
  */
object XmlReader {

  def read(spark: SparkSession, path: String, rowTag: Option[String] = None): DataFrame = {
    val f = DocumentBuilderFactory.newInstance()
    f.setNamespaceAware(true)
    f.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
    f.setExpandEntityReferences(false)
    val in = new FileInputStream(path)
    val doc = try f.newDocumentBuilder().parse(in) finally in.close()
    val root = doc.getDocumentElement

    def childElements(e: Element): Seq[Element] = {
      val nl = e.getChildNodes
      (0 until nl.getLength).map(nl.item).collect { case el: Element => el }
    }
    val rowElems = rowTag match {
      case Some(tag) =>
        val nl = doc.getElementsByTagNameNS("*", tag)
        (0 until nl.getLength).map(nl.item(_).asInstanceOf[Element])
      case None => childElements(root)
    }
    require(rowElems.nonEmpty,
      s"xml: no row elements${rowTag.fold("")(t => s" matching '$t'")} in '$path'")

    // one (column -> value) map per row: attributes first, then simple
    // child elements (pandas read_xml order); a child with its own child
    // elements is nested beyond the row/column model — loud
    val maps = rowElems.map { e =>
      val attrs = (0 until e.getAttributes.getLength).map { i =>
        val a = e.getAttributes.item(i)
        a.getNodeName -> a.getNodeValue
      }
      val kids = childElements(e).map { k =>
        if (childElements(k).nonEmpty) throw new IllegalArgumentException(
          s"xml: row element '${e.getTagName}' has nested structure under " +
          s"'${k.getTagName}' — not a row/column document (flatten upstream " +
          "or point rowTag at the repeating element)")
        k.getTagName -> k.getTextContent
      }
      attrs ++ kids // ordered pairs: attributes first, then children
    }
    // union column set in FIRST-SEEN document order (toMap would scramble it)
    val names = maps.foldLeft(Vector.empty[String])((acc, pairs) =>
      acc ++ pairs.map(_._1).filterNot(acc.contains))
    val rows = maps.map { pairs =>
      val m = pairs.toMap
      names.map(n => (m.get(n), false)).toVector
    }
    InferredFrame.build(spark, names, rows, plainBool = true)
  }
}
