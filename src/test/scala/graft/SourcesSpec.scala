package graft

import java.io.{FileOutputStream}
import java.nio.charset.StandardCharsets
import java.util.zip.{ZipEntry, ZipOutputStream}
import org.apache.spark.sql.types._
import graft.ops.{TableIO, XlsxReader}

/** Origin readers beyond csv/json/parquet: xlsx (pure-JVM OOXML parse)
  * and feather v2 (Arrow IPC file via Spark's bundled arrow-java).
  */
class SourcesSpec extends SparkSpec {

  private def writeXlsx(path: String): Unit = {
    val zos = new ZipOutputStream(new FileOutputStream(path))
    def entry(name: String, xml: String): Unit = {
      zos.putNextEntry(new ZipEntry(name))
      zos.write(xml.getBytes(StandardCharsets.UTF_8))
      zos.closeEntry()
    }
    entry("xl/workbook.xml",
      """<?xml version="1.0" encoding="UTF-8"?>
        |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"
        |          xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
        |  <sheets>
        |    <sheet name="Data" sheetId="1" r:id="rId1"/>
        |    <sheet name="Notes" sheetId="2" r:id="rId2"/>
        |  </sheets>
        |</workbook>""".stripMargin)
    entry("xl/_rels/workbook.xml.rels",
      """<?xml version="1.0" encoding="UTF-8"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |  <Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
        |  <Relationship Id="rId2" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet2.xml"/>
        |</Relationships>""".stripMargin)
    // shared strings incl. a rich-text run (two <r><t> pieces concatenate)
    entry("xl/sharedStrings.xml",
      """<?xml version="1.0" encoding="UTF-8"?>
        |<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="4" uniqueCount="4">
        |  <si><t>Country</t></si>
        |  <si><r><t>Pop </t></r><r><t>Total</t></r></si>
        |  <si><t>France</t></si>
        |  <si><t>not a number</t></si>
        |</sst>""".stripMargin)
    // header row; typed data rows: shared string, inline string (rich),
    // long, double, boolean, a gap cell, an error cell, a trailing
    // fully-empty row
    entry("xl/worksheets/sheet1.xml",
      """<?xml version="1.0" encoding="UTF-8"?>
        |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
        |  <sheetData>
        |    <row r="1">
        |      <c r="A1" t="s"><v>0</v></c>
        |      <c r="B1" t="s"><v>1</v></c>
        |      <c r="C1" t="inlineStr"><is><t>share</t></is></c>
        |      <c r="D1" t="inlineStr"><is><t>flag</t></is></c>
        |      <c r="E1" t="inlineStr"><is><t>note</t></is></c>
        |    </row>
        |    <row r="2">
        |      <c r="A2" t="s"><v>2</v></c>
        |      <c r="B2"><v>67000000</v></c>
        |      <c r="C2"><v>0.83</v></c>
        |      <c r="D2" t="b"><v>1</v></c>
        |      <c r="E2" t="s"><v>3</v></c>
        |    </row>
        |    <row r="3">
        |      <c r="A3" t="inlineStr"><is><r><t>Sp</t></r><r><t>ain</t></r></is></c>
        |      <c r="B3"><v>47000000</v></c>
        |      <c r="D3" t="b"><v>0</v></c>
        |      <c r="E3" t="e"><v>#DIV/0!</v></c>
        |    </row>
        |    <row r="4"/>
        |  </sheetData>
        |</worksheet>""".stripMargin)
    entry("xl/worksheets/sheet2.xml",
      """<?xml version="1.0" encoding="UTF-8"?>
        |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
        |  <sheetData>
        |    <row r="1"><c r="A1" t="inlineStr"><is><t>k</t></is></c></row>
        |    <row r="2"><c r="A2"><v>7</v></c></row>
        |  </sheetData>
        |</worksheet>""".stripMargin)
    zos.close()
  }

  test("xlsx reader: shared/inline/rich strings, numbers, booleans, gaps, sheets, loud errors") {
    val dir = tmpDir("xlsx")
    val path = s"$dir/book.xlsx"
    try {
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
      writeXlsx(path)
      val df = TableIO.readExcel(spark, path)
      // header snake_cased by the TableIO wrapper ("Pop Total" → pop_total)
      assert(df.columns.toSeq == Seq("country", "pop_total", "share", "flag", "note"))
      assert(df.schema("country").dataType == StringType)
      assert(df.schema("pop_total").dataType == LongType)
      assert(df.schema("share").dataType == DoubleType)
      assert(df.schema("flag").dataType == BooleanType)
      val rows = df.orderBy("country").collect()
      assert(rows.length == 2) // trailing empty row dropped
      assert(rows(0).getString(0) == "France" && rows(0).getLong(1) == 67000000L &&
        rows(0).getDouble(2) == 0.83 && rows(0).getBoolean(3) && rows(0).getString(4) == "not a number")
      // rich-text inline string concatenates; gap + error cells are null
      assert(rows(1).getString(0) == "Spain" && rows(1).isNullAt(2) && !rows(1).getBoolean(3) &&
        rows(1).isNullAt(4))
      // sheet selection by name; unknown sheet is loud with the have-list
      val notes = TableIO.readExcel(spark, path, sheet = Some("Notes"))
      assert(notes.columns.toSeq == Seq("k") && notes.collect()(0).getLong(0) == 7L)
      val bad = intercept[IllegalArgumentException](
        TableIO.readExcel(spark, path, sheet = Some("Nope")))
      assert(bad.getMessage.contains("Data") && bad.getMessage.contains("Notes"))
      // cell-ref arithmetic ("AA10" = column 26)
      assert(XlsxReader.colIndex("A1") == 0 && XlsxReader.colIndex("Z9") == 25 &&
        XlsxReader.colIndex("AA10") == 26)
    } finally rmrf(dir)
  }

  test("xml reader: attributes + simple children become typed columns; nesting is loud") {
    val dir = tmpDir("xmlsrc")
    try {
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
      val path = s"$dir/rows.xml"
      java.nio.file.Files.write(java.nio.file.Paths.get(path),
        """<?xml version="1.0" encoding="UTF-8"?>
          |<data>
          |  <row id="1"><Country>France</Country><pop>67000000</pop><share>0.83</share><eu>true</eu></row>
          |  <row id="2"><Country>Norway</Country><pop>5400000</pop><eu>false</eu><extra>x</extra></row>
          |</data>""".stripMargin.getBytes(StandardCharsets.UTF_8))
      val df = TableIO.readXml(spark, path)
      assert(df.columns.toSeq == Seq("id", "country", "pop", "share", "eu", "extra"))
      assert(df.schema("id").dataType == LongType)
      assert(df.schema("pop").dataType == LongType)
      assert(df.schema("share").dataType == DoubleType)
      assert(df.schema("eu").dataType == BooleanType) // plain true/false infers boolean
      val rows = df.orderBy("id").collect()
      assert(rows(0).getString(1) == "France" && rows(0).getDouble(3) == 0.83 &&
        rows(0).getBoolean(4) && rows(0).isNullAt(5)) // union schema: missing field → null
      assert(rows(1).isNullAt(3) && !rows(1).getBoolean(4) && rows(1).getString(5) == "x")
      // rowTag targets a repeating element below the first level
      val nestedPath = s"$dir/nested.xml"
      java.nio.file.Files.write(java.nio.file.Paths.get(nestedPath),
        """<root><meta>m</meta><items>
          |  <item><k>a</k><v>1</v></item><item><k>b</k><v>2</v></item>
          |</items></root>""".stripMargin.getBytes(StandardCharsets.UTF_8))
      val items = TableIO.readXml(spark, nestedPath, rowTag = Some("item"))
      assert(items.columns.toSeq == Seq("k", "v") && items.count() == 2)
      // default orientation on the nested doc is loud, not silently flattened
      val nested = intercept[IllegalArgumentException](TableIO.readXml(spark, nestedPath))
      assert(nested.getMessage.contains("nested structure"), nested.getMessage)
      // doctypes are rejected: origin files are untrusted input
      val dtPath = s"$dir/dt.xml"
      java.nio.file.Files.write(java.nio.file.Paths.get(dtPath),
        "<!DOCTYPE x [<!ENTITY e \"boom\">]><data><row a=\"1\"/></data>"
          .getBytes(StandardCharsets.UTF_8))
      intercept[Exception](TableIO.readXml(spark, dtPath))
    } finally rmrf(dir)
  }

  test("stata dta reader: pandas-written fixture round-trips types, missings, value labels") {
    // src/test/resources/fixtures/sample.dta was written by pandas 2.2
    // df.to_stata(version=118) — a CROSS-ENGINE fixture, not a file our
    // own writer produced
    val path = getClass.getResource("/fixtures/sample.dta").getPath
    val df = ops.TableIO.readStata(spark, path)
    assert(df.schema.map(f => f.name -> f.dataType) == Seq(
      "name" -> StringType, "age" -> IntegerType, "score" -> DoubleType,
      "small" -> ShortType, "tiny" -> ByteType, "grp" -> StringType))
    val rows = df.collect()
    assert(rows.length == 4)
    // row 0: alice, 30, 1.5, 1, 7, low
    assert(rows(0).getString(0) == "alice" && rows(0).getInt(1) == 30 &&
      rows(0).getDouble(2) == 1.5 && rows(0).getShort(3) == 1 &&
      rows(0).getByte(4) == 7 && rows(0).getString(5) == "low")
    // row 1: bob, null (int32 missing sentinel), -2.25, 2, null, high
    assert(rows(1).getString(0) == "bob" && rows(1).isNullAt(1) &&
      rows(1).getDouble(2) == -2.25 && rows(1).getShort(3) == 2 &&
      rows(1).isNullAt(4) && rows(1).getString(5) == "high")
    // row 2: unicode survives UTF-8 str fields; NaN → double missing → null
    assert(rows(2).getString(0) == "séance" && rows(2).getInt(1) == 45 &&
      rows(2).isNullAt(2) && rows(2).isNullAt(3) && rows(2).getByte(4) == 3 &&
      rows(2).getString(5) == "low")
    // row 3: empty string; a large-but-legal double below the missing
    // threshold is KEPT (8.988e300 < 8.988e307)
    assert(rows(3).getString(0) == "" && rows(3).getInt(1) == 12 &&
      rows(3).getDouble(2) == 8.988e300 && rows(3).getShort(3) == -4 &&
      rows(3).getByte(4) == 2 && rows(3).getString(5) == "mid")
    // a non-dta file is rejected by name
    val bad = intercept[IllegalArgumentException] {
      val p = tmpDir("dta") + "/x.dta"
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(p).getParent)
      java.nio.file.Files.write(java.nio.file.Paths.get(p), "not stata".getBytes)
      try ops.TableIO.readStata(spark, p)
      finally rmrf(java.nio.file.Paths.get(p).getParent.toString)
    }
    assert(bad.getMessage.contains("not a tagged .dta"), bad.getMessage)
  }

  test("feather reader: arrow IPC file round-trips typed columns with nulls") {
    import org.apache.arrow.memory.RootAllocator
    import org.apache.arrow.vector._
    import org.apache.arrow.vector.ipc.ArrowFileWriter
    import org.apache.arrow.vector.types.pojo.{ArrowType, Field, Schema => ASchema}
    import org.apache.arrow.vector.types.{FloatingPointPrecision, TimeUnit => ATimeUnit}
    import scala.jdk.CollectionConverters._

    val dir = tmpDir("feather")
    val path = s"$dir/t.feather"
    try {
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
      val alloc = new RootAllocator()
      val schema = new ASchema(Seq(
        Field.nullable("i", new ArrowType.Int(32, true)),
        Field.nullable("l", new ArrowType.Int(64, true)),
        Field.nullable("d", new ArrowType.FloatingPoint(FloatingPointPrecision.DOUBLE)),
        Field.nullable("s", new ArrowType.Utf8()),
        Field.nullable("b", new ArrowType.Bool()),
        Field.nullable("dt", new ArrowType.Date(org.apache.arrow.vector.types.DateUnit.DAY)),
        Field.nullable("ts", new ArrowType.Timestamp(ATimeUnit.MICROSECOND, null))
      ).asJava)
      val root = VectorSchemaRoot.create(schema, alloc)
      root.allocateNew()
      val iv = root.getVector("i").asInstanceOf[IntVector]
      val lv = root.getVector("l").asInstanceOf[BigIntVector]
      val dv = root.getVector("d").asInstanceOf[Float8Vector]
      val sv = root.getVector("s").asInstanceOf[VarCharVector]
      val bv = root.getVector("b").asInstanceOf[BitVector]
      val dtv = root.getVector("dt").asInstanceOf[DateDayVector]
      val tsv = root.getVector("ts").asInstanceOf[TimeStampMicroVector]
      iv.setSafe(0, 1); iv.setNull(1); iv.setSafe(2, 3)
      lv.setSafe(0, 10L); lv.setSafe(1, 20L); lv.setNull(2)
      dv.setSafe(0, 1.5); dv.setSafe(1, -2.25); dv.setSafe(2, 0.0)
      sv.setSafe(0, "a".getBytes); sv.setNull(1); sv.setSafe(2, "séance".getBytes("UTF-8"))
      bv.setSafe(0, 1); bv.setSafe(1, 0); bv.setNull(2)
      dtv.setSafe(0, 19723); dtv.setNull(1); dtv.setSafe(2, 0) // 2024-01-01, null, epoch
      tsv.setSafe(0, 1700000000000000L); tsv.setNull(1); tsv.setSafe(2, 0L)
      root.setRowCount(3)
      val out = new FileOutputStream(path)
      val writer = new ArrowFileWriter(root, null, out.getChannel)
      writer.start(); writer.writeBatch(); writer.end(); writer.close()
      out.close(); root.close(); alloc.close()

      val df = TableIO.readFeather(spark, path)
      assert(df.schema.map(f => f.name -> f.dataType) == Seq(
        "i" -> IntegerType, "l" -> LongType, "d" -> DoubleType, "s" -> StringType,
        "b" -> BooleanType, "dt" -> DateType, "ts" -> TimestampType))
      val rows = df.collect()
      assert(rows.length == 3)
      assert(rows(0).getInt(0) == 1 && rows(1).isNullAt(0) && rows(2).getInt(0) == 3)
      assert(rows(0).getLong(1) == 10L && rows(2).isNullAt(1))
      assert(rows(2).getString(3) == "séance" && rows(1).isNullAt(3))
      assert(rows(0).getBoolean(4) && !rows(1).getBoolean(4) && rows(2).isNullAt(4))
      assert(rows(0).getDate(5).toLocalDate == java.time.LocalDate.ofEpochDay(19723))
      assert(rows(0).getTimestamp(6).toInstant.toEpochMilli == 1700000000000L)
    } finally rmrf(dir)
  }

  test("feather reader: cross-engine fixture written by pyarrow") {
    // sample.feather was written once by pyarrow.feather.write_feather
    // (uncompressed) — another engine's output, like the .dta fixture
    val path = getClass.getResource("/fixtures/sample.feather").getPath
    val df = ops.TableIO.readFeather(spark, path)
    assert(df.schema.map(f => f.name -> f.dataType) == Seq(
      "i" -> IntegerType, "s" -> StringType, "d" -> DoubleType, "b" -> BooleanType))
    val rows = df.collect()
    assert(rows.length == 3)
    assert(rows(0).getInt(0) == 1 && rows(1).isNullAt(0) && rows(2).getInt(0) == 3)
    assert(rows(0).getString(1) == "a" && rows(2).getString(1) == "séance")
    assert(rows(1).getDouble(2) == -2.25 && rows(2).isNullAt(2))
    assert(rows(0).getBoolean(3) && !rows(1).getBoolean(3) && rows(2).isNullAt(3))
  }
}
