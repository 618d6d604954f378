package graft

import org.apache.spark.sql.functions._
import graft.ops.ExportOps

/** Per-key grouped JSON export (reference R2 sink shape,
  * `etl/grapher/data_metadata.py:14-24`).
  */
class ExportSpec extends SparkSpec {
  import spark.implicits._

  private val rows = Seq(
    ("pop", 2001, 20L, 7L), ("pop", 2000, 10L, 5L), ("pop", 2000, 20L, 6L),
    ("gdp", 2000, 10L, 9L))
    .toDF("key", "t", "e", "v")

  test("perKeyJson: aligned arrays sorted by (time, entity)") {
    val out = ExportOps.perKeyJson(rows, "key", "e", "t", "v")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out("pop") ==
      """{"entities":[10,20,20],"years":[2000,2000,2001],"values":[5,6,7]}""")
    assert(out("gdp") == """{"entities":[10],"years":[2000],"values":[9]}""")
  }

  test("writePerKeyJson: one directory per key, docs round-trip") {
    val dir = tmpDir("export")
    try {
      ExportOps.writePerKeyJson(rows, "key", "e", "t", "v", s"$dir/out")
      val parts = new java.io.File(s"$dir/out").listFiles()
        .filter(_.getName.startsWith("key_part=")).map(_.getName).sorted
      assert(parts.toSeq == Seq("key_part=gdp", "key_part=pop"))
      val back = spark.read.json(s"$dir/out")
      assert(back.count() == 2)
      val pop = back.filter(col("key") === "pop").select("doc").collect()(0).getString(0)
      assert(pop.contains("\"years\":[2000,2000,2001]"))
    } finally rmrf(dir)
  }
}
