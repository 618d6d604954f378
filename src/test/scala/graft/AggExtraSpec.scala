package graft

import org.apache.spark.sql.functions._

class AggExtraSpec extends SparkSpec {

  test("approx_count_distinct within 5% of exact on lineitem") {
    val rows = SparkEntry.queries("q_approx_distinct")(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val approx = r.getLong(1).toDouble
      val exact = r.getLong(2).toDouble
      assert(math.abs(approx - exact) / exact < 0.05, s"approx $approx vs exact $exact")
    }
  }

  test("cube emits all grouping-set combinations") {
    val df = SparkEntry.queries("q_cube_rollup")(spark, "/root/testdata/sf0.001")
    val rows = df.collect()
    // grand total row (both null) present and equals full count
    val total = rows.find(r => r.isNullAt(0) && r.isNullAt(1)).get.getLong(2)
    assert(total == spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet").count())
  }
}
