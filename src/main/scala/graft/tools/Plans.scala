package graft.tools

import org.apache.spark.sql.SparkSession

/** Physical-plan inspection: prints explain("formatted") for selected
  * registered queries (pushdown/pruning/broadcast/codegen audit).
  * Usage: runMain graft.tools.Plans [sfDir] [queryName ...]
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q_scan_filter_project", "q1_agg", "q_join_inner_agg", "q_cdc_latest")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      println(s"\n===== $n =====")
      graft.SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
