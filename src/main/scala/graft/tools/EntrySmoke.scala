package graft.tools

import org.apache.spark.sql.SparkSession

/** Replicates the driver's t1 smoke: SparkEntry.entry(spark) must return
  * rows > 0. Usage: runMain graft.tools.EntrySmoke
  */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val df = graft.SparkEntry.entry(spark)
    val n = df.count()
    println(f"[smoke] entry rows=$n in ${(System.nanoTime() - t0) / 1e9}%.1fs")
    df.show(3, truncate = 30)
    spark.stop()
    if (n <= 0) sys.exit(1)
  }
}
