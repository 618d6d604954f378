package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch probe for q_quality_repetition's per-row expression cost.
  * NOT part of any harness; deleted after the investigation.
  */
object RepProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.maxPartitionBytes", "16777216")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").select("doc_id", "text")

    def time(label: String)(df: => DataFrame): Unit = {
      // warm
      df.write.format("noop").mode("overwrite").save()
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$label%-40s best=${ts.min}%7.3fs  runs=${ts.map(t => f"$t%.3f").mkString(",")}")
    }

    val lineSep = " "
    val lines = split(col("text"), java.util.regex.Pattern.quote(lineSep), -1)
    def charSum(arr: org.apache.spark.sql.Column) =
      aggregate(arr, lit(0L), (acc, l) => acc + length(l))
    val grams = graft.ops.TextOps.shinglesAll(col("text"), 2)

    time("split only")(docs.select(col("doc_id"), lines.as("l")))
    time("split+size+distinct")(docs.select(size(lines).as("a"), size(array_distinct(lines)).as("b")))
    time("charSum(lines)")(docs.select(charSum(lines).as("a")))
    time("charSum(distinct(lines))")(docs.select(charSum(array_distinct(lines)).as("a")))
    time("grams")(docs.select(col("doc_id"), grams.as("g")))
    time("size(distinct(grams))")(docs.select(size(array_distinct(grams)).as("a")))
    time("full repetitionExprs project")(docs.select(
      (col("doc_id") +: graft.ops.TextOps.repetitionExprs(col("text"), 2, lineSep)
        .map { case (n, c) => c.as(n) }): _*))
    time("full repetitionSignals")(
      graft.ops.QualityOps.repetitionSignals(docs, "doc_id", "text", 2, lineSep))
    time("shingles n=3 (dedup form)")(
      docs.select(col("doc_id"), graft.ops.TextOps.shingles(col("text"), 3).as("s")))
    time("chunkByTokens 32")(
      graft.ops.ChunkOps.chunkByTokens(docs, "doc_id", "text", 32, 4))

    val ev = spark.read.parquet(s"$sfDir/events.parquet")
      .withColumn("v", when(col("event_id") % 3 === 0, lit(null)).otherwise(col("value")))
      .select("user_id", "event_id", "v")
    time("interpolate")(
      graft.ops.TimeOps.interpolate(ev, Seq("user_id"), "event_id", "v"))
    time("bfill")(
      graft.ops.TimeOps.bfill(ev, Seq("user_id"), "event_id", "v"))
    time("ffill")(
      graft.ops.TimeOps.ffill(ev, Seq("user_id"), "event_id", "v"))
    spark.stop()
  }
}
