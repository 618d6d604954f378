package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.DedupOps

/** Diagnostic: stage-by-stage timing of the near-dedup pipeline (why does
  * drop-near-dup cost more than the pair query it contains?).
  */
object DedupProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.hadoop.fs.file.impl", classOf[graft.util.FastLocalFileSystem].getName)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    // sub-step timings of the LSH pipeline internals
    val sh0 = docs.repartition(32, col("doc_id")).select(col("doc_id").as("key"),
      graft.ops.TextOps.shingles(col("text"), 3).as("sh"))
    t("shingles count")(sh0.count())
    val hs = sh0.select(col("key"), transform(col("sh"), x => xxhash64(x)).as("hs"))
    t("shingle hashes")(hs.count())
    val sig = hs.select(col("key"), DedupOps.minhashSignatureFromHashes(col("hs"), 32).as("sig"))
    t("minhash sigs k=32")(sig.select(sum(element_at(col("sig"), 1))).collect())
    t("minhash sigs again")(sig.select(sum(element_at(col("sig"), 2))).collect())
    val pairs = DedupOps.minhashLshPairs(docs, "text", "doc_id", minJaccard = 0.5)
    t("pairs.count cold")(pairs.count())
    t("pairs.count warm")(pairs.count())
    val dropKeys = pairs.select(col("key_b").as("doc_id")).distinct()
    t("anti-join count")(docs.join(dropKeys, Seq("doc_id"), "left_anti").count())
    t("dropMinhashNearDuplicates full")(
      DedupOps.dropMinhashNearDuplicates(docs, "text", "doc_id", minJaccard = 0.5).count())
    t("dropMinhashNearDuplicates again")(
      DedupOps.dropMinhashNearDuplicates(docs, "text", "doc_id", minJaccard = 0.5).count())
    spark.stop()
  }
}
