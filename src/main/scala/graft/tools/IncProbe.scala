package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.{IncrementalAnn, IncrementalDedup}

/** Measures the incremental-maintenance claim with wall clock: refreshing
  * a small change batch against a prebuilt store must cost a fraction of
  * the full-corpus recompute, because only the changed documents are
  * shingled / assigned.
  *
  * Usage: runMain graft.tools.IncProbe [sfDir] [batchPct]
  * Prints one JSON line.
  */
object IncProbe {

  private def time[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val batchPct = args.lift(1).map(_.toInt).getOrElse(5)
    val spark = SparkSession.builder()
      .appName("graft-inc-probe").master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.driver.memory", sys.env.getOrElse("SPARK_DRIVER_MEM", "16g"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").cast("string").as("doc_id"), col("text"))
      .localCheckpoint(true)
    val n = docs.count()
    val isBatch = pmod(xxhash64(col("doc_id")), lit(100L)) < lit(batchPct.toLong)
    val stable = docs.filter(!isBatch).localCheckpoint(true)
    val batch = docs.filter(isBatch).localCheckpoint(true)
    val nBatch = batch.count()

    // ---- dedup: full recompute vs refresh-against-store ----
    val (_, fullDedupSec) = time {
      val (s, p) = IncrementalDedup.refresh(IncrementalDedup.emptyStore(spark),
        docs, "text", "doc_id")
      p.count(); s.count()
    }
    val (store95, _) = time {
      IncrementalDedup.refresh(IncrementalDedup.emptyStore(spark),
        stable, "text", "doc_id")
    }
    store95._1.count()
    val (_, incDedupSec) = time {
      val (s, p) = IncrementalDedup.refresh(store95._1, batch, "text", "doc_id")
      p.count(); s.count()
    }

    // ---- ANN: full assignment vs refresh-against-store ----
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id").cast("string").as("doc_id"), col("embedding").as("emb"))
      .localCheckpoint(true)
    val nEmb = emb.count()
    val isEmbBatch = pmod(xxhash64(col("doc_id")), lit(100L)) < lit(batchPct.toLong)
    val embStable = emb.filter(!isEmbBatch).localCheckpoint(true)
    val embBatch = emb.filter(isEmbBatch).localCheckpoint(true)
    val index = IncrementalAnn.train(emb, "emb", "doc_id")
    val (_, fullAnnSec) = time {
      IncrementalAnn.refresh(index, IncrementalAnn.emptyStore(spark),
        emb, "emb", "doc_id").count()
    }
    val annStore = IncrementalAnn.refresh(index, IncrementalAnn.emptyStore(spark),
      embStable, "emb", "doc_id")
    annStore.count()
    val (_, incAnnSec) = time {
      IncrementalAnn.refresh(index, annStore, embBatch, "emb", "doc_id").count()
    }

    println(f"""{"metric":"incremental_maintenance","docs":$n,"batch_docs":$nBatch,""" +
      f""""batch_pct":$batchPct,"dedup_full_sec":$fullDedupSec%.2f,""" +
      f""""dedup_refresh_sec":$incDedupSec%.2f,""" +
      f""""dedup_speedup":${fullDedupSec / math.max(incDedupSec, 1e-9)}%.1f,""" +
      f""""embeddings":$nEmb,"ann_full_sec":$fullAnnSec%.2f,""" +
      f""""ann_refresh_sec":$incAnnSec%.2f,""" +
      f""""ann_speedup":${fullAnnSec / math.max(incAnnSec, 1e-9)}%.1f}""")
    spark.stop()
  }
}
