package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Derive an sf1-scale dataset from the driver-provided sf0.1 tables
  * (VERDICT r2 item 3: "the bench has never been run above sf0.1") —
  * deterministic 10x replication with key shifts, NO external data:
  *
  *  - fact/dim key columns shift by replica * 10^7, so every join keeps
  *    its exact 1:1 key structure and output cardinalities scale linearly;
  *  - `nation`/`region` stay single-copy (true dimensions — their foreign
  *    keys are untouched);
  *  - `documents` replicas interleave a replica tag into the token stream
  *    (shingle sets across replicas become disjoint) so the near-dup pair
  *    structure scales like a real 10x corpus instead of turning every doc
  *    into a 10-way near-dup clique; n_chars is recomputed;
  *  - `embeddings` replicas are cyclically rotated (norm-preserving,
  *    decorrelated across replicas) so ANN keeps realistic neighbor
  *    structure instead of 10 exact copies per vector.
  *
  * Usage: runMain graft.tools.ScaleUp <srcSfDir> <outDir> [factor]
  */
object ScaleUp {

  private val SHIFT = 10000000L

  def main(args: Array[String]): Unit = {
    val src = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val out = if (args.length > 1) args(1) else "/dev/shm/graft-sf1"
    val factor = if (args.length > 2) args(2).toInt else 10
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-scaleup")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.hadoop.fs.file.impl", classOf[graft.util.FastLocalFileSystem].getName)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def read(t: String): DataFrame = spark.read.parquet(s"$src/$t.parquet")
    def write(df: DataFrame, t: String): Unit =
      df.write.mode("overwrite").parquet(s"$out/$t.parquet")

    /** Replicate with the given per-replica transform (replica 0 = identity
      * on keys so the original rows survive verbatim).
      */
    def replicate(t: String)(f: (DataFrame, Int) => DataFrame): Unit = {
      val base = read(t)
      val scaled = (0 until factor).map(i => f(base, i)).reduce(_ unionByName _)
      write(scaled, t)
      System.err.println(s"[scaleup] $t x$factor")
    }

    def shifted(df: DataFrame, i: Int, keys: Seq[String]): DataFrame =
      keys.foldLeft(df)((d, k) => d.withColumn(k, col(k) + lit(i * SHIFT)))

    replicate("lineitem")((df, i) => shifted(df, i, Seq("l_orderkey", "l_partkey", "l_suppkey")))
    replicate("orders")((df, i) => shifted(df, i, Seq("o_orderkey", "o_custkey")))
    replicate("customer")((df, i) => shifted(df, i, Seq("c_custkey")))
    replicate("supplier")((df, i) => shifted(df, i, Seq("s_suppkey")))
    replicate("part")((df, i) => shifted(df, i, Seq("p_partkey")))
    replicate("events")((df, i) => shifted(df, i, Seq("event_id", "user_id")))
    write(read("nation"), "nation")
    write(read("region"), "region")

    replicate("documents") { (df, i) =>
      if (i == 0) df
      else shifted(df, i, Seq("doc_id"))
        // SUFFIX every token with the replica id (token count unchanged,
        // shingle sets disjoint across replicas, within-replica similarity
        // preserved). Do NOT interleave a tag as a separate token: a token
        // repeated ~len(doc) times dominates the SimHash per-bit majority
        // vote and collapses every doc in a replica onto one signature
        // (caught in review — it made the sf1 simhash query degenerate).
        .withColumn("text", regexp_replace(col("text"), "(\\S+)", s"$$1_r$i"))
        .withColumn("n_chars", length(col("text")))
    }
    replicate("embeddings") { (df, i) =>
      if (i == 0) df
      else {
        // cyclic rotation: norm-preserving, decorrelated; mod the known
        // 64-d width so large factors don't degrade to identity (rot=0
        // collides with replica 0 → bump to 1)
        val rot = math.max(1, (6 * i) % 64)
        shifted(df, i, Seq("vec_id"))
          .withColumn("embedding",
            concat(slice(col("embedding"), rot + 1, 10000),
              slice(col("embedding"), 1, rot)))
      }
    }
    System.err.println(s"[scaleup] done -> $out")
    spark.stop()
  }
}
