package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.util.DetHash

/** Similarity search over embedding columns (`Array[Float]`):
  *  - brute-force cosine top-k (the exact baseline): broadcast the query
  *    set, one codegen'd scan over the corpus, per-query top-k window;
  *  - LSH-bucketed ANN (the scale path): random-hyperplane signatures
  *    turn candidate generation into an equi-join on bucket ids.
  * Dot products use `zip_with` + `aggregate` higher-order functions in
  * double precision — no UDF, stays in WholeStageCodegen.
  */
object SimilarityOps {

  /** dot(a, b) in double precision — native codegen'd Expression
    * ([[graft.functions.VectorDot]]); the HOF formulation
    * (`aggregate(zip_with(...))`) is kept for reference/verification.
    */
  def dot(a: Column, b: Column): Column = graft.functions.VectorFunctions.vector_dot(a, b)

  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Fused single-pass cosine ([[graft.functions.CosineSimilarity]]). */
  def cosine(a: Column, b: Column): Column =
    graft.functions.VectorFunctions.cosine_similarity(a, b)

  def cosineHof(a: Column, b: Column): Column = dotHof(a, b) / (sqrt(dotHof(a, a)) * sqrt(dotHof(b, b)))

  /** Deterministic random hyperplanes (SplitMix64-seeded, unit-free signs):
    * bucket id = bit pattern of sign(dot(v, r_i)), i < planes. `dims` MUST
    * equal the embedding dimension — planes shorter than the vectors would
    * silently ignore the tail dimensions and degrade bucket quality
    * (callers that don't know the dimension statically use [[vectorDims]]).
    */
  def hyperplaneSignature(vec: Column, planes: Int, seed: Long, dims: Int = 64): Column = {
    require(dims >= 1, s"dims must be positive (got $dims)")
    val planeLits: Seq[Column] = (0 until planes).map { p =>
      // (p, d) hashed JOINTLY through two splitmix rounds: the old
      // `seed ^ (p * K + d)` form collides plane p's dims >= K with plane
      // p+1's head, correlating hyperplanes on any corpus wider than K
      // (1536/3072-d embeddings are standard) and silently breaking the
      // 1-(1-prob)^tables recall math.
      val planeSeed = DetHash.splitmix64(seed + 0x9E3779B97F4A7C15L * p)
      // ONE array literal per plane (typedlit), not dims separate lit()
      // nodes wrapped in array(): planes x tables x dims individual
      // literals (4096 at 8x8x64, hundreds of thousands at real widths)
      // made analysis + codegen of every signature expression the
      // dominant planning cost; values are identical
      typedlit((0 until dims).map(d =>
        if (DetHash.splitmix64(planeSeed ^ d) >= 0) 1.0 else -1.0))
    }
    val bits = planeLits.zipWithIndex.map { case (plane, i) =>
      when(dot(vec, plane) >= 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }
    bits.reduce(_.bitwiseOR(_))
  }

  /** Embedding dimension of `vecCol`, read from ONE non-null row (a
    * limit-1 job — negligible even at corpus scale; parquet stops after
    * the first page). Null vectors are skipped, not sampled: `size(null)`
    * would surface as a bare NPE at `getInt`, and whether the sampled row
    * is null would vary run to run (limit-1 picks an arbitrary row).
    * Ragged dimensions are impossible to detect here — the signature
    * expressions themselves require equal-length inputs.
    */
  def vectorDims(df: DataFrame, vecCol: String): Int = {
    val head = df.select(size(col(vecCol)).as("d"))
      .filter(col("d").isNotNull && col("d") >= 1).limit(1).collect()
    require(head.nonEmpty,
      s"cannot infer dims of '$vecCol': no row with a non-empty vector")
    head(0).getInt(0)
  }

  /** Exact brute-force top-k by cosine for each query vector. `queries`
    * must be small enough to broadcast (the baseline / verification path).
    * Returns (query_id, corpus_id, cosine, rank).
    */
  def bruteForceTopK(corpus: DataFrame, corpusVec: String, corpusId: String,
                     queries: DataFrame, queryVec: String, queryId: String,
                     k: Int): DataFrame = {
    val q = broadcast(queries.select(col(queryId).as("query_id"), col(queryVec).as("qv")))
    val c = corpus.select(col(corpusId).as("corpus_id"), col(corpusVec).as("cv"))
    val scored = q.crossJoin(c)
      .filter(col("query_id") =!= col("corpus_id"))
      .withColumn("cosine", cosine(col("qv"), col("cv")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("corpus_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "corpus_id", "cosine", "rank")
  }

  /** IVF (inverted-file) ANN: a deterministic coarse quantizer — `nlist`
    * centroids refined by a fixed number of Lloyd iterations from seeded
    * initial picks — partitions the corpus into cells; a query scans only
    * its `nprobe` nearest cells. The scale path when the corpus is huge
    * and queries are many: cell assignment is one broadcast-argmin pass,
    * the probe is an equi-join on cell id (vs LSH's multi-table union).
    * Deterministic: seeded SplitMix64 picks, fixed iteration count, no
    * RNG at query time.
    */
  def ivfTopK(corpus: DataFrame, corpusVec: String, corpusId: String,
              queries: DataFrame, queryVec: String, queryId: String,
              k: Int, nlist: Int = 16, nprobe: Int = 4, iters: Int = 3,
              trainSample: Int = 4096, seed: Long = 42L,
              distributedIters: Int = 0): DataFrame = {
    // Quantizer training (driver Lloyd on a bounded deterministic sample,
    // corpus-wide refinement on cell under-coverage) and the tie-break
    // contract live in IncrementalAnn — one trainer for the batch operator
    // and the incrementally maintained index.
    val index = IncrementalAnn.train(corpus, corpusVec, corpusId,
      nlist, nprobe, iters, trainSample, seed, distributedIters)
    // Batch phase: one assignment scan + one probe equi-join. Centroids
    // enter the plan as constant array literals (typedLit); cosine stays
    // the native codegen'd loop.
    val c = corpus.select(col(corpusId).as("corpus_id"), col(corpusVec).as("cv"))
    val cellAssigned = c.withColumn("cell", index.assignExpr(col("cv")))
    val q = queries.select(col(queryId).as("query_id"), col(queryVec).as("qv"))
      .withColumn("cell", explode(index.probeExpr(col("qv"))))
    // cosine BEFORE the duplicate-candidate dedup: the dropDuplicates
    // exchange then carries (ids, cosine) instead of both embedding
    // VECTORS per candidate row (guide §2.3 — at corpus scale vectors are
    // KBs/row and nprobe-fold duplicated; cosine is identical for every
    // duplicate of a pair, so the kept row is unaffected)
    val cand = q.join(cellAssigned, Seq("cell"))
      .filter(col("query_id") =!= col("corpus_id"))
      .withColumn("cosine", cosine(col("qv"), col("cv")))
      .select("query_id", "corpus_id", "cosine")
      .dropDuplicates("query_id", "corpus_id")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("corpus_id"))
    cand.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "corpus_id", "cosine", "rank")
  }

  /** ANN top-k via hyperplane LSH buckets: candidates share a bucket in at
    * least one of `tables` independent hash tables; recall grows with
    * tables, cost stays equi-join-shaped. Returns same shape as brute force.
    */
  def lshTopK(corpus: DataFrame, corpusVec: String, corpusId: String,
              queries: DataFrame, queryVec: String, queryId: String,
              k: Int, planes: Int = 10, tables: Int = 4, seed: Long = 42L,
              dims: Int = -1): DataFrame = {
    // dims <= 0 → infer from the corpus (one limit-1 row read); planes
    // sized to the ACTUAL dimension, never a hardcoded 64
    val d = if (dims > 0) dims else vectorDims(corpus, corpusVec)
    def withBuckets(df: DataFrame, vec: String, idAs: String, vecAs: String): DataFrame =
      df.select(col(idAs), col(vecAs),
        explode(array((0 until tables).map(t =>
          struct(lit(t).as("tbl"),
            hyperplaneSignature(col(vecAs), planes, seed + 7919L * t, d).as("bucket"))): _*)).as("bb"))
        .select(col(idAs), col(vecAs), col("bb.tbl"), col("bb.bucket"))
    val c = withBuckets(
      corpus.select(col(corpusId).as("corpus_id"), col(corpusVec).as("cv")), corpusVec, "corpus_id", "cv")
    val q = withBuckets(
      queries.select(col(queryId).as("query_id"), col(queryVec).as("qv")), queryVec, "query_id", "qv")
    // cosine before the dedup so the exchange carries (ids, cosine), not
    // two vectors per multi-table duplicate — see ivfTopK's comment
    val cand = q.join(c, Seq("tbl", "bucket"))
      .filter(col("query_id") =!= col("corpus_id"))
      .withColumn("cosine", cosine(col("qv"), col("cv")))
      .select("query_id", "corpus_id", "cosine")
      .dropDuplicates("query_id", "corpus_id")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("corpus_id"))
    cand.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "corpus_id", "cosine", "rank")
  }
}
