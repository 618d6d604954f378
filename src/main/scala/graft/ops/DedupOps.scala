package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication for training-data pipelines, scale-first:
  *  - exact: hash-groupBy (one shuffle on a 128-bit digest);
  *  - MinHash + LSH: shingle → k minhashes → b bands → bucket join, so
  *    candidate generation is a hash-partitioned equi-join (no O(n²)
  *    cross product); exact Jaccard verifies candidates;
  *  - SimHash: 64-bit signature, near-dups via banded Hamming join;
  *  - n-gram Jaccard within a blocking key;
  *  - embedding cosine near-dup via [[SimilarityOps]].
  * All candidate generation is equi-join-shaped → Catalyst gives us
  * shuffle-hash/broadcast joins and AQE skew splitting for free.
  */
object DedupOps {

  /** Spread rows across the session's shuffle parallelism before a
    * CPU-heavy per-row stage. A small input (one parquet file = one scan
    * task) would otherwise run the whole signature computation on ONE
    * core; at scale the scan already has many partitions and this is a
    * cheap hash exchange that co-partitions by key.
    */
  private def spread(df: DataFrame, keyCol: String): DataFrame =
    df.repartition(df.sparkSession.sessionState.conf.numShufflePartitions, col(keyCol))

  /** Exact Jaccard of two (distinct-element) arrays — empty∪empty is
    * defined as 0.0 (ANSI mode: a plain double division would THROW
    * DIVIDE_BY_ZERO when two empty-shingle docs collide in a bucket).
    */
  def jaccardOf(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val uni = size(array_union(a, b)).cast("double")
    when(uni > lit(0.0), inter / uni).otherwise(lit(0.0))
  }


  /** Exact dedup: one representative (min key) per identical text.
    * Returns (digest, keeper, n_copies).
    */
  def exactDuplicates(df: DataFrame, textCol: String, keyCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("digest"))
      .agg(min(col(keyCol)).as("keeper"), count(lit(1)).as("n_copies"))

  /** Exact-dedup'd table: keeps the min-key row per distinct text. */
  def dropExactDuplicates(df: DataFrame, textCol: String, keyCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(md5(col(textCol))).orderBy(col(keyCol))
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** MinHash signature from PRE-HASHED shingles: one xxhash64 pass over the
    * shingles, then k universal-hash permutations `(a_s·h + b_s) mod p`
    * (p = 2^31-1, coefficients SplitMix64-seeded) — cheap arithmetic in the
    * inner loop instead of k full string-hash passes. Inputs are reduced to
    * [0, p) first so ANSI-mode long multiplication cannot overflow.
    */
  def minhashSignatureFromHashes(shingleHashes: Column, k: Int, seed: Long = 42L): Column =
    graft.functions.MinHashFunctions.minhash_signature(shingleHashes, k, seed)

  /** The composable HOF formulation of [[minhashSignatureFromHashes]] —
    * k interpreted array traversals; kept as the verification reference
    * for the native expression (FunctionsSpec asserts bit-equality).
    */
  def minhashSignatureFromHashesHof(shingleHashes: Column, k: Int, seed: Long = 42L): Column = {
    val p = 2147483647L // 2^31 - 1
    val perms = (0 until k).map { s =>
      val a = 1L + java.lang.Math.floorMod(graft.util.DetHash.splitmix64(seed ^ (2L * s)), p - 1)
      val b = java.lang.Math.floorMod(graft.util.DetHash.splitmix64(seed ^ (2L * s + 1)), p)
      array_min(transform(shingleHashes, h => pmod(pmod(h, lit(p)) * lit(a) + lit(b), lit(p))))
    }
    array(perms: _*)
  }

  /** Convenience: signature straight from text (hashes shingles inline). */
  def minhashSignature(text: Column, k: Int, shingleN: Int = 3): Column =
    minhashSignatureFromHashes(
      transform(TextOps.shingles(text, shingleN), x => xxhash64(x)), k)

  /** LSH candidate pairs by banded minhash: signature split into `bands`
    * bands of `rowsPerBand`; docs sharing any band bucket become a
    * candidate pair; exact Jaccard on shingle sets filters to >= minJaccard.
    * Returns (key_a, key_b, jaccard) with key_a < key_b.
    */
  def minhashLshPairs(df: DataFrame, textCol: String, keyCol: String,
                      bands: Int = 8, rowsPerBand: Int = 4,
                      minJaccard: Double = 0.7): DataFrame = {
    val k = bands * rowsPerBand
    // stage 1: shingle + hash once per doc; persisted — reused by the band
    // self-join (both sides) and the final verification joins
    val sh = spread(df, keyCol).select(col(keyCol).as("key"),
        TextOps.shingles(col(textCol), 3).as("sh"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sig = sh
      .select(col("key"), transform(col("sh"), x => xxhash64(x)).as("hs"))
      .select(col("key"), minhashSignatureFromHashes(col("hs"), k).as("sig"))
    // stage 2: narrow banded table (key, band, bucket) — no arrays through
    // the shuffle; persisted so the self-join doesn't recompute signatures
    val banded = sig.select(col("key"),
        explode(transform(sequence(lit(0), lit(bands - 1)),
          b => struct(b.as("band"),
            hash(slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand))).as("bucket")))).as("bb"))
      .select(col("key"), col("bb.band"), col("bb.bucket"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cand = banded.select(col("band"), col("bucket"), col("key").as("key_a"))
      .join(banded.select(col("band"), col("bucket"), col("key").as("key_b")),
        Seq("band", "bucket"))
      .filter(col("key_a") < col("key_b"))
      .select("key_a", "key_b")
      .dropDuplicates("key_a", "key_b")
    // stage 3: exact-Jaccard verification only on the (small) candidate set
    cand
      .join(sh.select(col("key").as("key_a"), col("sh").as("sh_a")), Seq("key_a"))
      .join(sh.select(col("key").as("key_b"), col("sh").as("sh_b")), Seq("key_b"))
      .withColumn("jaccard", jaccardOf(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= minJaccard)
      .select("key_a", "key_b", "jaccard")
  }

  /** 64-bit SimHash over whitespace tokens: per-bit weighted vote of token
    * hashes, built with one aggregate over a 64-slot counter array.
    */
  /** 64 per-bit majority votes of cheap shift/mask arithmetic over a
    * PRE-HASHED token array (pass an attribute, not an inline expression —
    * the hash pass then runs once, not 64×).
    */
  def simhashFromHashes(hs: Column): Column =
    graft.functions.MinHashFunctions.simhash64(hs)

  /** HOF formulation of [[simhashFromHashes]] — 64 interpreted array
    * traversals; kept as the verification reference for the native
    * expression (FunctionsSpec asserts bit-equality).
    */
  def simhashFromHashesHof(hs: Column): Column = simhashHof(hs, 64)

  /** Per-bit majority vote over `sigBits` bits of the token hashes — the
    * generalized SimHash. `sigBits = 60` is the cross-engine-portable
    * width: with [[TextOps.md5Hash60]] token hashes, every intermediate
    * (token hash, 1 << bit, the final signature) fits SIGNED 64-bit on
    * every engine, so a DuckDB oracle reproduces the signature
    * bit-for-bit — 64-bit signatures are not portable (`1 << 63`
    * overflows BIGINT in most engines).
    */
  def simhashHof(hs: Column, sigBits: Int): Column = {
    require(sigBits >= 1 && sigBits <= 64, s"sigBits in [1,64] (got $sigBits)")
    val bits = (0 until sigBits).map { i =>
      val vote = aggregate(hs, lit(0),
        (acc, h) => acc + when(shiftright(h, i).bitwiseAND(1) === 1, 1).otherwise(-1))
      when(vote > 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }
    bits.reduce(_.bitwiseOR(_))
  }

  def tokenHashes(text: Column): Column =
    transform(split(trim(text), "\\s+"), t => xxhash64(t))

  def simhash(text: Column): Column = simhashFromHashes(tokenHashes(text))

  /** SimHash near-dup pairs: Hamming distance <= maxHamming, candidates via
    * the band pigeonhole — the 64-bit signature split into `bands` equal
    * bands (any pair within Hamming `bands - 1` shares at least one exact
    * band). EXHAUSTIVE only when `maxHamming < bands`, which is enforced:
    * a silently recall-limited result must not masquerade as "all pairs
    * within the threshold". More bands = wider Hamming radius but smaller
    * band width = more random collisions to verify.
    *
    * With `multiProbe = true` (equivalently `probeBits = 1`), one side of
    * the self-join additionally emits every 1-bit variant of each band's
    * bucket, extending the exhaustive radius to `2·bands - 1`
    * (pigeonhole: d ≤ 2b-1 errors over b bands leave some band with ≤ 1
    * differing bit) — wide Hamming radii WITHOUT shrinking bands into
    * high-collision tiny buckets. `probeBits = p` generalizes: the probe
    * side emits every bucket within band-Hamming ≤ p, and the exhaustive
    * radius becomes `bands·(p+1) - 1` (some band differs in ≤ p bits, and
    * that variant is emitted). Probe cost: Σ C(bandWidth, ≤p) structs per
    * row on ONE join side only — explicit, bounded (loud past 4096), and
    * still linear in rows; the alternative (more bands) shrinks buckets
    * and grows RANDOM collisions quadratically at corpus scale.
    */
  def simhashPairs(df: DataFrame, textCol: String, keyCol: String,
                   maxHamming: Int = 3, bands: Int = 4,
                   multiProbe: Boolean = false,
                   hasher: Column => Column = tokenHashes,
                   sigBits: Int = 64,
                   probeBits: Int = -1): DataFrame = {
    val p = if (probeBits >= 0) probeBits else if (multiProbe) 1 else 0
    val radius = bands * (p + 1) - 1
    require(maxHamming <= radius,
      s"pigeonhole is exhaustive only for maxHamming <= $radius with bands=$bands, " +
      s"probeBits=$p (raise probeBits to ${(maxHamming + 1 + bands - 1) / bands - 1} " +
      s"or bands; got maxHamming=$maxHamming)")
    require(bands >= 1 && bands <= sigBits, s"bands must be in [1,$sigBits] (got $bands)")
    val width = sigBits / bands // last band absorbs the leftover bits
    def bandWidth(b: Int): Int = if (b == bands - 1) sigBits - b * width else width
    // sigBits = 64 → the native codegen'd expression (the fast path);
    // narrower widths (the portable twin) → the HOF reference form
    def signature(hs: Column): Column =
      if (sigBits == 64) simhashFromHashes(hs) else simhashHof(hs, sigBits)
    val withSig = spread(df, keyCol)
      .select(col(keyCol).as("key"), hasher(col(textCol)).as("hs"))
      .select(col("key"), signature(col("hs")).as("sig"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    def bucketOf(b: Int): Column = {
      val mask = if (bandWidth(b) == 64) -1L else (1L << bandWidth(b)) - 1L
      call_function("shiftright", col("sig"), lit(b * width).cast("int"))
        .bitwiseAND(lit(mask))
    }
    val exactStructs = (0 until bands).map(b =>
      struct(lit(b).as("band"), bucketOf(b).as("bucket")))
    val banded = withSig.select(col("key"), col("sig"),
      explode(array(exactStructs: _*)).as("bb"))
      .select(col("key"), col("sig"), col("bb.band"), col("bb.bucket"))
    val probed = if (p == 0) banded else {
      // all XOR masks of band-Hamming <= p: C(width, <=p) plan constants
      def masks(width: Int): Seq[Long] = {
        def combos(start: Int, left: Int, acc: Long): Seq[Long] =
          if (left == 0) Seq(acc)
          else (start until width).flatMap(i => combos(i + 1, left - 1, acc | (1L << i)))
        (0 to p).flatMap(k => combos(0, k, 0L))
      }
      val probeStructs = (0 until bands).flatMap { b =>
        masks(bandWidth(b)).map(m =>
          struct(lit(b).as("band"), bucketOf(b).bitwiseXOR(lit(m)).as("bucket")))
      }
      require(probeStructs.size <= 4096,
        s"probeBits=$p over bands=$bands/width=$width expands to ${probeStructs.size} " +
        "probe buckets per row — past the 4096 sanity cap; use more bands or fewer probe bits")
      withSig.select(col("key"), col("sig"),
        explode(array(probeStructs: _*)).as("bb"))
        .select(col("key"), col("sig"), col("bb.band"), col("bb.bucket"))
    }
    val l = banded.select(col("band"), col("bucket"), col("key").as("key_a"), col("sig").as("sig_a"))
    val r = probed.select(col("band"), col("bucket"), col("key").as("key_b"), col("sig").as("sig_b"))
    l.join(r, Seq("band", "bucket"))
      .filter(col("key_a") < col("key_b"))
      .dropDuplicates("key_a", "key_b")
      .withColumn("hamming", bit_count(col("sig_a").bitwiseXOR(col("sig_b"))))
      .filter(col("hamming") <= maxHamming)
      .select("key_a", "key_b", "hamming")
  }

  /** n-gram Jaccard similarity pairs within a blocking key. Candidate
    * generation is MinHash-LSH *within the block* — an equi-join on
    * (block, band, bucket) — NOT the quadratic block self-join (a block
    * that grows linearly with the corpus grows its pair count
    * quadratically; at 100 TB that is the job). Candidates are then
    * verified with EXACT Jaccard on the hashed shingle sets, so reported
    * pairs carry exact similarity; recall follows the LSH S-curve
    * 1-(1-J^r)^b with threshold ≈ (1/b)^(1/r).
    */
  def ngramJaccardPairs(df: DataFrame, textCol: String, keyCol: String,
                        blockCols: Seq[String], n: Int = 3,
                        minJaccard: Double = 0.5,
                        bands: Int = 16, rowsPerBand: Int = 2): DataFrame = {
    // shingles are HASHED to longs once: minhash permutes the hashes, and
    // exact verification intersects 8-byte values instead of n-gram strings
    // (identical Jaccard modulo 2^-64 collisions)
    val base = spread(df, keyCol).select((blockCols.map(col) :+ col(keyCol).as("key") :+
      array_distinct(transform(TextOps.shingles(col(textCol), n), x => xxhash64(x))).as("sh")): _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val k = bands * rowsPerBand
    val sig = base.select((blockCols.map(col) :+ col("key") :+
      minhashSignatureFromHashes(col("sh"), k).as("sig")): _*)
    // persisted like minhashLshPairs' banded frame: BOTH sides of the
    // band self-join consume it, and without the persist each side
    // recomputes the k-permutation signatures (the op's dominant per-row
    // cost) — narrow (block, key, band, bucket) rows, rows × bands
    val banded = sig.select((blockCols.map(col) :+ col("key") :+
      explode(transform(sequence(lit(0), lit(bands - 1)),
        b => struct(b.as("band"),
          hash(slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand))).as("bucket")))).as("bb")): _*)
      .select((blockCols.map(col) :+ col("key") :+ col("bb.band") :+ col("bb.bucket")): _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val joinKeys = blockCols ++ Seq("band", "bucket")
    val cand = banded.withColumnRenamed("key", "key_a")
      .join(banded.withColumnRenamed("key", "key_b"), joinKeys.toSeq)
      .filter(col("key_a") < col("key_b"))
      .select((blockCols.map(col) :+ col("key_a") :+ col("key_b")): _*)
      .dropDuplicates("key_a", "key_b")
    cand
      .join(base.select(col("key").as("key_a"), col("sh").as("sh_a")), Seq("key_a"))
      .join(base.select(col("key").as("key_b"), col("sh").as("sh_b")), Seq("key_b"))
      .withColumn("jaccard", jaccardOf(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= minJaccard)
      .select((blockCols.map(col) :+ col("key_a") :+ col("key_b") :+ col("jaccard")): _*)
  }

  /** The quadratic exact baseline of [[ngramJaccardPairs]] — kept for
    * verification/oracle parity at small scale (all block pairs, exact
    * Jaccard; this is what the LSH-routed path's recall is measured
    * against). Do NOT run at corpus scale.
    */
  def ngramJaccardPairsExact(df: DataFrame, textCol: String, keyCol: String,
                             blockCols: Seq[String], n: Int = 3,
                             minJaccard: Double = 0.5): DataFrame = {
    val base = spread(df, keyCol).select((blockCols.map(col) :+ col(keyCol).as("key") :+
      array_distinct(transform(TextOps.shingles(col(textCol), n), x => xxhash64(x))).as("sh")): _*)
    val l = base.withColumnsRenamed(Map("key" -> "key_a", "sh" -> "sh_a"))
    val r = base.withColumnsRenamed(Map("key" -> "key_b", "sh" -> "sh_b"))
    l.join(r, blockCols)
      .filter(col("key_a") < col("key_b"))
      .withColumn("jaccard", jaccardOf(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= minJaccard)
      .select((blockCols.map(col) :+ col("key_a") :+ col("key_b") :+ col("jaccard")): _*)
  }

  /** Benchmark decontamination scores: for each document, the number of
    * distinct word n-grams it shares with an EVALUATION set — the
    * train-set hygiene step of an LLM data pipeline (a training doc
    * overlapping a benchmark's n-grams leaks the benchmark).
    *
    * Scale shape: the eval side (a benchmark suite — thousands of docs,
    * not billions) collapses to a distinct-gram frame and is BROADCAST,
    * so the corpus side is one scan + map-side hash join + one groupBy
    * shuffle on the doc key. Set `broadcastEval = false` for an
    * unusually large eval set (falls back to a shuffle equi-join on the
    * gram). Grams are per-doc distinct already ([[TextOps.shingles]]
    * array_distinct), so the overlap count is a plain `count`.
    */
  def contaminationScores(df: DataFrame, evalDf: DataFrame, textCol: String,
                          keyCol: String, n: Int = 3, minOverlap: Int = 1,
                          broadcastEval: Boolean = true): DataFrame = {
    val evalGrams0 = evalDf
      .select(explode(TextOps.shingles(col(textCol), n)).as("gram")).distinct()
    val evalGrams = if (broadcastEval) broadcast(evalGrams0) else evalGrams0
    // the corpus-side shingle + explode + probe stage is per-row-heavy and
    // runs at the SCAN's partitioning — spread first (one narrow exchange
    // of (key, text); the explode multiplies rows ~100x after it)
    spread(df, keyCol)
      .select(col(keyCol), explode(TextOps.shingles(col(textCol), n)).as("gram"))
      .join(evalGrams, "gram")
      .groupBy(keyCol).agg(count(lit(1)).as("overlap"))
      .filter(col("overlap") >= minOverlap)
  }

  /** Drop documents contaminated above `minOverlap` shared n-grams with
    * the eval set — one anti-join given the scores.
    */
  def dropContaminated(df: DataFrame, evalDf: DataFrame, textCol: String,
                       keyCol: String, n: Int = 3, minOverlap: Int = 1): DataFrame =
    df.join(contaminationScores(df, evalDf, textCol, keyCol, n, minOverlap)
      .select(keyCol), Seq(keyCol), "left_anti")

  /** Materialize near-dedup: drop every doc that appears as the GREATER
    * key of a near-dup pair (greedy representative = smallest key reaches
    * each cluster through the `key_a < key_b` chain). One anti-join —
    * scale-safe given the pair set.
    */
  def dropNearDuplicates(df: DataFrame, keyCol: String, pairs: DataFrame): DataFrame =
    df.join(pairs.select(col("key_b").as(keyCol)).distinct(), Seq(keyCol), "left_anti")

  /** End-to-end near-dedup via MinHash-LSH: find pairs, drop the greater
    * keys, return the deduplicated table.
    */
  def dropMinhashNearDuplicates(df: DataFrame, textCol: String, keyCol: String,
                                bands: Int = 8, rowsPerBand: Int = 4,
                                minJaccard: Double = 0.7): DataFrame =
    dropNearDuplicates(df, keyCol,
      minhashLshPairs(df, textCol, keyCol, bands, rowsPerBand, minJaccard))

  /** Embedding near-dup pairs: cosine >= minCosine via MULTI-TABLE
    * random-hyperplane LSH (same design as [[SimilarityOps.lshTopK]]) +
    * exact-cosine verification on bucket-collision candidates. A single
    * hash table of `planes` hyperplanes collides a cosine-0.9 pair with
    * probability only (1-θ/π)^planes ≈ 0.29 at planes=8 — `tables`
    * independent tables raise recall to 1-(1-p)^tables (≈ 0.94 at 8×8)
    * while candidate generation stays equi-join-shaped.
    */
  def embeddingCosinePairs(df: DataFrame, vecCol: String, keyCol: String,
                           minCosine: Double = 0.95, planes: Int = 8,
                           tables: Int = 8, seed: Long = 42L,
                           dims: Int = -1): DataFrame = {
    // dims <= 0 → infer the embedding dimension from the data (limit-1
    // read) so hyperplanes always span the FULL vector — a hardcoded
    // dimension would silently degrade recall on any other corpus
    val d = if (dims > 0) dims else SimilarityOps.vectorDims(df, vecCol)
    // persisted: both self-join sides consume it, and the tables×planes
    // hyperplane dot products are the op's per-row cost — recomputing
    // them per side doubles signature work at any scale
    val base = spread(df, keyCol).select(col(keyCol).as("key"), col(vecCol).as("vec"),
        explode(array((0 until tables).map(t =>
          struct(lit(t).as("tbl"),
            SimilarityOps.hyperplaneSignature(col(vecCol), planes, seed + 7919L * t, d)
              .as("bucket"))): _*)).as("bb"))
      .select(col("key"), col("vec"), col("bb.tbl"), col("bb.bucket"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val l = base.select(col("tbl"), col("bucket"), col("key").as("key_a"), col("vec").as("vec_a"))
    val r = base.select(col("tbl"), col("bucket"), col("key").as("key_b"), col("vec").as("vec_b"))
    // cosine + threshold BEFORE the duplicate-pair dedup: the exchange
    // then carries (key_a, key_b, cosine) instead of both VECTORS per
    // multi-table duplicate, and the threshold drops non-pairs before
    // they shuffle at all (guide §2.3; cosine is identical for every
    // duplicate of a pair, so the kept row is unaffected)
    l.join(r, Seq("tbl", "bucket"))
      .filter(col("key_a") < col("key_b"))
      .withColumn("cosine", SimilarityOps.cosine(col("vec_a"), col("vec_b")))
      .filter(col("cosine") >= minCosine)
      .select("key_a", "key_b", "cosine")
      .dropDuplicates("key_a", "key_b")
  }
}
