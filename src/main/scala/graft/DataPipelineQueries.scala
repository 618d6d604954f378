package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops._

/** Training-data pipeline operators over the `documents` and `embeddings`
  * tables: deduplication (exact / MinHash-LSH / SimHash / n-gram Jaccard /
  * embedding-cosine), similarity search (brute-force + LSH ANN), text
  * analysis (language-ID, quality, token counts, fingerprints), and
  * multimodal binary-column plumbing.
  *
  * Non-SQL-expressible ops (xxhash64-based signatures, ANN) register
  * without oracle SQL → driver records rows-only; their semantics are
  * asserted in ScalaTest against driver-computed references instead.
  */
object DataPipelineQueries {
  import Queries.register

  private def T(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  def registerAll(): Unit = {
    dedup()
    similarity()
    textAnalysis()
    qualityRepetition()
    chunking()
    decontamination()
    mixturesAndSplits()
    multimodal()
    benchVariants()
  }

  /** Lean bench twins of the verification-heavy queries: the operator
    * alone, with the bounded-quadratic completeness checks and brute-force
    * recall baselines stripped (those stay in the CORRECTNESS queries and
    * in DedupSpec) — the bench measures the operator's scale path.
    */
  private def benchVariants(): Unit = {
    import Queries.registerBench

    registerBench("q_dedup_ngram_jaccard") { (s, dir) =>
      val df = T(s, dir, "documents").withColumn("len_band", (col("n_chars") / 64).cast("int"))
      DedupOps.ngramJaccardPairs(df, "text", "doc_id", Seq("lang", "len_band"),
        n = 3, minJaccard = 0.3).orderBy("key_a", "key_b")
    }

    // bench twin runs the PRODUCTION simhash path: xxhash64 token hashes +
    // the native codegen'd 64-bit SimHash64 expression (one fused loop) —
    // the correctness query uses the md5-low-60 portable form purely so
    // DuckDB can replicate it, and md5 string hashing + 60 interpreted HOF
    // traversals is ~10x the native cost by design, not a plan regression.
    registerBench("q_dedup_simhash") { (s, dir) =>
      DedupOps.simhashPairs(T(s, dir, "documents"), "text", "doc_id", maxHamming = 3)
        .orderBy("key_a", "key_b")
    }

    registerBench("q_dedup_drop_neardup") { (s, dir) =>
      DedupOps.dropMinhashNearDuplicates(T(s, dir, "documents"), "text", "doc_id",
        minJaccard = 0.5).select("doc_id", "lang", "n_chars").orderBy("doc_id")
    }

    // production fingerprint path (xxhash64 Karp-Rabin, no md5 string work,
    // no cluster-equality crosscheck)
    registerBench("q_fingerprint") { (s, dir) =>
      T(s, dir, "documents").select(
        col("doc_id"), TextOps.fingerprint(col("text")).as("fp"))
        .orderBy("doc_id")
    }

    // production checksum path: ONE xxhash64 plan (the engine's
    // contentChecksum), no portable-md5 leg, no two-plan invariance rerun
    registerBench("q_checksum_agg") { (s, dir) =>
      val base = T(s, dir, "lineitem")
      base.agg(
        AggOps.contentChecksum(base, Seq("l_orderkey", "l_linenumber", "l_returnflag"))
          .cast("string").as("checksum"),
        count(lit(1)).as("n"))
    }

    registerBench("q_ann_lsh") { (s, dir) =>
      val emb = T(s, dir, "embeddings").select("vec_id", "embedding")
      val queries = emb.filter(col("vec_id") < 5).select(
        (col("vec_id") + 1000000).as("vec_id"),
        zip_with(col("embedding"), reverse(col("embedding")),
          (x, y) => x + lit(0.1f) * y).as("embedding"))
      SimilarityOps.lshTopK(emb, "embedding", "vec_id",
        queries, "embedding", "vec_id", k = 5, planes = 8, tables = 8)
        .orderBy("query_id", "rank")
    }

    registerBench("q_ann_ivf") { (s, dir) =>
      val emb = T(s, dir, "embeddings").select("vec_id", "embedding")
      val queries = emb.filter(col("vec_id") < 5).select(
        (col("vec_id") + 1000000).as("vec_id"),
        zip_with(col("embedding"), reverse(col("embedding")),
          (x, y) => x + lit(0.1f) * y).as("embedding"))
      SimilarityOps.ivfTopK(emb, "embedding", "vec_id",
        queries, "embedding", "vec_id", k = 5, nlist = 16, nprobe = 4)
        .orderBy("query_id", "rank")
    }
  }

  private def dedup(): Unit = {
    register("q_dedup_exact", Some(
      """SELECT md5(text) AS digest, MIN(doc_id) AS keeper, COUNT(*) AS n_copies
        |FROM documents GROUP BY 1 ORDER BY digest""".stripMargin)) { (s, dir) =>
      DedupOps.exactDuplicates(T(s, dir, "documents"), "text", "doc_id")
        .orderBy("digest")
    }

    // MinHash+LSH near-dup pairs WITH a full DuckDB oracle: the reported
    // set must equal the exact-Jaccard pair set (every real pair in this
    // corpus sits at J >= 0.889 where the 8x4 banding's recall is ~1 and
    // deterministic for the fixed seed — verified to match exactly at
    // sf0.001/0.01/0.1), and the jaccard values are exact by construction
    // (integer-ratio division, identical on hashed or string shingles).
    register("q_dedup_minhash_lsh", Some(
      """WITH d AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t FROM documents),
        |sh AS (SELECT doc_id,
        |  list_distinct(CASE WHEN len(t) >= 3 THEN
        |    list_transform(generate_series(1, len(t)-2), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
        |    ELSE [] END) AS s FROM d)
        |SELECT a.doc_id AS key_a, b.doc_id AS key_b,
        |  CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
        |  CAST(len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) AS DOUBLE) AS jaccard
        |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
        |      CAST(len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) AS DOUBLE) >= 0.5
        |ORDER BY key_a, key_b""".stripMargin)) { (s, dir) =>
      DedupOps.minhashLshPairs(T(s, dir, "documents"), "text", "doc_id",
        bands = 8, rowsPerBand = 4, minJaccard = 0.5)
        .orderBy("key_a", "key_b")
    }

    // maxHamming=3 with the default 4 bands: the pigeonhole is EXHAUSTIVE
    // (simhashPairs enforces maxHamming < bands), so the banded-join pair
    // set EQUALS the exact all-pairs Hamming set deterministically — a
    // FULL oracle, not a recall bet. Runs over the portable md5-low-60
    // token hash + 60-bit signature (TextOps.md5Hash60) so DuckDB
    // replicates the per-bit majority vote bit-for-bit; the xxhash64 /
    // native-expression 64-bit path stays the production fast path
    // (FunctionsSpec bit-equality + DedupSpec planted pairs).
    register("q_dedup_simhash", Some(
      """WITH toks AS (SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
        |              FROM documents),
        |h AS (SELECT doc_id, CAST(('0x' || substr(md5(tok), 1, 15)) AS BIGINT) AS h FROM toks),
        |votes AS (SELECT doc_id, b,
        |    SUM(CASE WHEN (h >> CAST(b AS INTEGER)) & 1 = 1 THEN 1 ELSE -1 END) AS v
        |  FROM h, generate_series(0, 59) t(b) GROUP BY doc_id, b),
        |sig AS (SELECT doc_id,
        |    SUM(CASE WHEN v > 0 THEN (1::BIGINT << CAST(b AS INTEGER)) ELSE 0 END) AS sig
        |  FROM votes GROUP BY doc_id)
        |SELECT a.doc_id AS key_a, b.doc_id AS key_b,
        |       CAST(bit_count(xor(a.sig, b.sig)) AS INTEGER) AS hamming
        |FROM sig a JOIN sig b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.sig, b.sig)) <= 3
        |ORDER BY key_a, key_b""".stripMargin)) { (s, dir) =>
      DedupOps.simhashPairs(T(s, dir, "documents"), "text", "doc_id", maxHamming = 3,
        hasher = TextOps.tokenHashesPortable, sigBits = 60)
        .orderBy("key_a", "key_b")
    }

    // blocked n-gram Jaccard, LSH-routed candidates + exact verify, with a
    // full DuckDB oracle (= the blocked exact pair set; LSH recall is 1 on
    // this corpus, all real pairs at J >= 0.889). The constant
    // missed_pairs_lt600 completeness bit stays as an in-result check.
    register("q_dedup_ngram_jaccard", Some(
      """WITH d AS (SELECT doc_id, lang, CAST(n_chars // 64 AS INTEGER) AS len_band,
        |             regexp_split_to_array(trim(text), '\s+') AS t FROM documents),
        |sh AS (SELECT doc_id, lang, len_band,
        |  list_distinct(CASE WHEN len(t) >= 3 THEN
        |    list_transform(generate_series(1, len(t)-2), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
        |    ELSE [] END) AS s FROM d)
        |SELECT a.lang, a.len_band, a.doc_id AS key_a, b.doc_id AS key_b,
        |  CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
        |  CAST(len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) AS DOUBLE) AS jaccard,
        |  CAST(0 AS BIGINT) AS missed_pairs_lt600
        |FROM sh a JOIN sh b
        |  ON a.lang = b.lang AND a.len_band = b.len_band AND a.doc_id < b.doc_id
        |WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
        |      CAST(len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) AS DOUBLE) >= 0.3
        |ORDER BY key_a, key_b""".stripMargin)) { (s, dir) =>
      val df = T(s, dir, "documents").withColumn("len_band", (col("n_chars") / 64).cast("int"))
      val pairs = DedupOps.ngramJaccardPairs(df, "text", "doc_id", Seq("lang", "len_band"),
        n = 3, minJaccard = 0.3)
      val exactSmall = DedupOps.ngramJaccardPairsExact(
        df.filter(col("doc_id") < 600), "text", "doc_id", Seq("lang", "len_band"),
        n = 3, minJaccard = 0.3).select("key_a", "key_b")
      val missed = exactSmall
        .join(pairs.select("key_a", "key_b"), Seq("key_a", "key_b"), "left_anti")
        .agg(count(lit(1)).as("missed_pairs_lt600"))
      pairs.crossJoin(missed).orderBy("key_a", "key_b")
    }

    // materialized near-dedup: the table AFTER dropping near-duplicates,
    // DuckDB-oracled — survivors = docs minus the greater key of every
    // exact-Jaccard >= 0.5 pair (the LSH pair set equals the exact set on
    // this corpus, see q_dedup_minhash_lsh). The in-result constant column
    // (zero surviving near-dup pairs among ids < 600) stays as an internal
    // consistency bit.
    register("q_dedup_drop_neardup", Some(
      """WITH d AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t FROM documents),
        |sh AS (SELECT doc_id,
        |  list_distinct(CASE WHEN len(t) >= 3 THEN
        |    list_transform(generate_series(1, len(t)-2), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
        |    ELSE [] END) AS s FROM d),
        |dropped AS (SELECT DISTINCT b.doc_id FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |  WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
        |        CAST(len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) AS DOUBLE) >= 0.5)
        |SELECT doc_id, lang, n_chars, CAST(0 AS BIGINT) AS surviving_neardup_pairs_lt600
        |FROM documents WHERE doc_id NOT IN (SELECT doc_id FROM dropped)
        |ORDER BY doc_id""".stripMargin)) { (s, dir) =>
      val docs = T(s, dir, "documents")
      val out = DedupOps.dropMinhashNearDuplicates(docs, "text", "doc_id", minJaccard = 0.5)
        .select("doc_id", "lang", "n_chars")
      val smallSurvivors = out.select("doc_id")
        .filter(col("doc_id") < 600)
        .join(docs.select("doc_id", "text"), Seq("doc_id"))
      val remaining = DedupOps.ngramJaccardPairsExact(
        smallSurvivors, "text", "doc_id", blockCols = Nil, n = 3, minJaccard = 0.5)
        .agg(count(lit(1)).as("surviving_neardup_pairs_lt600"))
      out.crossJoin(remaining).orderBy("doc_id")
    }

    // Near-dup CLUSTER resolution: connected components over the LSH pair
    // graph (alternating large-star/small-star — O(log² n) rounds, every
    // pass equi-join/hash-agg shaped), assigned to EVERY document
    // (singletons = own cluster). FULL DuckDB oracle: the pair set equals
    // the exact-Jaccard set on this corpus (see q_dedup_minhash_lsh), and
    // transitive closure is replicated with a recursive min-label
    // propagation CTE — component = min reachable doc id.
    register("q_dedup_clusters", Some(
      """WITH RECURSIVE d AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t FROM documents),
        |sh AS (SELECT doc_id,
        |  list_distinct(CASE WHEN len(t) >= 3 THEN
        |    list_transform(generate_series(1, len(t)-2), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
        |    ELSE [] END) AS s FROM d),
        |pairs AS (SELECT a.doc_id AS key_a, b.doc_id AS key_b
        |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |  WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
        |        CAST(len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) AS DOUBLE) >= 0.5),
        |edges AS (SELECT key_a AS a, key_b AS b FROM pairs
        |          UNION SELECT key_b, key_a FROM pairs),
        |reach(node, lab) AS (
        |  SELECT doc_id, doc_id FROM documents
        |  UNION
        |  SELECT e.b, r.lab FROM reach r JOIN edges e ON e.a = r.node),
        |comp AS (SELECT node AS doc_id, MIN(lab) AS cluster_id FROM reach GROUP BY node)
        |SELECT doc_id, cluster_id,
        |  CAST(COUNT(*) OVER (PARTITION BY cluster_id) AS BIGINT) AS n_members
        |FROM comp ORDER BY doc_id""".stripMargin)) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val docs = T(s, dir, "documents")
      val pairs = DedupOps.minhashLshPairs(docs, "text", "doc_id",
        bands = 8, rowsPerBand = 4, minJaccard = 0.5)
      GraphOps.clusterAssignments(docs, "doc_id", pairs)
        .withColumn("n_members",
          count(lit(1)).over(Window.partitionBy("cluster_id")))
        .orderBy("doc_id")
    }

    // The embeddings table has no natural near-duplicates (max pairwise
    // cosine ≈ 0.51), so the query PLANTS them: a perturbed copy of each
    // vec_id < 50 (v' = v + 0.1·reverse(v), cosine(v, v') ≈ 0.995). The op
    // must recover the 50 planted pairs — non-zero, deterministic output;
    // DedupSpec measures recall against a brute-force reference.
    // DuckDB-oracled on the PAIR SET (cosine column excluded — engines
    // differ in float/double promotion of the perturbation arithmetic, but
    // membership at threshold 0.9 is decided by a ~0.44 margin on both
    // sides: planted twins sit at ≈0.995, natural pairs at <=0.51).
    register("q_dedup_embedding_cosine", Some(
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |p AS (SELECT vec_id + 1000000 AS vec_id,
        |        list_transform(generate_series(1, len(v)), i -> v[i] + 0.1 * v[len(v) - i + 1]) AS v
        |      FROM e WHERE vec_id < 50),
        |a AS (SELECT * FROM e UNION ALL SELECT * FROM p)
        |SELECT x.vec_id AS key_a, y.vec_id AS key_b
        |FROM a x JOIN a y ON x.vec_id < y.vec_id
        |WHERE list_cosine_similarity(x.v, y.v) >= 0.9
        |ORDER BY key_a, key_b""".stripMargin)) { (s, dir) =>
      val emb = T(s, dir, "embeddings").select("vec_id", "embedding")
      val planted = emb.filter(col("vec_id") < 50).select(
        (col("vec_id") + 1000000).as("vec_id"),
        zip_with(col("embedding"), reverse(col("embedding")),
          (x, y) => x + lit(0.1f) * y).as("embedding"))
      DedupOps.embeddingCosinePairs(emb.unionByName(planted), "embedding", "vec_id",
        minCosine = 0.9, planes = 8, tables = 8)
        .select("key_a", "key_b")
        .orderBy("key_a", "key_b")
    }

    // The exact quadratic baseline the LSH paths are measured against —
    // bounded to doc_id < 600 (verification at fixed scale, NOT the scale
    // path) and DuckDB-oracled: n-gram shingle Jaccard is expressible with
    // list lambdas, and Jaccard over xxhash64'd shingle sets equals Jaccard
    // over the string sets (distinct counts preserved mod 2^-64 collisions).
    register("q_neardup_exact_pairs", Some(
      """WITH d AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
        |           FROM documents WHERE doc_id < 600),
        |sh AS (SELECT doc_id,
        |  list_distinct(CASE WHEN len(t) >= 3 THEN
        |    list_transform(generate_series(1, len(t)-2), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
        |    ELSE [] END) AS s FROM d)
        |SELECT a.doc_id AS key_a, b.doc_id AS key_b,
        |  CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
        |  CAST(len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) AS DOUBLE) AS jaccard
        |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
        |      CAST(len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) AS DOUBLE) >= 0.5
        |ORDER BY key_a, key_b""".stripMargin)) { (s, dir) =>
      DedupOps.ngramJaccardPairsExact(
        T(s, dir, "documents").filter(col("doc_id") < 600),
        "text", "doc_id", blockCols = Nil, n = 3, minJaccard = 0.5)
        .orderBy("key_a", "key_b")
    }
  }

  private def similarity(): Unit = {
    // BM25 keyword retrieval (Lucene-style always-positive idf), top-10
    // per query — the lexical leg next to embedding ANN. FULLY oracled:
    // both engines rank on scores ROUNDED to 9 decimals with a doc-id
    // tiebreak, so last-ulp float noise (summation order, libm ln) cannot
    // flip a rank; the rank set is compared value-for-value.
    register("q_bm25_topk", Some(
      """WITH toks AS (SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS term FROM documents),
        |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
        |dl AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY 1),
        |stats AS (SELECT COUNT(*) AS n, AVG(dl) AS avgdl FROM dl),
        |q(query_id, term) AS (VALUES (0, 'hash'), (0, 'join'),
        |  (1, 'vector'), (1, 'stream'), (2, 'merge'), (2, 'sort'), (2, 'line')),
        |dfreq AS (SELECT term, COUNT(*) AS df FROM tf
        |  WHERE term IN (SELECT term FROM q) GROUP BY 1),
        |scored AS (SELECT q.query_id, tf.doc_id,
        |  round(SUM(ln(1 + (n - df + 0.5) / (df + 0.5)) *
        |            (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))), 9) AS score_r
        |  FROM tf JOIN q USING (term) JOIN dfreq USING (term)
        |       JOIN dl USING (doc_id), stats
        |  GROUP BY 1, 2),
        |r AS (SELECT query_id, doc_id, CAST(row_number() OVER
        |  (PARTITION BY query_id ORDER BY score_r DESC, doc_id) AS INTEGER) AS rank
        |  FROM scored)
        |SELECT CAST(query_id AS BIGINT) AS query_id, doc_id, rank
        |FROM r WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin)) { (s, dir) =>
      SearchOps.bm25TopK(T(s, dir, "documents"), "text", "doc_id",
        queries = Seq((0L, "hash join"), (1L, "vector stream"), (2L, "merge sort line")),
        k = 10)
        .orderBy("query_id", "rank")
    }

    // exact brute-force cosine top-k (baseline; first 5 vectors as queries).
    // DuckDB-oracled on the RANKING (query_id, corpus_id, rank): ranks are
    // robust to last-ulp cosine differences between engines (neighbor
    // cosine gaps here are ~1e-3), so this verifies the exact-topk
    // semantics end-to-end without betting the hash compare on float ulps.
    register("q_ann_brute_force", Some(
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5),
        |scored AS (SELECT q.query_id, c.vec_id AS corpus_id,
        |  list_cosine_similarity(q.qv, c.v) AS cosine
        |  FROM q JOIN e c ON q.query_id != c.vec_id),
        |r AS (SELECT query_id, corpus_id, CAST(row_number() OVER
        |  (PARTITION BY query_id ORDER BY cosine DESC, corpus_id) AS INTEGER) AS rank
        |  FROM scored)
        |SELECT query_id, corpus_id, rank FROM r WHERE rank <= 10
        |ORDER BY query_id, rank""".stripMargin)) { (s, dir) =>
      val emb = T(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id") < 5)
      SimilarityOps.bruteForceTopK(emb, "embedding", "vec_id",
        queries, "embedding", "vec_id", k = 10)
        .select("query_id", "corpus_id", "rank")
        .orderBy("query_id", "rank")
    }

    // LSH-bucketed ANN (the scale path). rows-only (candidate set is
    // LSH-dependent), with TWO in-result verification signals computed
    // against the exact brute-force baseline in the same job: a per-row
    // `in_brute_topk` bit and a constant `recall_at_1` column. Queries are
    // PLANTED perturbed twins of 5 corpus vectors (the corpus has no
    // natural near-neighbors), so each query has one true high-cosine hit
    // (≈0.995) that LSH must rank first — recall_at_1 = 1.0 demonstrates
    // the op; lower ranks are the random-similarity tail where ANN overlap
    // is legitimately partial.
    register("q_ann_lsh", None) { (s, dir) =>
      val emb = T(s, dir, "embeddings").select("vec_id", "embedding")
      val queries = emb.filter(col("vec_id") < 5).select(
        (col("vec_id") + 1000000).as("vec_id"),
        zip_with(col("embedding"), reverse(col("embedding")),
          (x, y) => x + lit(0.1f) * y).as("embedding"))
      val lsh = SimilarityOps.lshTopK(emb, "embedding", "vec_id",
        queries, "embedding", "vec_id", k = 5, planes = 8, tables = 8)
      val brute = SimilarityOps.bruteForceTopK(emb, "embedding", "vec_id",
        queries, "embedding", "vec_id", k = 5)
      val recall1 = lsh.filter(col("rank") === 1)
        .select(col("query_id"), col("corpus_id").as("lsh_1"))
        .join(brute.filter(col("rank") === 1)
          .select(col("query_id"), col("corpus_id").as("brute_1")), Seq("query_id"))
        .agg(avg(when(col("lsh_1") === col("brute_1"), 1.0).otherwise(0.0)).as("recall_at_1"))
      lsh.join(brute.select(col("query_id"), col("corpus_id"), lit(true).as("in_brute_topk")),
          Seq("query_id", "corpus_id"), "left")
        .withColumn("in_brute_topk", coalesce(col("in_brute_topk"), lit(false)))
        .crossJoin(recall1)
        .orderBy("query_id", "rank")
    }

    // IVF-bucketed ANN (coarse-quantizer cells + nprobe search) — the same
    // planted-twin protocol and in-result recall_at_1 check as q_ann_lsh.
    register("q_ann_ivf", None) { (s, dir) =>
      val emb = T(s, dir, "embeddings").select("vec_id", "embedding")
      val queries = emb.filter(col("vec_id") < 5).select(
        (col("vec_id") + 1000000).as("vec_id"),
        zip_with(col("embedding"), reverse(col("embedding")),
          (x, y) => x + lit(0.1f) * y).as("embedding"))
      val ivf = SimilarityOps.ivfTopK(emb, "embedding", "vec_id",
        queries, "embedding", "vec_id", k = 5, nlist = 16, nprobe = 4)
      val brute = SimilarityOps.bruteForceTopK(emb, "embedding", "vec_id",
        queries, "embedding", "vec_id", k = 5)
      val recall1 = ivf.filter(col("rank") === 1)
        .select(col("query_id"), col("corpus_id").as("ivf_1"))
        .join(brute.filter(col("rank") === 1)
          .select(col("query_id"), col("corpus_id").as("brute_1")), Seq("query_id"))
        .agg(avg(when(col("ivf_1") === col("brute_1"), 1.0).otherwise(0.0)).as("recall_at_1"))
      ivf.crossJoin(recall1).orderBy("query_id", "rank")
    }
  }

  private def textAnalysis(): Unit = {
    // PII scrub: the synthetic corpus carries no PII, so the query PLANTS
    // it deterministically (email always; phone/IP/SSN/CC on residue
    // classes), then counts + redacts. Patterns live in the Java-regex ∩
    // RE2 subset, so DuckDB replicates match sets byte-for-byte; the
    // redacted text is compared via md5. Pure codegen'd regexp exprs — no
    // UDFs, no shuffle.
    // patterns INTERPOLATED from PiiOps.Patterns (Java∩RE2 subset) so the
    // oracle can never drift from the engine's regexes
    val Seq(emailP, ccP, ssnP, phoneP, ipP) = PiiOps.Patterns.map(_._2)
    register("q_pii_redact", Some(
      s"""WITH aug AS (SELECT doc_id,
        |  text || ' Contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
        |  || CASE WHEN doc_id % 2 = 0 THEN ' call 555-123-4567' ELSE '' END
        |  || CASE WHEN doc_id % 3 = 0 THEN ' from 10.0.' || CAST(doc_id % 200 AS VARCHAR) || '.15' ELSE '' END
        |  || CASE WHEN doc_id % 5 = 0 THEN ' ssn 123-45-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END
        |  || CASE WHEN doc_id % 7 = 0 THEN ' card 4111 1111 1111 1111' ELSE '' END AS t
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(t, '$emailP')) AS BIGINT) AS n_email,
        |  CAST(len(regexp_extract_all(t, '$ccP')) AS BIGINT) AS n_cc,
        |  CAST(len(regexp_extract_all(t, '$ssnP')) AS BIGINT) AS n_ssn,
        |  CAST(len(regexp_extract_all(t, '$phoneP')) AS BIGINT) AS n_phone,
        |  CAST(len(regexp_extract_all(t, '$ipP')) AS BIGINT) AS n_ipv4,
        |  CAST(len(regexp_extract_all(t, '$emailP'))
        |     + len(regexp_extract_all(t, '$ccP'))
        |     + len(regexp_extract_all(t, '$ssnP'))
        |     + len(regexp_extract_all(t, '$phoneP'))
        |     + len(regexp_extract_all(t, '$ipP')) AS BIGINT) AS pii_total,
        |  md5(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(t,
        |    '$emailP', '<EMAIL>', 'g'),
        |    '$ccP', '<CC>', 'g'),
        |    '$ssnP', '<SSN>', 'g'),
        |    '$phoneP', '<PHONE>', 'g'),
        |    '$ipP', '<IP>', 'g')) AS redacted_md5
        |FROM aug ORDER BY doc_id""".stripMargin)) { (s, dir) =>
      val aug = T(s, dir, "documents").select(col("doc_id"), concat(
        col("text"), lit(" Contact user"), col("doc_id").cast("string"), lit("@example.com"),
        when(col("doc_id") % 2 === 0, lit(" call 555-123-4567")).otherwise(lit("")),
        when(col("doc_id") % 3 === 0,
          concat(lit(" from 10.0."), (col("doc_id") % 200).cast("string"), lit(".15")))
          .otherwise(lit("")),
        when(col("doc_id") % 5 === 0,
          concat(lit(" ssn 123-45-"), lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
          .otherwise(lit("")),
        when(col("doc_id") % 7 === 0, lit(" card 4111 1111 1111 1111")).otherwise(lit("")))
        .as("text"))
      PiiOps.scrub(aug, "text")
        .select(col("doc_id"), col("n_email"), col("n_cc"), col("n_ssn"),
          col("n_phone"), col("n_ipv4"), col("pii_total"),
          md5(col("text")).as("redacted_md5"))
        .orderBy("doc_id")
    }

    register("q_token_count", Some(
      """SELECT doc_id,
        |  len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens,
        |  len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS n_bpe_tokens
        |FROM documents ORDER BY doc_id""".stripMargin)) { (s, dir) =>
      T(s, dir, "documents").select(
        col("doc_id"),
        TextOps.tokenCount(col("text")).as("n_tokens"),
        TextOps.tokenCountBpe(col("text")).as("n_bpe_tokens"))
        .orderBy("doc_id")
    }

    // corpus vocabulary profile: token document-frequency + total counts —
    // the "what's in this corpus" first look of a training-data pipeline.
    // Deterministic top-k: (count desc, token asc); empty tokens from
    // leading/trailing whitespace are filtered identically on both sides.
    register("q_token_freq", Some(
      """SELECT token, count(*) AS n, count(DISTINCT doc_id) AS n_docs
        |FROM (SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS token
        |      FROM documents)
        |WHERE token <> ''
        |GROUP BY token
        |ORDER BY n DESC, token LIMIT 50""".stripMargin)) { (s, dir) =>
      T(s, dir, "documents")
        .select(col("doc_id"), explode(split(trim(col("text")), "\\s+")).as("token"))
        .filter(col("token") =!= "")
        .groupBy("token")
        .agg(count(lit(1)).as("n"), countDistinct(col("doc_id")).as("n_docs"))
        .orderBy(col("n").desc, col("token"))
        .limit(50)
    }

    // embedding hygiene stats: per-label counts + mean L2 norm. The
    // row-wise norm is IEEE double over the array's FIXED element order
    // (identical both engines); the cross-row mean goes through the
    // decimal-sum parity rule after rounding each norm to 6 digits (the
    // round collapses any last-ulp risk before aggregation).
    register("q_embedding_stats", Some(
      """SELECT label, count(*) AS n,
        |  max(len(embedding)) AS dims,
        |  CAST(sum(CAST(round(sqrt(list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')), 6) AS DECIMAL(18,6))) AS DOUBLE) / count(*) AS mean_norm,
        |  CAST(sum(CAST(round(CAST(embedding[1] AS DOUBLE), 6) AS DECIMAL(18,6))) AS DOUBLE) / count(*) AS mean_first
        |FROM embeddings GROUP BY label ORDER BY label""".stripMargin)) { (s, dir) =>
      val sq = aggregate(transform(col("embedding"),
        x => x.cast("double") * x.cast("double")), lit(0.0), (acc, v) => acc + v)
      T(s, dir, "embeddings")
        .select(col("label"),
          size(col("embedding")).cast("long").as("len_e"), // DuckDB len() is BIGINT
          round(sqrt(sq), 6).cast("decimal(18,6)").as("norm_d"),
          round(element_at(col("embedding"), 1).cast("double"), 6)
            .cast("decimal(18,6)").as("first_d"))
        .groupBy("label")
        .agg(count(lit(1)).as("n"),
          max(col("len_e")).as("dims"),
          (sum(col("norm_d")).cast("double") / count(lit(1))).as("mean_norm"),
          (sum(col("first_d")).cast("double") / count(lit(1))).as("mean_first"))
        .orderBy("label")
    }

    register("q_quality_score", Some(
      """SELECT doc_id,
        |  0.5 * (CAST(len(regexp_extract_all(text, '\bthe\b'))
        |            + len(regexp_extract_all(text, '\band\b'))
        |            + len(regexp_extract_all(text, '\bof\b')) AS DOUBLE)
        |         / CAST(len(regexp_split_to_array(trim(text), '\s+')) AS DOUBLE))
        |  + 0.5 * (least(CAST(len(regexp_split_to_array(trim(text), '\s+')) AS DOUBLE), 200.0) / 200.0)
        |    AS quality
        |FROM documents ORDER BY doc_id""".stripMargin)) { (s, dir) =>
      T(s, dir, "documents").select(
        col("doc_id"), TextOps.qualityScore(col("text")).as("quality"))
        .orderBy("doc_id")
    }

    register("q_langid", Some(
      """SELECT doc_id, lang AS labeled,
        |  CASE WHEN en >= de AND en >= fr AND en >= es THEN 'en'
        |       WHEN de >= fr AND de >= es THEN 'de'
        |       WHEN fr >= es THEN 'fr' ELSE 'es' END AS lang_pred
        |FROM (SELECT doc_id, lang,
        |  len(regexp_extract_all(text, '\bthe\b')) + len(regexp_extract_all(text, '\band\b'))
        |    + len(regexp_extract_all(text, '\bof\b')) AS en,
        |  len(regexp_extract_all(text, '\bder\b')) + len(regexp_extract_all(text, '\bdie\b'))
        |    + len(regexp_extract_all(text, '\bund\b')) AS de,
        |  len(regexp_extract_all(text, '\ble\b')) + len(regexp_extract_all(text, '\bla\b'))
        |    + len(regexp_extract_all(text, '\bet\b')) AS fr,
        |  len(regexp_extract_all(text, '\bel\b')) + len(regexp_extract_all(text, '\blos\b'))
        |    + len(regexp_extract_all(text, '\by\b')) AS es
        |  FROM documents)
        |ORDER BY doc_id""".stripMargin)) { (s, dir) =>
      T(s, dir, "documents").select(
        col("doc_id"), col("lang").as("labeled"),
        TextOps.langId(col("text")).as("lang_pred"))
        .orderBy("doc_id")
    }

    // rolling-hash fingerprint, FULLY oracled: the fp column is the
    // portable md5-based Karp-Rabin value (DuckDB replicates it
    // value-for-value) and `clusters_match_xxhash` verifies the xxhash64
    // fast path IN-RESULT — both hash schemes must induce the same
    // duplicate-cluster partition (distinct-count equality; collisions at
    // modulus 1e9+7 over ≤5k docs are ~1e-5-probability events).
    register("q_fingerprint", Some(
      """SELECT doc_id,
        |  list_reduce(list_prepend(CAST(0 AS BIGINT),
        |    list_transform(regexp_split_to_array(trim(text), '\s+'),
        |      tok -> CAST(('0x' || substr(md5(tok), 1, 8)) AS BIGINT) % 1000000007)),
        |    (acc, h) -> (acc * 31 + h) % 1000000007) AS fp,
        |  CAST(1 AS BOOLEAN) AS clusters_match_xxhash
        |FROM documents ORDER BY doc_id""".stripMargin)) { (s, dir) =>
      val fps = T(s, dir, "documents").select(
        col("doc_id"),
        TextOps.fingerprintPortable(col("text")).as("fp"),
        TextOps.fingerprint(col("text")).as("fp_xx"))
      val clusters = fps.agg(
        (countDistinct(col("fp")) === countDistinct(col("fp_xx")))
          .as("clusters_match_xxhash"))
      fps.select("doc_id", "fp").crossJoin(clusters).orderBy("doc_id")
    }

    // same Karp-Rabin semantics with an md5-derived token hash → fully
    // DuckDB-oracled (verifies the rolling-hash algebra value-for-value)
    register("q_fingerprint_portable", Some(
      """SELECT doc_id,
        |  list_reduce(list_prepend(CAST(0 AS BIGINT),
        |    list_transform(regexp_split_to_array(trim(text), '\s+'),
        |      tok -> CAST(('0x' || substr(md5(tok), 1, 8)) AS BIGINT) % 1000000007)),
        |    (acc, h) -> (acc * 31 + h) % 1000000007) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin)) { (s, dir) =>
      T(s, dir, "documents").select(
        col("doc_id"), TextOps.fingerprintPortable(col("text")).as("fp"))
        .orderBy("doc_id")
    }
  }

  private def qualityRepetition(): Unit = {
    // Gopher-style repetition signals, value-for-value vs DuckDB. The
    // synthetic documents are single-line word soup, so the query passes
    // lineSep=" " — the "line" signals become duplicate-WORD fractions,
    // which are non-trivial on this corpus and exercise the exact same
    // machinery (split, distinct, char sums) as newline-separated text.
    register("q_quality_repetition", Some(
      """WITH base AS (
        |  SELECT doc_id, text,
        |    string_split(text, ' ') AS ls,
        |    regexp_split_to_array(trim(text), '\s+') AS t
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, text, ls,
        |    CASE WHEN len(t) >= 2
        |      THEN list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])
        |      ELSE CAST([] AS VARCHAR[]) END AS gr
        |  FROM base),
        |topg AS (
        |  SELECT doc_id, max(c * length(gram)) AS top_chars
        |  FROM (SELECT doc_id, gram, count(*) AS c
        |        FROM (SELECT doc_id, unnest(gr) AS gram FROM g)
        |        GROUP BY doc_id, gram)
        |  GROUP BY doc_id)
        |SELECT g.doc_id AS doc_id,
        |  CAST(len(ls) AS INTEGER) AS n_lines,
        |  CAST(len(ls) - len(list_distinct(ls)) AS DOUBLE) / len(ls) AS dup_line_frac,
        |  CASE WHEN list_sum(list_transform(ls, l -> length(l))) > 0
        |    THEN CAST(list_sum(list_transform(ls, l -> length(l)))
        |           - list_sum(list_transform(list_distinct(ls), l -> length(l))) AS DOUBLE)
        |         / list_sum(list_transform(ls, l -> length(l)))
        |    ELSE 0.0 END AS dup_line_char_frac,
        |  CAST(len(gr) AS INTEGER) AS n_grams,
        |  CASE WHEN len(gr) > 0
        |    THEN CAST(len(gr) - len(list_distinct(gr)) AS DOUBLE) / len(gr)
        |    ELSE 0.0 END AS dup_gram_frac,
        |  CASE WHEN length(text) > 0
        |    THEN CAST(coalesce(top_chars, 0) AS DOUBLE) / length(text)
        |    ELSE 0.0 END AS top_gram_char_frac
        |FROM g LEFT JOIN topg USING (doc_id)
        |ORDER BY doc_id""".stripMargin)) { (s, dir) =>
      QualityOps.repetitionSignals(T(s, dir, "documents"), "doc_id", "text",
        n = 2, lineSep = " ").orderBy("doc_id")
    }
  }

  private def chunking(): Unit = {
    // sliding-context chunking: 32-token chunks starting every 24 tokens
    // (overlap 8). chunk_idx = start // stride because starts are exactly
    // the stride multiples; chunk_text compares as a raw string, so a
    // wrong slice bound or separator fails the hash.
    register("q_chunk_tokens", Some(
      """WITH d AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
        |           FROM documents WHERE length(trim(text)) > 0)
        |SELECT doc_id,
        |  CAST(s // 24 AS INTEGER) AS chunk_idx,
        |  array_to_string(list_slice(t, s + 1, least(s + 32, len(t))), ' ') AS chunk_text,
        |  CAST(least(32, len(t) - s) AS INTEGER) AS n_tokens
        |FROM (SELECT doc_id, t, unnest(range(0, len(t), 24)) AS s FROM d)
        |ORDER BY doc_id, chunk_idx""".stripMargin)) { (s, dir) =>
      ChunkOps.chunkByTokens(T(s, dir, "documents"), "doc_id", "text",
        chunkSize = 32, overlap = 8).orderBy("doc_id", "chunk_idx")
    }

    // greedy context packing: 512-token packs, 16 hash-disjoint shards,
    // concat-in-id-order-then-cut assignment — the window algebra
    // (shard-local running sum, floor offset division) replicated exactly.
    register("q_pack_greedy", Some(
      """WITH d AS (SELECT doc_id, doc_id % 16 AS shard,
        |    len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens
        |  FROM documents WHERE length(trim(text)) > 0),
        |w AS (SELECT doc_id, shard, n_tokens,
        |    sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tokens
        |  FROM d)
        |SELECT doc_id, CAST(shard AS BIGINT) AS shard,
        |  CAST((cum_tokens - n_tokens) // 512 AS BIGINT) AS pack_id,
        |  CAST(n_tokens AS BIGINT) AS n_tokens,
        |  CAST(cum_tokens AS BIGINT) AS cum_tokens
        |FROM w ORDER BY doc_id""".stripMargin)) { (s, dir) =>
      ChunkOps.packGreedy(T(s, dir, "documents"), "doc_id", "text",
        targetTokens = 512, shards = 16).orderBy("doc_id")
    }
  }

  private def decontamination(): Unit = {
    // benchmark decontamination: docs sharing >= 2 distinct word 3-grams
    // with the synthetic "benchmark" subset (doc_id % 97 == 0). String
    // n-grams, no hashing — DuckDB replicates them verbatim, so the
    // overlap counts compare value-for-value.
    register("q_decontaminate", Some(
      """WITH toks AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t FROM documents),
        |grams AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(t) - 1),
        |    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS gram
        |  FROM toks WHERE len(t) >= 3),
        |ev AS (SELECT DISTINCT gram FROM grams WHERE doc_id % 97 = 0),
        |tr AS (SELECT doc_id, gram FROM grams WHERE doc_id % 97 <> 0)
        |SELECT tr.doc_id, CAST(count(*) AS BIGINT) AS overlap
        |FROM tr JOIN ev USING (gram)
        |GROUP BY tr.doc_id HAVING count(*) >= 2
        |ORDER BY doc_id""".stripMargin)) { (s, dir) =>
      val docs = T(s, dir, "documents")
      val evalSet = docs.filter(col("doc_id") % 97 === 0)
      val train = docs.filter(col("doc_id") % 97 =!= 0)
      DedupOps.contaminationScores(train, evalSet, "text", "doc_id",
        n = 3, minOverlap = 2).orderBy("doc_id")
    }

    // deterministic 80/10/10 hash split: portable md5-low-60 bucket of
    // (doc_id + salt) — stable across engines, runs and cluster sizes
    register("q_hash_split", Some(
      """SELECT doc_id,
        |  CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val' ELSE 'test' END AS split
        |FROM (SELECT doc_id,
        |  CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':split'), 1, 15)) AS BIGINT) % 100 AS b
        |  FROM documents)
        |ORDER BY doc_id""".stripMargin)) { (s, dir) =>
      TableOps.hashSplit(T(s, dir, "documents"), "doc_id",
        Seq(("train", 80), ("val", 10), ("test", 10)))
        .select("doc_id", "split").orderBy("doc_id")
    }
  }

  private def mixturesAndSplits(): Unit = {
    // CCNet-style perplexity filter signal: mean NLL under a corpus-self-
    // trained add-one bigram LM. FULLY oracled — counts are exact
    // integers, the nll is rounded to 6 decimals on both sides so libm /
    // summation-order ulps can't flip a value.
    register("q_lm_perplexity", Some(
      """WITH d AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t FROM documents),
        |bgt AS (SELECT doc_id,
        |  unnest(list_transform(generate_series(1, len(t)-1), i -> t[i])) AS w1,
        |  unnest(list_transform(generate_series(1, len(t)-1), i -> t[i] || ' ' || t[i+1])) AS bg
        |  FROM d WHERE len(t) >= 2),
        |c12 AS (SELECT bg, COUNT(*) AS c12 FROM bgt GROUP BY 1),
        |c1 AS (SELECT w1, COUNT(*) AS c1 FROM bgt GROUP BY 1),
        |v AS (SELECT COUNT(DISTINCT tok) AS v FROM (SELECT unnest(t) AS tok FROM d))
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
        |  round(-SUM(ln((c12 + 1.0) / (c1 + v))) / COUNT(*), 6) AS nll
        |FROM bgt JOIN c12 USING (bg) JOIN c1 USING (w1), v
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin)) { (s, dir) =>
      QualityOps.lmPerplexityScore(T(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")
    }

    // LEAKAGE-SAFE split: hash-split on the near-dup CLUSTER id so every
    // member of a cluster lands in the same split (doc-id splits leak
    // ~20% of each cluster's copies into val/test). Oracle = recursive-CTE
    // clusters + the same portable md5 split on the component minimum.
    register("q_split_leakage_safe", Some(
      """WITH RECURSIVE d AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t FROM documents),
        |sh AS (SELECT doc_id,
        |  list_distinct(CASE WHEN len(t) >= 3 THEN
        |    list_transform(generate_series(1, len(t)-2), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
        |    ELSE [] END) AS s FROM d),
        |pairs AS (SELECT a.doc_id AS key_a, b.doc_id AS key_b
        |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |  WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
        |        CAST(len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) AS DOUBLE) >= 0.5),
        |edges AS (SELECT key_a AS a, key_b AS b FROM pairs
        |          UNION SELECT key_b, key_a FROM pairs),
        |reach(node, lab) AS (
        |  SELECT doc_id, doc_id FROM documents
        |  UNION
        |  SELECT e.b, r.lab FROM reach r JOIN edges e ON e.a = r.node),
        |comp AS (SELECT node AS doc_id, MIN(lab) AS cluster_id FROM reach GROUP BY node)
        |SELECT doc_id, cluster_id,
        |  CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val' ELSE 'test' END AS split
        |FROM (SELECT doc_id, cluster_id,
        |  CAST(('0x' || substr(md5(CAST(cluster_id AS VARCHAR) || ':split'), 1, 15)) AS BIGINT) % 100 AS b
        |  FROM comp)
        |ORDER BY doc_id""".stripMargin)) { (s, dir) =>
      val docs = T(s, dir, "documents")
      val pairs = DedupOps.minhashLshPairs(docs, "text", "doc_id",
        bands = 8, rowsPerBand = 4, minJaccard = 0.5)
      GraphOps.leakageSafeSplit(docs, "doc_id", pairs,
        Seq(("train", 80), ("val", 10), ("test", 10)))
        .select("doc_id", "cluster_id", "split")
        .orderBy("doc_id")
    }

    // URL provenance profile: plant deterministic URLs (the synthetic
    // corpus has none), extract hosts, aggregate per domain, and apply a
    // blocklist — the domain-level hygiene pass of a web-corpus pipeline.
    // Oracled value-for-value: the URL regex lives in the Java∩RE2 subset.
    register("q_url_domains", Some(
      """WITH aug AS (SELECT doc_id,
        |  text || ' see https://site' || CAST(doc_id % 20 AS VARCHAR) || '.example.org/p/' || CAST(doc_id AS VARCHAR)
        |       || CASE WHEN doc_id % 4 = 0 THEN ' and http://blocked.example.net/x' ELSE '' END AS t
        |  FROM documents),
        |u AS (SELECT doc_id,
        |  unnest(regexp_extract_all(t, 'https?://([A-Za-z0-9.-]+)(?:/[^\s]*)?', 1)) AS domain
        |  FROM aug)
        |SELECT domain, CAST(COUNT(*) AS BIGINT) AS n_urls,
        |  CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
        |  domain = 'blocked.example.net' AS is_blocked
        |FROM u GROUP BY domain ORDER BY domain""".stripMargin)) { (s, dir) =>
      val aug = T(s, dir, "documents").select(col("doc_id"), concat(
        col("text"), lit(" see https://site"), (col("doc_id") % 20).cast("string"),
        lit(".example.org/p/"), col("doc_id").cast("string"),
        when(col("doc_id") % 4 === 0, lit(" and http://blocked.example.net/x"))
          .otherwise(lit(""))).as("text"))
      aug.select(col("doc_id"), explode(TextOps.domains(col("text"))).as("domain"))
        .groupBy("domain")
        .agg(count(lit(1)).as("n_urls"),
          countDistinct(col("doc_id")).as("n_docs"),
          (first(col("domain")) === "blocked.example.net").as("is_blocked"))
        .orderBy("domain")
    }

    // deterministic training-mix composition: per-language keep rates via
    // an INTEGER threshold compare in the md5-low-60 space (the exact
    // pre-scaled literals are inlined into the oracle, so there is no
    // float division to disagree across engines)
    val mixRates = Seq("en" -> 0.3, "zh" -> 0.8)
    val mixDefault = 0.6
    val thresholds = mixRates.map { case (k, r) => k -> TableOps.rateThreshold(r) }
    register("q_sample_mixture", Some(
      s"""SELECT doc_id, lang FROM (SELECT doc_id, lang,
        |  CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':mix'), 1, 15)) AS BIGINT) AS b
        |  FROM documents)
        |WHERE b < CASE lang ${thresholds.map { case (k, t) => s"WHEN '$k' THEN $t" }.mkString(" ")}
        |  ELSE ${TableOps.rateThreshold(mixDefault)} END
        |ORDER BY doc_id""".stripMargin)) { (s, dir) =>
      TableOps.sampleMixture(T(s, dir, "documents"), "doc_id", "lang",
        mixRates, mixDefault)
        .select("doc_id", "lang")
        .orderBy("doc_id")
    }

    // corpus length-distribution profile: exact interpolated quantiles per
    // language (Spark `percentile` and DuckDB `quantile_cont` share the
    // linear-interpolation definition; ROUNDED to 6 decimals both sides so
    // the compare never rides on a last-ulp interpolation difference)
    register("q_length_quantiles", Some(
      """SELECT lang,
        |  round(quantile_cont(n_chars, 0.25), 6) AS p25,
        |  round(quantile_cont(n_chars, 0.5), 6) AS p50,
        |  round(quantile_cont(n_chars, 0.75), 6) AS p75,
        |  round(quantile_cont(n_chars, 0.95), 6) AS p95
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin)) { (s, dir) =>
      T(s, dir, "documents").groupBy("lang")
        .agg(
          round(expr("percentile(n_chars, 0.25)"), 6).as("p25"),
          round(expr("percentile(n_chars, 0.5)"), 6).as("p50"),
          round(expr("percentile(n_chars, 0.75)"), 6).as("p75"),
          round(expr("percentile(n_chars, 0.95)"), 6).as("p95"))
        .orderBy("lang")
    }
  }

  private def multimodal(): Unit = {
    // binary-column decode: image rows carry SYNTHESIZED PNG payloads whose
    // IHDR encodes dims derived from the text length — the query must parse
    // the actual PNG header (MultimodalOps.imageDims) to reproduce the
    // oracle's arithmetic, so a wrong parser fails the hash. Audio/video
    // stay on the deterministic stub codec (no audio/video libs shipped).
    register("q_multimodal_decode", Some(
      """SELECT doc_id AS media_id,
        |  CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS modality,
        |  CASE WHEN doc_id % 3 IN (0, 2) THEN CAST(16 + length(text) % 64 AS INTEGER) END AS width,
        |  CASE WHEN doc_id % 3 IN (0, 2) THEN CAST(16 + (length(text) // 64) % 64 AS INTEGER) END AS height,
        |  CASE WHEN doc_id % 3 = 1 THEN CAST(8000 + (length(text) % 3) * 4000 AS INTEGER) END AS sample_rate,
        |  CASE WHEN doc_id % 3 = 2 THEN CAST(1 + length(text) % 30 AS INTEGER) END AS n_frames
        |FROM documents ORDER BY media_id""".stripMargin)) { (s, dir) =>
      import s.implicits._
      val media = T(s, dir, "documents").select("doc_id", "text")
        .as[(Long, String)].map { case (id, text) =>
          val modality = (id % 3) match {
            case 0 => "image"; case 1 => "audio"; case _ => "video"
          }
          val payload =
            if (modality == "image")
              MultimodalOps.pngHeader(16 + text.length % 64, 16 + (text.length / 64) % 64)
            else text.getBytes("UTF-8")
          (id, modality, payload)
        }.toDF("doc_id", "modality", "payload")
      MultimodalOps.decode(media, "doc_id", "payload", "modality").toDF()
        .select("media_id", "modality", "width", "height", "sample_rate", "n_frames")
        .orderBy("media_id")
    }

    // REAL audio decode: payloads are complete synthesized RIFF/WAVE files
    // (square wave, amplitude a, so RMS == a exactly and peak == a); the
    // query must walk the chunk structure AND decode every s16le sample to
    // reproduce the oracle's closed forms — a header-only or wrong-stride
    // parser fails the hash. All derived quantities are exact (integer
    // sums, sqrt of a perfect square), so the double compare is bit-exact.
    register("q_audio_wav_decode", Some(
      """SELECT doc_id AS media_id,
        |  CAST(CASE doc_id % 3 WHEN 0 THEN 8000 WHEN 1 THEN 16000 ELSE 44100 END AS INTEGER) AS sample_rate,
        |  CAST(1 + doc_id % 2 AS INTEGER) AS channels,
        |  CAST(50 + length(text) % 200 AS INTEGER) AS n_samples,
        |  CAST((50 + length(text) % 200) * 1000 // (CASE doc_id % 3 WHEN 0 THEN 8000 WHEN 1 THEN 16000 ELSE 44100 END) AS BIGINT) AS duration_ms,
        |  CAST(1000 + length(text) % 20000 AS DOUBLE) AS rms,
        |  CAST(1000 + length(text) % 20000 AS INTEGER) AS peak
        |FROM documents ORDER BY media_id""".stripMargin)) { (s, dir) =>
      import s.implicits._
      val media = T(s, dir, "documents").select("doc_id", "text")
        .as[(Long, String)].map { case (id, text) =>
          val sr = (id % 3) match { case 0 => 8000; case 1 => 16000; case _ => 44100 }
          val channels = (1 + id % 2).toInt
          val n = 50 + text.length % 200
          val a = (1000 + text.length % 20000).toShort
          val frames = Array.tabulate(n)(i => if (i % 2 == 0) a else (-a).toShort)
          (id, MultimodalOps.wavBytes(sr, channels, frames))
        }.toDF("doc_id", "payload")
      MultimodalOps.audioFeatures(media, "doc_id", "payload").toDF()
        .orderBy("media_id")
    }

    // REAL pixel decode: payloads are complete 24-bit bottom-up BMPs with
    // R = baseR + y (top-origin), G = baseG + x, B constant. The query must
    // decode every pixel honoring the 4-byte row stride AND flip bottom-up
    // row order: channel sums catch a stride bug, top_row_sum_r (== the
    // LAST stored row) catches an unflipped decoder.
    register("q_image_bmp_stats", Some(
      """SELECT doc_id AS media_id,
        |  CAST(8 + length(text) % 32 AS INTEGER) AS width,
        |  CAST(8 + doc_id % 16 AS INTEGER) AS height,
        |  CAST((8 + length(text) % 32) * ((8 + doc_id % 16) * (doc_id % 100)
        |    + (8 + doc_id % 16) * (8 + doc_id % 16 - 1) // 2) AS BIGINT) AS sum_r,
        |  CAST((8 + doc_id % 16) * ((8 + length(text) % 32) * (length(text) % 100)
        |    + (8 + length(text) % 32) * (8 + length(text) % 32 - 1) // 2) AS BIGINT) AS sum_g,
        |  CAST((8 + length(text) % 32) * (8 + doc_id % 16) * ((doc_id + length(text)) % 100) AS BIGINT) AS sum_b,
        |  CAST((8 + length(text) % 32) * (doc_id % 100) AS BIGINT) AS top_row_sum_r
        |FROM documents ORDER BY media_id""".stripMargin)) { (s, dir) =>
      import s.implicits._
      val media = T(s, dir, "documents").select("doc_id", "text")
        .as[(Long, String)].map { case (id, text) =>
          val w = 8 + text.length % 32
          val h = (8 + id % 16).toInt
          val baseR = (id % 100).toInt
          val baseG = text.length % 100
          val baseB = ((id + text.length) % 100).toInt
          (id, MultimodalOps.bmp24(w, h, (x, y) => (baseR + y, baseG + x, baseB)))
        }.toDF("doc_id", "payload")
      MultimodalOps.imageStats(media, "doc_id", "payload").toDF()
        .orderBy("media_id")
    }

    // REAL compressed-format pixel decode: payloads are COMPLETE PNGs
    // (JDK encoder; lossless, so channel values round-trip exactly) with
    // the same gradient closed forms as the BMP query — the query must run
    // a real PNG decode (javax.imageio) to reproduce the oracle's sums.
    // This retires the "compressed codecs stay stubbed" caveat for images.
    register("q_image_png_decode", Some(
      """SELECT doc_id AS media_id,
        |  CAST(8 + length(text) % 32 AS INTEGER) AS width,
        |  CAST(8 + doc_id % 16 AS INTEGER) AS height,
        |  CAST((8 + length(text) % 32) * ((8 + doc_id % 16) * (doc_id % 100)
        |    + (8 + doc_id % 16) * (8 + doc_id % 16 - 1) // 2) AS BIGINT) AS sum_r,
        |  CAST((8 + doc_id % 16) * ((8 + length(text) % 32) * (length(text) % 100)
        |    + (8 + length(text) % 32) * (8 + length(text) % 32 - 1) // 2) AS BIGINT) AS sum_g,
        |  CAST((8 + length(text) % 32) * (8 + doc_id % 16) * ((doc_id + length(text)) % 100) AS BIGINT) AS sum_b,
        |  CAST((8 + length(text) % 32) * (doc_id % 100) AS BIGINT) AS top_row_sum_r
        |FROM documents ORDER BY media_id""".stripMargin)) { (s, dir) =>
      import s.implicits._
      // PNG encode + decode are per-row-heavy and the documents scan is one
      // split at bench scale — fan the tiny (id, text) rows out BEFORE the
      // payloads exist (guide §8: move small rows, compute heavy bytes after)
      val media = TableOps.fanOut(T(s, dir, "documents").select("doc_id", "text"))
        .as[(Long, String)].map { case (id, text) =>
          val w = 8 + text.length % 32
          val h = (8 + id % 16).toInt
          val baseR = (id % 100).toInt
          val baseG = text.length % 100
          val baseB = ((id + text.length) % 100).toInt
          (id, MultimodalOps.pngBytes(w, h, (x, y) => (baseR + y, baseG + x, baseB)))
        }.toDF("doc_id", "payload")
      MultimodalOps.imageStats(media, "doc_id", "payload").toDF()
        .orderBy("media_id")
    }

    // REAL multi-frame decode (the video-modality analogue): payloads are
    // animated GIFs with an explicit gray palette (lossless), gray(f,x,y)
    // = base + 7f + x + y < 256 by construction. n_frames comes from the
    // actual container scan; first/last frame sums catch dropped frames
    // and wrong frame order. Frame sum closed form:
    //   sum over x,y of 3*(base + 7f + x + y)
    //   = 3 * (w*h*(base+7f) + h*w(w-1)/2 + w*h(h-1)/2).
    register("q_video_gif_frames", Some(
      """SELECT doc_id AS media_id,
        |  CAST(2 + doc_id % 5 AS INTEGER) AS n_frames,
        |  CAST(3 * (w * h * base + h * (w * (w - 1) // 2) + w * (h * (h - 1) // 2)) AS BIGINT) AS first_frame_sum,
        |  CAST(3 * (w * h * (base + 7 * (1 + doc_id % 5)) + h * (w * (w - 1) // 2) + w * (h * (h - 1) // 2)) AS BIGINT) AS last_frame_sum
        |FROM (SELECT doc_id, 8 + length(text) % 16 AS w, 8 + doc_id % 12 AS h,
        |             length(text) % 100 AS base
        |      FROM documents)
        |ORDER BY media_id""".stripMargin)) { (s, dir) =>
      import s.implicits._
      // GIF encode + full frame decode: same single-split fan-out as PNG
      val media = TableOps.fanOut(T(s, dir, "documents").select("doc_id", "text"))
        .as[(Long, String)].map { case (id, text) =>
          val w = 8 + text.length % 16
          val h = (8 + id % 12).toInt
          val base = text.length % 100
          val frames = (2 + id % 5).toInt
          (id, MultimodalOps.gifBytes(w, h, frames, (f, x, y) => base + 7 * f + x + y))
        }.toDF("doc_id", "payload")
      MultimodalOps.videoFrameStats(media, "doc_id", "payload").toDF()
        .orderBy("media_id")
    }

    // REAL resize: decode → integer nearest-neighbor sample → PNG
    // re-encode → RE-DECODE the resized payload. All integer arithmetic
    // (src = (dst*srcDim)//outDim, out = ceil via (dim*m + longest-1)//
    // longest), so the resized image's channel sums have closed forms:
    //   sum_r = outW * (outH*baseR + Σ_y (y*h)//outH)
    //   sum_g = outH * (outW*baseG + Σ_x (x*w)//outW)
    //   sum_b = outW * outH * baseB.
    register("q_image_resize", Some(
      """SELECT doc_id AS media_id,
        |  CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
        |  CAST(ow AS INTEGER) AS out_width, CAST(oh AS INTEGER) AS out_height,
        |  CAST(ow * (oh * base_r + list_sum(list_transform(range(0, oh), y -> (y * h) // oh))) AS BIGINT) AS sum_r,
        |  CAST(oh * (ow * base_g + list_sum(list_transform(range(0, ow), x -> (x * w) // ow))) AS BIGINT) AS sum_g,
        |  CAST(ow * oh * base_b AS BIGINT) AS sum_b
        |FROM (SELECT doc_id, w, h,
        |        (w * 16 + greatest(w, h) - 1) // greatest(w, h) AS ow,
        |        (h * 16 + greatest(w, h) - 1) // greatest(w, h) AS oh,
        |        doc_id % 100 AS base_r, length(text) % 100 AS base_g,
        |        (doc_id + length(text)) % 100 AS base_b
        |      FROM (SELECT doc_id, text, 20 + length(text) % 40 AS w,
        |                   20 + doc_id % 30 AS h FROM documents))
        |ORDER BY media_id""".stripMargin)) { (s, dir) =>
      import s.implicits._
      // encode → decode → resize → re-encode → re-decode, all per-row-heavy:
      // fan the (id, text) rows out before any payload is synthesized
      val media = TableOps.fanOut(T(s, dir, "documents").select("doc_id", "text"))
        .as[(Long, String)].map { case (id, text) =>
          val w = 20 + text.length % 40
          val h = (20 + id % 30).toInt
          val baseR = (id % 100).toInt
          val baseG = text.length % 100
          val baseB = ((id + text.length) % 100).toInt
          (id, MultimodalOps.pngBytes(w, h, (x, y) => (baseR + y, baseG + x, baseB)))
        }.toDF("doc_id", "payload")
      // `resized` feeds BOTH the dims projection and the stats re-decode:
      // without a persist the whole encode→decode→resize pipeline runs
      // twice (once per join side)
      val resized = MultimodalOps.resizeImages(media, "doc_id", "payload", maxSide = 16).toDF()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val stats = MultimodalOps.imageStats(resized, "media_id", "payload").toDF()
        .select(col("media_id"), col("sum_r"), col("sum_g"), col("sum_b"))
      resized.select("media_id", "width", "height", "out_width", "out_height")
        .join(stats, Seq("media_id"))
        .orderBy("media_id")
    }

    // REAL MP3 container parse: payloads are complete CBR MPEG-1 Layer III
    // streams (valid frame headers, junk bodies); the query must walk
    // EVERY frame header (computing each frame's length from its own
    // header fields) to reproduce n_frames and the sample-exact duration —
    // a parser with a wrong frame-length formula or bitrate table fails
    // the hash. Sample decode (MDCT) is not exercised: these are container
    // facts, like gifFrameCount for GIF.
    register("q_audio_mp3_meta", Some(
      """SELECT doc_id AS media_id,
        |  CAST(sr AS INTEGER) AS sample_rate,
        |  CAST(1 + doc_id % 2 AS INTEGER) AS channels,
        |  CAST(CASE length(text) % 3 WHEN 0 THEN 64 WHEN 1 THEN 128 ELSE 192 END AS INTEGER) AS bitrate_kbps,
        |  CAST(3 + length(text) % 40 AS INTEGER) AS n_frames,
        |  CAST((3 + length(text) % 40) * 1152 * 1000 // sr AS BIGINT) AS duration_ms
        |FROM (SELECT doc_id, text,
        |        CASE doc_id % 3 WHEN 0 THEN 44100 WHEN 1 THEN 48000 ELSE 32000 END AS sr
        |      FROM documents)
        |ORDER BY media_id""".stripMargin)) { (s, dir) =>
      import s.implicits._
      val media = T(s, dir, "documents").select("doc_id", "text")
        .as[(Long, String)].map { case (id, text) =>
          val sr = (id % 3) match { case 0 => 44100; case 1 => 48000; case _ => 32000 }
          val kbps = (text.length % 3) match { case 0 => 64; case 1 => 128; case _ => 192 }
          (id, MultimodalOps.mp3Bytes(sr, kbps, (1 + id % 2).toInt, 3 + text.length % 40))
        }.toDF("doc_id", "payload")
      MultimodalOps.mp3Meta(media, "doc_id", "payload").toDF()
        .orderBy("media_id")
    }

    // REAL OGG container parse: payloads are complete OGG/Vorbis-ident
    // streams with REAL page CRCs; the query must walk every page,
    // validate its CRC, read channels/rate from the Vorbis identification
    // header and take total samples from the end-of-stream page's granule
    // position — a parser that skips CRC validation still passes here, but
    // one that mis-walks the lacing table or reads the wrong granule
    // fails the hash.
    register("q_audio_ogg_meta", Some(
      """SELECT doc_id AS media_id,
        |  CAST(sr AS INTEGER) AS sample_rate,
        |  CAST(1 + doc_id % 2 AS INTEGER) AS channels,
        |  CAST(1000 + (length(text) * 37) % 50000 AS BIGINT) AS n_samples,
        |  CAST((1000 + (length(text) * 37) % 50000) * 1000 // sr AS BIGINT) AS duration_ms,
        |  CAST(2 + doc_id % 4 AS INTEGER) AS n_pages
        |FROM (SELECT doc_id, text,
        |        CASE doc_id % 3 WHEN 0 THEN 8000 WHEN 1 THEN 16000 ELSE 44100 END AS sr
        |      FROM documents)
        |ORDER BY media_id""".stripMargin)) { (s, dir) =>
      import s.implicits._
      val media = T(s, dir, "documents").select("doc_id", "text")
        .as[(Long, String)].map { case (id, text) =>
          val sr = (id % 3) match { case 0 => 8000; case 1 => 16000; case _ => 44100 }
          (id, MultimodalOps.oggBytes(sr, (1 + id % 2).toInt,
            1000L + (text.length.toLong * 37) % 50000, (1 + id % 4).toInt))
        }.toDF("doc_id", "payload")
      MultimodalOps.oggMeta(media, "doc_id", "payload").toDF()
        .orderBy("media_id")
    }

    // REAL MP4 container parse: payloads are complete minimal ISO-BMFF
    // movies; the query must walk ftyp/moov/trak/mdia/minf/stbl, read the
    // video track's 16.16-fixed tkhd dims, the mvhd timescale/duration,
    // and SUM the stts sample counts (two entries — a single-entry
    // shortcut fails the hash) to reproduce the oracle's closed forms.
    register("q_video_mp4_meta", Some(
      """SELECT doc_id AS media_id,
        |  CAST(16 * (2 + length(text) % 8) AS INTEGER) AS width,
        |  CAST(16 * (2 + doc_id % 6) AS INTEGER) AS height,
        |  CAST((10 + doc_id % 20) + (5 + length(text) % 25) AS INTEGER) AS n_frames,
        |  CAST(1001 * (30 + length(text) % 300) * 1000 // 30000 AS BIGINT) AS duration_ms
        |FROM documents ORDER BY media_id""".stripMargin)) { (s, dir) =>
      import s.implicits._
      val media = T(s, dir, "documents").select("doc_id", "text")
        .as[(Long, String)].map { case (id, text) =>
          (id, MultimodalOps.mp4Bytes(
            16 * (2 + text.length % 8), 16 * (2 + id % 6).toInt,
            timescale = 30000, durationTicks = 1001L * (30 + text.length % 300),
            sttsCounts = Seq((10 + id % 20).toInt, 5 + text.length % 25)))
        }.toDF("doc_id", "payload")
      MultimodalOps.mp4Meta(media, "doc_id", "payload").toDF()
        .orderBy("media_id")
    }

    register("q_multimodal_frames", Some(
      """SELECT media_id, CAST(unnest(generate_series(0, n_frames - 1, 5)) AS INTEGER) AS frame_idx
        |FROM (SELECT doc_id AS media_id, 1 + length(text) % 30 AS n_frames
        |      FROM documents WHERE doc_id % 3 = 2)
        |ORDER BY media_id, frame_idx""".stripMargin)) { (s, dir) =>
      val media = T(s, dir, "documents").select(
        col("doc_id"),
        when(col("doc_id") % 3 === 0, "image")
          .when(col("doc_id") % 3 === 1, "audio").otherwise("video").as("modality"),
        encode(col("text"), "utf-8").as("payload"))
      val decoded = MultimodalOps.decode(media, "doc_id", "payload", "modality").toDF()
      MultimodalOps.sampleFrames(decoded, stride = 5)
        .orderBy("media_id", "frame_idx")
    }
  }
}
