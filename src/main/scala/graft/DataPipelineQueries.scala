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
    multimodal()
  }

  private def dedup(): Unit = {
    register("q_dedup_exact", Some(
      """SELECT md5(text) AS digest, MIN(doc_id) AS keeper, COUNT(*) AS n_copies
        |FROM documents GROUP BY 1 ORDER BY digest""".stripMargin)) { (s, dir) =>
      DedupOps.exactDuplicates(T(s, dir, "documents"), "text", "doc_id")
        .orderBy("digest")
    }

    // MinHash+LSH near-dup candidate pairs (xxhash64 signatures → rows-only)
    register("q_dedup_minhash_lsh", None) { (s, dir) =>
      DedupOps.minhashLshPairs(T(s, dir, "documents"), "text", "doc_id",
        bands = 8, rowsPerBand = 4, minJaccard = 0.5)
        .orderBy("key_a", "key_b")
    }

    register("q_dedup_simhash", None) { (s, dir) =>
      DedupOps.simhashPairs(T(s, dir, "documents"), "text", "doc_id", maxHamming = 8)
        .orderBy("key_a", "key_b")
    }

    // blocked n-gram Jaccard — exact verify inside (lang, length-band) blocks
    register("q_dedup_ngram_jaccard", None) { (s, dir) =>
      val df = T(s, dir, "documents").withColumn("len_band", (col("n_chars") / 64).cast("int"))
      DedupOps.ngramJaccardPairs(df, "text", "doc_id", Seq("lang", "len_band"),
        n = 3, minJaccard = 0.3)
        .orderBy("key_a", "key_b")
    }

    // materialized near-dedup: the table AFTER dropping near-duplicates
    register("q_dedup_drop_neardup", None) { (s, dir) =>
      DedupOps.dropMinhashNearDuplicates(
        T(s, dir, "documents"), "text", "doc_id", minJaccard = 0.5)
        .select("doc_id", "lang", "n_chars")
        .orderBy("doc_id")
    }

    register("q_dedup_embedding_cosine", None) { (s, dir) =>
      DedupOps.embeddingCosinePairs(T(s, dir, "embeddings"), "embedding", "vec_id",
        minCosine = 0.9, planes = 8)
        .orderBy("key_a", "key_b")
    }
  }

  private def similarity(): Unit = {
    // exact brute-force cosine top-k (baseline; first 5 vectors as queries)
    register("q_ann_brute_force", None) { (s, dir) =>
      val emb = T(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id") < 5)
      SimilarityOps.bruteForceTopK(emb, "embedding", "vec_id",
        queries, "embedding", "vec_id", k = 10)
        .orderBy("query_id", "rank")
    }

    // LSH-bucketed ANN (the scale path)
    register("q_ann_lsh", None) { (s, dir) =>
      val emb = T(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id") < 5)
      SimilarityOps.lshTopK(emb, "embedding", "vec_id",
        queries, "embedding", "vec_id", k = 10, planes = 8, tables = 4)
        .orderBy("query_id", "rank")
    }
  }

  private def textAnalysis(): Unit = {
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

    // rolling-hash fingerprint (xxhash64-based → rows-only)
    register("q_fingerprint", None) { (s, dir) =>
      T(s, dir, "documents").select(
        col("doc_id"), TextOps.fingerprint(col("text")).as("fp"))
        .orderBy("doc_id")
    }
  }

  private def multimodal(): Unit = {
    // binary-column decode plumbing with deterministic stub codec
    register("q_multimodal_decode", Some(
      """SELECT doc_id AS media_id,
        |  CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS modality,
        |  CASE WHEN doc_id % 3 IN (0, 2) THEN CAST(16 + length(text) % 64 AS INTEGER) END AS width,
        |  CASE WHEN doc_id % 3 IN (0, 2) THEN CAST(16 + (length(text) // 64) % 64 AS INTEGER) END AS height,
        |  CASE WHEN doc_id % 3 = 1 THEN CAST(8000 + (length(text) % 3) * 4000 AS INTEGER) END AS sample_rate,
        |  CASE WHEN doc_id % 3 = 2 THEN CAST(1 + length(text) % 30 AS INTEGER) END AS n_frames
        |FROM documents ORDER BY media_id""".stripMargin)) { (s, dir) =>
      val media = T(s, dir, "documents").select(
        col("doc_id"),
        when(col("doc_id") % 3 === 0, "image")
          .when(col("doc_id") % 3 === 1, "audio").otherwise("video").as("modality"),
        encode(col("text"), "utf-8").as("payload"))
      MultimodalOps.decode(media, "doc_id", "payload", "modality").toDF()
        .select("media_id", "modality", "width", "height", "sample_rate", "n_frames")
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
