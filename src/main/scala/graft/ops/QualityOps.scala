package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-quality signals that need per-term multiplicity, computed in the
  * aggregation shape that survives 100 TB (the reference's quality gates
  * are tabular `sanity_checks`; these are the web-corpus analogues from
  * Rae et al. 2021 "Gopher" §A1.1, with simplified closed-form
  * definitions a cross-engine oracle replicates exactly).
  */
object QualityOps {

  /** Per-document repetition signals: the per-row legs (duplicate-line
    * and duplicate-n-gram fractions — the staged column form of
    * [[TextOps.repetitionExprs]], pure HOFs, no shuffle) joined with the
    * top-gram coverage leg, which needs a per-gram COUNT and therefore runs as
    * explode → (id, gram) hash count (map-side partial) → per-id max —
    * one narrow shuffle of (id, gram, count) rows. A per-row HOF count
    * would be O(grams²) per document: quadratic in document length is the
    * wrong trade against one equi-shaped aggregation.
    *
    * Output: `idCol`, n_lines, dup_line_frac, dup_line_char_frac,
    * n_grams, dup_gram_frac, top_gram_char_frac (chars covered by the
    * single most repeated n-gram, counting overlaps, over total chars).
    */
  def repetitionSignals(df: DataFrame, idCol: String, textCol: String,
                        n: Int = 2, lineSep: String = "\n"): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    require(lineSep.nonEmpty, "lineSep must be non-empty")
    // STAGED form of [[TextOps.repetitionExprs]] (identical values): the
    // line and gram arrays are computed ONCE as columns and every signal
    // reads the attribute. Authoring the signals directly against `text`
    // duplicates the split/gram subtree in each of the six column
    // expressions (HOF lambdas are codegen-fallback — no subexpression
    // elimination reaches them), measured 10.2 s vs 0.3 s noop-isolated
    // on the sf0.1 corpus. CollapseProject cannot re-inline the staged
    // aliases: each is non-cheap and multiply referenced.
    def charSum(arr: org.apache.spark.sql.Column) =
      aggregate(arr, lit(0L), (acc, l) => acc + length(l))
    val staged = df.select(col(idCol),
      length(col(textCol)).as("__n_chars"),
      split(col(textCol), java.util.regex.Pattern.quote(lineSep), -1).as("__ls"),
      TextOps.shinglesAll(col(textCol), n).as("__gr"))
    val allChars = charSum(col("__ls"))
    val nGrams = size(col("__gr"))
    val base = staged.select(col(idCol),
      size(col("__ls")).as("n_lines"),
      ((size(col("__ls")) - size(array_distinct(col("__ls")))).cast("double") /
        size(col("__ls")).cast("double")).as("dup_line_frac"),
      when(allChars > 0,
        (allChars - charSum(array_distinct(col("__ls")))).cast("double") /
          allChars.cast("double"))
        .otherwise(lit(0.0)).as("dup_line_char_frac"),
      nGrams.as("n_grams"),
      when(nGrams > 0,
        (nGrams - size(array_distinct(col("__gr")))).cast("double") /
          nGrams.cast("double"))
        .otherwise(lit(0.0)).as("dup_gram_frac"),
      col("__n_chars"))
    val counts = df
      .select(col(idCol), explode(TextOps.shinglesAll(col(textCol), n)).as("gram"))
      .groupBy(idCol, "gram").count()
    val top = counts.groupBy(idCol)
      .agg(max(col("count") * length(col("gram"))).as("__top_chars"))
    base.join(top, Seq(idCol), "left")
      .withColumn("top_gram_char_frac",
        when(col("__n_chars") > 0,
          coalesce(col("__top_chars"), lit(0L)).cast("double") /
            col("__n_chars").cast("double"))
          .otherwise(lit(0.0)))
      .drop("__top_chars", "__n_chars")
  }

  /** Drop rows whose repetition signals exceed the given ceilings —
    * the filter form (Gopher uses dup-line 0.30, dup-gram ~0.18-0.6 by
    * n; thresholds are corpus policy, so they are parameters here).
    */
  def dropRepetitive(df: DataFrame, idCol: String, textCol: String,
                     maxDupLineFrac: Double = 0.3,
                     maxDupGramFrac: Double = 0.6,
                     n: Int = 2, lineSep: String = "\n"): DataFrame = {
    val sig = repetitionSignals(df, idCol, textCol, n, lineSep)
      .select(col(idCol), col("dup_line_frac"), col("dup_gram_frac"))
    df.join(sig, Seq(idCol), "left")
      .filter(col("dup_line_frac") <= maxDupLineFrac &&
        col("dup_gram_frac") <= maxDupGramFrac)
      .drop("dup_line_frac", "dup_gram_frac")
  }

  /** CCNet-style language-model perplexity proxy (Wenzek et al. 2020
    * train a KenLM and drop high-perplexity documents; here the LM is a
    * corpus-self-trained add-one-smoothed BIGRAM model — deterministic,
    * no external model file, same filtering semantics): per document, the
    * mean negative log probability of its token bigrams,
    *
    *   nll(d) = -(1/N_d) Σ ln( (C(w1 w2) + 1) / (C(w1·) + V) )
    *
    * with C = corpus bigram/context counts and V = corpus vocabulary
    * size. Gibberish and boilerplate-free word salad score HIGH (its
    * bigrams are rare); templated/repetitive text scores LOW.
    *
    * Scale shape: one explode pass builds the per-doc bigram bag; corpus
    * counts are two hash aggs with map-side partial combine; the count
    * tables join back per-bigram (broadcast when `broadcastModel` — a
    * natural-language bigram table is vocab²-bounded and heavy-tailed,
    * usually megabytes; shuffle equi-join otherwise); one final per-doc
    * agg. The nll is ROUNDED to 6 decimals so cross-engine libm/sum-order
    * ulps can't flip a value (counts themselves are exact integers).
    *
    * Output: `idCol`, n_bigrams, nll — docs with < 2 tokens are absent
    * (no bigram evidence; callers decide their fate).
    */
  def lmPerplexityScore(df: DataFrame, idCol: String, textCol: String,
                        broadcastModel: Boolean = true): DataFrame = {
    // tokenize/explode at the scan's partitioning serializes on one core
    // for single-split inputs — fan out first (identity at real scale)
    val toks = TableOps.fanOut(df.select(col(idCol), col(textCol)))
      .select(col(idCol), split(trim(col(textCol)), "\\s+").as("t"))
    // guard size >= 2 BEFORE sequence(): Spark's sequence(1, 0) counts
    // DOWN ([1, 0]) rather than returning empty
    val bigrams = toks.filter(size(col("t")) >= 2).select(col(idCol), explode(
      expr("transform(sequence(1, size(t) - 1), i -> struct(t[i-1] as w1, concat(t[i-1], ' ', t[i]) as bg))"))
      .as("b"))
      .select(col(idCol), col("b.w1").as("w1"), col("b.bg").as("bg"))
    val c12raw = bigrams.groupBy("bg").agg(count(lit(1)).as("c12"))
    val c1raw = bigrams.groupBy("w1").agg(count(lit(1)).as("c1"))
    val (c12, c1) =
      if (broadcastModel) (broadcast(c12raw), broadcast(c1raw)) else (c12raw, c1raw)
    val vocab = toks.select(explode(col("t")).as("w")).agg(
      countDistinct(col("w")).as("v"))
    bigrams
      .join(c12, "bg")
      .join(c1, "w1")
      .crossJoin(broadcast(vocab))
      .groupBy(idCol)
      .agg(
        count(lit(1)).as("n_bigrams"),
        round(-sum(log((col("c12") + lit(1.0)) / (col("c1") + col("v")))) /
          count(lit(1)), 6).as("nll"))
  }

  /** Drop documents whose perplexity proxy exceeds `maxNll` — the CCNet
    * filter form. Documents with < 2 tokens carry no bigram evidence and
    * are KEPT (they are the short-doc gate's job, not the LM's).
    */
  def dropHighPerplexity(df: DataFrame, idCol: String, textCol: String,
                         maxNll: Double): DataFrame =
    df.join(
      lmPerplexityScore(df, idCol, textCol).filter(col("nll") > maxNll)
        .select(col(idCol)),
      Seq(idCol), "left_anti")
}
