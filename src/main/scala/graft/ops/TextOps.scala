package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text analysis for large-scale training-data pipelines: token counting,
  * language ID, quality scoring, document fingerprinting. All pure column
  * expressions (codegen'd, no UDFs) so they run at 100 TB scan speed.
  */
object TextOps {

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(split(trim(text), "\\s+"))

  /** BPE-ish token count: alpha runs, digit runs, single punctuation. */
  def tokenCountBpe(text: Column): Column =
    regexp_count(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"))

  /** URL pattern in the Java-regex ∩ RE2 subset (cross-engine oracle-able,
    * like [[PiiOps.Patterns]]): scheme + host, optional path up to
    * whitespace.
    */
  val UrlPattern = """https?://[A-Za-z0-9.-]+(?:/[^\s]*)?"""

  /** All URLs in the text. */
  def urls(text: Column): Column =
    regexp_extract_all(text, lit(UrlPattern), lit(0))

  /** All URL host names in the text (the provenance/blocklist key of a
    * web-corpus pipeline).
    */
  def domains(text: Column): Column =
    transform(urls(text),
      u => regexp_extract(u, "https?://([A-Za-z0-9.-]+)", 1))

  /** Drop documents containing a URL on any blocked domain (exact host
    * match). Codegen'd filter, no shuffle; the blocklist is a plan
    * literal (user blocklists are thousands of hosts, not billions —
    * for a huge list, semi-join `explode(domains)` against a table
    * instead).
    */
  def dropBlockedDomains(df: org.apache.spark.sql.DataFrame, textCol: String,
                         blocked: Seq[String]): org.apache.spark.sql.DataFrame =
    df.filter(!exists(domains(col(textCol)),
      d => d.isInCollection(blocked)))

  /** Count of whole-word occurrences of `word`. */
  def wordCount(text: Column, word: String): Column =
    regexp_count(text, lit("\\b" + word + "\\b"))

  /** Quality score in [0,1]: blend of stopword ratio and length signal —
    * the shape of heuristic quality filters used on web corpora (length /
    * punctuation / stopword gates). Deterministic double math.
    */
  def qualityScore(text: Column): Column = {
    val toks = tokenCount(text).cast("double")
    val stop = (wordCount(text, "the") + wordCount(text, "and") + wordCount(text, "of"))
      .cast("double")
    lit(0.5) * (stop / toks) + lit(0.5) * (least(toks, lit(200.0)) / lit(200.0))
  }

  /** Language ID by stopword-count heuristic over a fixed n-gram/stopword
    * table; deterministic argmax tie-break (en > de > fr > es).
    */
  def langIdScore(text: Column, words: Seq[String]): Column =
    words.map(w => wordCount(text, w)).reduce(_ + _)

  def langId(text: Column): Column = {
    val en = langIdScore(text, Seq("the", "and", "of"))
    val de = langIdScore(text, Seq("der", "die", "und"))
    val fr = langIdScore(text, Seq("le", "la", "et"))
    val es = langIdScore(text, Seq("el", "los", "y"))
    when(en >= de && en >= fr && en >= es, "en")
      .when(de >= fr && de >= es, "de")
      .when(fr >= es, "fr")
      .otherwise("es")
  }

  /** Rolling (Karp-Rabin-style) document fingerprint over whitespace tokens:
    * polynomial hash mod 1e9+7, computed with a higher-order `aggregate`
    * over the token array — ANSI-safe (the modulus keeps the accumulator
    * bounded, no long overflow).
    */
  def fingerprint(text: Column): Column = {
    val M = 1000000007L
    aggregate(
      split(trim(text), "\\s+"),
      lit(0L),
      (acc, tok) => pmod(acc * lit(31L) + pmod(xxhash64(tok), lit(M)), lit(M)))
  }

  /** Cross-engine-portable variant of [[fingerprint]]: same Karp-Rabin
    * polynomial, but the per-token hash is the first 8 hex digits of md5
    * (md5 is identical in every engine, unlike xxhash64) — lets a DuckDB
    * oracle verify the rolling-hash semantics value-for-value. The
    * xxhash64 [[fingerprint]] stays the fast path (no md5 string work).
    */
  def fingerprintPortable(text: Column): Column = {
    val M = 1000000007L
    aggregate(
      split(trim(text), "\\s+"),
      lit(0L),
      (acc, tok) => pmod(acc * lit(31L) +
        pmod(conv(substring(md5(tok), 1, 8), 16, 10).cast("long"), lit(M)), lit(M)))
  }

  /** Cross-engine-portable 60-bit token hash: the first 15 hex digits of
    * md5 as a long. 15 digits (not 16) so the value always fits SIGNED
    * 64-bit on every engine — a 16-digit hex with the high bit set
    * overflows BIGINT casts (and Spark ANSI long casts) non-portably.
    * Used by the portable twins of the xxhash64 fast paths (simhash,
    * content checksum, fingerprint) so a DuckDB oracle can replicate the
    * exact bit patterns.
    */
  def md5Hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Portable per-token hash array (see [[md5Hash60]]). */
  def tokenHashesPortable(text: Column): Column =
    transform(split(trim(text), "\\s+"), t => md5Hash60(t))

  /** Word n-grams as a zip_with chain over n shifted slices of the token
    * array — O(n) evaluations of the tokenizing split per ROW. The
    * previous form indexed a captured `toks` inside a
    * `transform(sequence(...))` lambda; HOF lambdas re-evaluate captured
    * non-attribute subtrees PER ELEMENT, so the regex split ran
    * (#grams × n) times per row instead of n (measured on the sf0.1
    * documents corpus, n=2: 4.6 s → 0.2 s noop-isolated). Gram values
    * are identical: gram_i = concat_ws(" ", t_i..t_{i+n-1}).
    */
  private def gramChain(toks: Column, n: Int): Column = {
    val cnt = size(toks) - n + 1 // number of grams when size >= n
    (2 to n).foldLeft(slice(toks, lit(1), cnt))((acc, j) =>
      zip_with(acc, slice(toks, lit(j), cnt), (a, b) => concat_ws(" ", a, b)))
  }

  /** n-gram shingles WITH multiplicity (no dedup) — the input to
    * repetition statistics, where how often a gram repeats is the point.
    * Same short-document guard as [[shingles]].
    */
  def shinglesAll(text: Column, n: Int): Column = {
    val toks = split(trim(text), "\\s+")
    when(size(toks) >= n, gramChain(toks, n))
      .otherwise(array().cast("array<string>"))
  }

  /** Gopher-style repetition quality signals, computed per row as pure
    * column expressions (higher-order functions — no UDFs, no shuffle):
    *
    *  - `n_lines`, `dup_line_frac`: fraction of lines (split on
    *    `lineSep`) that are repeats of an earlier line;
    *  - `dup_line_char_frac`: fraction of line characters sitting in
    *    those repeated occurrences (Σ len(all lines) − Σ len(distinct
    *    lines)) / Σ len(all lines);
    *  - `n_grams`, `dup_gram_frac`: fraction of word `n`-gram occurrences
    *    that are repeats of an earlier occurrence.
    *
    * The reference's quality gates are length/NaN checks on tabular data
    * (`sanity_checks`); these are their web-corpus analogues (Rae et al.
    * 2021 "Gopher" §A1.1, simplified to closed forms a cross-engine
    * oracle can replicate exactly). The top-gram coverage signal needs a
    * per-gram count and lives in the aggregation-shaped
    * `QualityOps.repetitionSignals`.
    */
  def repetitionExprs(text: Column, n: Int, lineSep: String): Seq[(String, Column)] = {
    // -1 limit: keep trailing empty fields, matching DuckDB's string_split
    val lines = split(text, java.util.regex.Pattern.quote(lineSep), -1)
    val distinctLines = array_distinct(lines)
    def charSum(arr: Column): Column =
      aggregate(arr, lit(0L), (acc, l) => acc + length(l))
    val allChars = charSum(lines)
    val grams = shinglesAll(text, n)
    val nGrams = size(grams)
    Seq(
      "n_lines" -> size(lines),
      "dup_line_frac" ->
        ((size(lines) - size(distinctLines)).cast("double") / size(lines).cast("double")),
      "dup_line_char_frac" ->
        when(allChars > 0,
          (allChars - charSum(distinctLines)).cast("double") / allChars.cast("double"))
          .otherwise(lit(0.0)),
      "n_grams" -> nGrams,
      "dup_gram_frac" ->
        when(nGrams > 0,
          (nGrams - size(array_distinct(grams))).cast("double") / nGrams.cast("double"))
          .otherwise(lit(0.0)))
  }

  /** n-gram shingles over whitespace tokens (n fixed at call site).
    * Documents with fewer than `n` tokens yield an EMPTY shingle set —
    * guarded so `slice` never sees a negative gram count (a single
    * short/empty doc must not crash a 100 TB dedup job).
    */
  def shingles(text: Column, n: Int): Column = {
    val toks = split(trim(text), "\\s+")
    when(size(toks) >= n, array_distinct(gramChain(toks, n)))
      .otherwise(array().cast("array<string>"))
  }
}
