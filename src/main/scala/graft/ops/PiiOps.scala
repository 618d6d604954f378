package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection and redaction for training-data hygiene — the scrubbing
  * pass a web-scale corpus needs before text reaches a training mix
  * (emails, phone numbers, IPs, SSN-like and card-like digit shapes).
  *
  * Everything is a codegen'd `regexp_*` expression over the text column —
  * no UDFs, embarrassingly parallel, no shuffle. Patterns are restricted
  * to the common subset of Java regex and RE2 (no backrefs, no lookahead,
  * ASCII classes only) so a DuckDB/RE2 oracle replicates the match sets
  * byte-for-byte.
  */
object PiiOps {

  /** A real IPv4 octet (0-255, no leading zeros) in the Java∩RE2 subset —
    * `999.999.999.999` and version-ish strings with out-of-range octets no
    * longer count as PII. DOCUMENTED residual over-match: the subset has
    * no lookahead, so `\b` cannot exclude a valid dotted quad that is the
    * PREFIX of a longer dotted run — `1.2.3.4.5` still redacts `1.2.3.4`
    * (leaving `.5`) in both engines. Acceptable: over-redaction of
    * version-like strings beats leaking an address, and the count
    * inflation is bounded to runs whose first four fields are each 0-255.
    */
  private val Octet = """(?:25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)"""

  /** (name, pattern, replacement-token) — applied in this order; the
    * patterns are mutually non-overlapping on any one span (anchored by
    * `\b` at digit boundaries), so application order never changes the
    * result, but a fixed order keeps plans deterministic.
    */
  val Patterns: Seq[(String, String, String)] = Seq(
    ("email", """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}""", "<EMAIL>"),
    ("cc", """\b\d{4}[- ]\d{4}[- ]\d{4}[- ]\d{4}\b""", "<CC>"),
    ("ssn", """\b\d{3}-\d{2}-\d{4}\b""", "<SSN>"),
    ("phone", """\b\d{3}-\d{3}-\d{4}\b""", "<PHONE>"),
    ("ipv4", s"""\\b$Octet\\.$Octet\\.$Octet\\.$Octet\\b""", "<IP>"))

  /** Per-kind match counts, one column per pattern: `n_email`, `n_cc`,
    * `n_ssn`, `n_phone`, `n_ipv4`.
    */
  def piiCounts(text: Column): Seq[(String, Column)] =
    Patterns.map { case (name, pat, _) =>
      s"n_$name" -> size(regexp_extract_all(text, lit(pat), lit(0))).cast("long")
    }

  /** Total PII mentions of any kind. */
  def piiTotal(text: Column): Column =
    piiCounts(text).map(_._2).reduce(_ + _)

  /** Redact: every match replaced by its kind token (`<EMAIL>`, `<CC>`,
    * `<SSN>`, `<PHONE>`, `<IP>`).
    */
  def redactPii(text: Column): Column =
    Patterns.foldLeft(text) { case (c, (_, pat, tok)) =>
      regexp_replace(c, lit(pat), lit(tok))
    }

  /** Scrub a corpus: append per-kind counts + `pii_total` and replace the
    * text column with its redacted form.
    */
  def scrub(df: DataFrame, textCol: String): DataFrame = {
    val counts = piiCounts(col(textCol))
    // ten regex passes per row (five count legs + five replace legs) at
    // the scan's partitioning serializes on one core for single-split
    // inputs — fan out first (identity at real scale, same pattern as
    // QualityOps.lmPerplexityScore)
    val withCounts = counts.foldLeft(TableOps.fanOut(df)) {
      case (d, (name, c)) => d.withColumn(name, c)
    }
    withCounts
      // sum the JUST-ADDED count columns — don't re-run every regex
      .withColumn("pii_total", counts.map { case (n, _) => col(n) }.reduce(_ + _))
      .withColumn(textCol, redactPii(col(textCol)))
  }

  /** Drop documents whose PII density exceeds `maxPerKChars` mentions per
    * 1000 characters — the filter form (docs that are mostly contact
    * dumps / scraped directories are dropped rather than redacted).
    */
  def dropHighPii(df: DataFrame, textCol: String, maxPerKChars: Double): DataFrame =
    df.filter(
      piiTotal(col(textCol)).cast("double") * 1000.0 /
        greatest(length(col(textCol)).cast("double"), lit(1.0)) <= maxPerKChars)
}
