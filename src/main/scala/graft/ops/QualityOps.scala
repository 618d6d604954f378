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
    * and duplicate-n-gram fractions — [[TextOps.repetitionExprs]], pure
    * codegen-friendly HOFs, no shuffle) joined with the top-gram coverage
    * leg, which needs a per-gram COUNT and therefore runs as
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
    val rowExprs = TextOps.repetitionExprs(col(textCol), n, lineSep)
      .map { case (name, c) => c.as(name) }
    val base = df.select(
      (col(idCol) +: rowExprs :+ length(col(textCol)).as("__n_chars")): _*)
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
}
