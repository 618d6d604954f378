package graft.lake

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Z-order (Morton) clustering value for multi-column data skipping — the
  * Delta `OPTIMIZE ... ZORDER BY` layout idea: rows sorted by the bit-
  * interleave of per-column QUANTILE BINS land in files whose min/max
  * ranges are tight on EVERY z-order column at once, so
  * [[DataSkipping]] can exclude most files for predicates on any subset
  * of those columns. A plain lexicographic sort gets tight ranges only on
  * its leading column.
  *
  * Construction (all pure Catalyst expressions — codegen'd, no UDF):
  *   1. each column is mapped to a monotone double ("rankable"): numerics
  *      and temporals cast directly; strings via an 8-byte prefix weight
  *      (UTF-8 order-preserving to prefix precision);
  *   2. the rankable is bucketed into 2^bits quantile bins — boundaries
  *      come from ONE multi-column `approxQuantile` pass (quantile
  *      binning is skew-robust where linear min/max scaling collapses
  *      under Zipf-shaped values); nulls bin to 0;
  *   3. bins interleave bit-by-bit into one long.
  *
  * Imperfect rank monotonicity (string prefixes, quantile approximation)
  * only LOOSENS clustering — skipping stays sound because file bounds are
  * harvested from the actual written data, never derived from z math.
  */
object ZOrder {

  val MAX_COLS = 6
  val DEFAULT_BITS = 8

  /** The z-value Column for `cols`, with quantile boundaries computed
    * from `df` (one `approxQuantile` job over the frame being rewritten —
    * acceptable for a layout maintenance op, never on the write hot
    * path). The returned Column is pure expression: it can be applied to
    * any frame carrying the same column names.
    */
  def zColumn(df: DataFrame, cols: Seq[String], bits: Int = DEFAULT_BITS): Column = {
    require(cols.nonEmpty && cols.size <= MAX_COLS,
      s"ZORDER BY takes 1..$MAX_COLS columns, got ${cols.size}")
    require(bits >= 1 && bits * cols.size <= 60,
      s"bits=$bits with ${cols.size} columns exceeds the 60-bit z budget")
    val schema = df.schema
    cols.foreach(c => require(schema.fieldNames.contains(c), s"ZORDER BY: no such column '$c'"))

    val nBins = 1 << bits
    val probs = (1 until nBins).map(_.toDouble / nBins).toArray
    val rankNames = cols.indices.map(i => s"__zr$i")
    val ranked = df.select(cols.zip(rankNames).map { case (c, rn) =>
      rankable(col(c), schema(c).dataType).as(rn)
    }: _*)
    // one pass for ALL columns' boundaries; relativeError trades a little
    // bin uniformity for a bounded-memory sketch at any scale
    val bnds = ranked.stat.approxQuantile(rankNames.toArray, probs, 0.001)

    val bins = cols.zipWithIndex.map { case (c, i) =>
      binOf(rankable(col(c), schema(c).dataType), bnds(i))
    }
    interleave(bins, bits)
  }

  /** Monotone double view of a column (see scaladoc). */
  private[lake] def rankable(c: Column, dt: DataType): Column = dt match {
    case _: NumericType => c.cast(DoubleType)
    case DateType => c.cast(IntegerType).cast(DoubleType)
    case TimestampType | TimestampNTZType => c.cast(DoubleType) // epoch seconds + fraction
    case BooleanType => c.cast(IntegerType).cast(DoubleType)
    case StringType =>
      // 8-byte prefix weight: sum of leading code points at descending
      // byte weights — order-preserving to prefix precision, which is all
      // a clustering heuristic needs
      (1 to 8).map(i => coalesce(ascii(substring(c, i, 1)), lit(0))
        .cast(DoubleType) * lit(math.pow(2.0, 8.0 * (8 - i)))).reduce(_ + _)
    case other => throw new IllegalArgumentException(
      s"ZORDER BY: unsupported column type ${other.sql}")
  }

  /** Quantile-bin index of `r` given sorted `boundaries` (size 2^bits-1):
    * count of boundaries <= r, via a codegen'd HOF fold — O(2^bits) per
    * row, branch-free. Nulls bin to 0.
    */
  private[lake] def binOf(r: Column, boundaries: Array[Double]): Column = {
    val distinct = boundaries.distinct // constant columns collapse bins
    if (distinct.isEmpty) return lit(0L)
    val folded = aggregate(
      typedlit(distinct.toSeq),
      lit(0L),
      (acc, b) => acc + when(r >= b, 1L).otherwise(0L))
    when(r.isNull, 0L).otherwise(folded)
  }

  /** Bit-interleave `bins` (each in [0, 2^bits)) into one long:
    * bit i of column c lands at position i*k + c.
    */
  private[lake] def interleave(bins: Seq[Column], bits: Int): Column = {
    val k = bins.size
    val terms = for {
      i <- 0 until bits
      c <- 0 until k
    } yield shiftleft(shiftright(bins(c), i).bitwiseAND(lit(1L)), i * k + c)
    terms.reduce(_ + _).as("__z")
  }
}
