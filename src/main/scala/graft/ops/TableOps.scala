package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Row/column operators with owid-etl semantics (SURVEY.md §2.2, §2.3,
  * §2.6, §2.7), expressed as declarative DataFrame transforms so Catalyst
  * gets pushdown/pruning for free. Citations are into /root/reference.
  */
object TableOps {

  /** Spread a narrowly-partitioned input across the session's parallelism
    * ahead of a per-row-heavy stage (JSON parse, codec work, shingle
    * explode). A small table is one parquet split = ONE scan task, so the
    * expensive stage would otherwise run on one core while the rest idle
    * (optimization guide §2.4/§8: move the cheap rows, then fan out the
    * heavy compute). Scale-adaptive, not a local-mode constant: when the
    * scan already splits at least as fine as the session's default
    * parallelism — the normal case at real scale — this is the identity
    * and adds NO exchange.
    */
  def fanOut(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= target) df else df.repartition(target)
  }

  // ---------- §2.2 projections / filters / row ops ----------

  /** snake_case normalization of a single name (owid-etl `underscore`,
    * `lib/catalog/owid/catalog/utils.py:41-50`).
    */
  def underscoreName(s: String): String = {
    val cleaned = s.trim
      .replaceAll("([a-z\\d])([A-Z])", "$1_$2")
      .toLowerCase
      .replaceAll("[^a-z0-9]+", "_")
      .replaceAll("_+", "_")
      .stripPrefix("_").stripSuffix("_")
    if (cleaned.isEmpty) "_" else if (cleaned.head.isDigit) "_" + cleaned else cleaned
  }

  /** Normalize all column names to snake_case; collisions raise
    * (`tables.py:700-744`, `_resolve_collisions` `tables.py:1981-2005`).
    */
  def underscore(df: DataFrame): DataFrame = {
    val names = df.columns.map(underscoreName)
    val dups = names.groupBy(identity).filter(_._2.length > 1).keys
    require(dups.isEmpty, s"name collision after underscore: ${dups.mkString(", ")}")
    df.toDF(names.toIndexedSeq: _*)
  }

  /** `format` = underscore + primary-key uniqueness check + stable sort
    * (`tables.py:746-817` with verify_integrity; the uniqueness assert is
    * the Spark version of the pandas MultiIndex unique check).
    */
  def format(df: DataFrame, primaryKey: Seq[String], verifyIntegrity: Boolean = true): DataFrame = {
    val u = underscore(df)
    if (verifyIntegrity) {
      val dups = u.groupBy(primaryKey.map(col): _*).count().filter(col("count") > 1).limit(1).count()
      require(dups == 0, s"primary key ${primaryKey.mkString(",")} not unique")
    }
    u.orderBy(primaryKey.map(col): _*)
  }

  /** Column subset by regex (GRAPHER_FILTER behavior, `tables.py:849-850`). */
  def filterColumns(df: DataFrame, pattern: String, keep: Seq[String] = Nil): DataFrame = {
    val re = pattern.r
    df.select(df.columns.filter(c => keep.contains(c) || re.findFirstIn(c).isDefined).map(col).toSeq: _*)
  }

  /** Dict-based value mapping with strict handling of unmapped values
    * (owid-etl `map_series`, `datautils/dataframes.py:400-494`): unmapped →
    * pass-through (warnOnMissing) or null.
    */
  def mapValues(df: DataFrame, column: String, mapping: Map[String, String],
                keepUnmapped: Boolean = true): DataFrame = {
    val m = typedLit(mapping)
    val mapped = element_at(m, col(column))
    val out = if (keepUnmapped) coalesce(mapped, col(column)) else mapped
    val relogged = MetaOps.relog(df, df.withColumn(column, out), column, "map_values")
    // rename_categories semantics for an ORDINAL column: the category
    // order is label metadata, so renaming the labels must rename the
    // order too (reference: pandas rename_categories keeps the
    // CategoricalDtype order under the new names)
    MetaOps.varMeta(df, column).filter(_.sortOrder.nonEmpty) match {
      case Some(meta) =>
        val renamed = meta.sortOrder.map(l =>
          mapping.getOrElse(l, if (keepUnmapped) l else null))
          .filter(_ != null).distinct
        val cur = MetaOps.varMeta(relogged, column).getOrElse(meta)
        MetaOps.withVarMeta(relogged, column, cur.copy(sortOrder = renamed))
      case None => relogged
    }
  }

  /** Fill nulls of `column` in `df` from the same column of `other`
    * (table-valued fillna, `tables.py:1033-1049`): left join on keys +
    * coalesce.
    */
  def fillFrom(df: DataFrame, other: DataFrame, keys: Seq[String], columns: Seq[String]): DataFrame = {
    val o = other.select((keys ++ columns).map(c => col(c)).toSeq: _*)
      .withColumnsRenamed(columns.map(c => c -> s"__fill_$c").toMap)
    val joined = df.join(o, keys, "left")
    columns.foldLeft(joined) { (d, c) =>
      MetaOps.relog(df, d.withColumn(c, coalesce(col(c), col(s"__fill_$c"))), c, "fill_from")
    }.drop(columns.map(c => s"__fill_$c"): _*)
  }

  /** Assertion helpers (owid-etl `check_known_columns` /
    * `check_values_in_column`, `misc.py:29-58`).
    */
  def checkKnownColumns(df: DataFrame, known: Seq[String]): Unit = {
    val unknown = df.columns.toSet -- known.toSet
    require(unknown.isEmpty, s"unknown columns: ${unknown.mkString(", ")}")
  }

  def checkValuesInColumn(df: DataFrame, column: String, allowed: Seq[Any]): Unit = {
    val bad = df.select(column).distinct()
      .filter(!col(column).isin(allowed: _*)).limit(20).collect()
    require(bad.isEmpty, s"unexpected values in $column: ${bad.mkString(", ")}")
  }

  // ---------- §2.3 joins ----------

  /** Metadata-combining merge (owid-etl `tables.py:1300-1401`): plain Spark
    * join; shared non-key columns get suffixes like pandas.
    */
  def merge(left: DataFrame, right: DataFrame, on: Seq[String], how: String = "inner",
            suffixes: (String, String) = ("_x", "_y")): DataFrame = {
    val shared = (left.columns.toSet & right.columns.toSet) -- on.toSet
    val l = shared.foldLeft(left)((d, c) => d.withColumnRenamed(c, c + suffixes._1))
    val r = shared.foldLeft(right)((d, c) => d.withColumnRenamed(c, c + suffixes._2))
    val joined = l.join(r, on, how)
    // processing log: every metadata-carrying column records the merge as a
    // typed entry with its pre-merge identity as parent (suffixed columns
    // point back at their unsuffixed source), so downstream ops can
    // reconstruct each output column's ancestry across the join.
    val originalName = (shared.map(c => (c + suffixes._1) -> c) ++
      shared.map(c => (c + suffixes._2) -> c)).toMap
    joined.columns.filterNot(on.contains).foldLeft(joined) { (d, c) =>
      MetaOps.varMeta(d, c) match {
        case Some(m) =>
          val src = originalName.getOrElse(c, c)
          MetaOps.withVarMeta(d, c, m.logOp(c, "merge", List(m.parentRef(src))))
        case None => d
      }
    }
  }

  /** Fold-left merge of N tables on common keys (`tables.py:2008-2028`). */
  def multiMerge(tables: Seq[DataFrame], on: Seq[String], how: String = "inner"): DataFrame =
    tables.reduce((a, b) => merge(a, b, on, how))

  /** Priority coalesce join — df1 wins, df2 fills the gaps (owid-etl
    * `combine_two_overlapping_dataframes`, `dataframes.py:578-654`):
    * full-outer join on keys + per-column coalesce. The closest reference
    * analogue to upsert-as-a-transform.
    */
  def combineTwoOverlapping(df1: DataFrame, df2: DataFrame, keys: Seq[String]): DataFrame = {
    val valueCols = (df1.columns ++ df2.columns).distinct.filterNot(keys.contains)
    val a = df1.withColumnsRenamed(df1.columns.filterNot(keys.contains).map(c => c -> s"__a_$c").toMap)
    val b = df2.withColumnsRenamed(df2.columns.filterNot(keys.contains).map(c => c -> s"__b_$c").toMap)
    val j = a.join(b, keys, "full_outer")
    val cols = keys.map(col) ++ valueCols.map { c =>
      val hasA = df1.columns.contains(c)
      val hasB = df2.columns.contains(c)
      (if (hasA && hasB) coalesce(col(s"__a_$c"), col(s"__b_$c"))
       else if (hasA) col(s"__a_$c") else col(s"__b_$c")).as(c)
    }
    j.select(cols.toSeq: _*)
  }

  /** Broadcast lookup join to a dimension table, appending new dim rows for
    * unseen keys (owid-etl entity creation under the upsert,
    * `etl/grapher_helpers.py:320-399`): returns (factWithIds, updatedDim).
    * `dim` must have columns (naturalKey, idCol).
    */
  def lookupOrCreate(fact: DataFrame, dim: DataFrame, naturalKey: String,
                     idCol: String): (DataFrame, DataFrame) = {
    val maxId = dim.agg(coalesce(max(col(idCol)), lit(0L)).cast("long")).collect()(0).getLong(0)
    val missing = fact.select(col(naturalKey)).distinct()
      .join(dim.select(col(naturalKey)), Seq(naturalKey), "left_anti")
      .withColumn(idCol, row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col(naturalKey))).cast("long") + lit(maxId))
    val dim2 = dim.select(col(naturalKey), col(idCol).cast("long")).unionByName(missing)
    (fact.join(broadcast(dim2), Seq(naturalKey), "left"), dim2)
  }

  // ---------- §2.6 / §2.7 sorts & set ops ----------

  /** Union-by-name with missing columns allowed, like metadata-combining
    * concat axis=0 (`tables.py:1404-1475`): per-column VariableMeta is
    * COMBINED across inputs (unit/title/type/sortOrder kept iff all
    * agree, origins unioned) — unionByName alone would silently keep
    * only the first table's metadata.
    */
  def concat(tables: Seq[DataFrame]): DataFrame = {
    val out = tables.reduce(_.unionByName(_, allowMissingColumns = true))
    val metas = tables.flatMap(t => t.schema.fields.flatMap(f =>
      VariableMeta.fromSpark(f.metadata).map(f.name -> _)))
      .groupBy(_._1).view.mapValues(_.map(_._2).reduce(VariableMeta.combineFields)).toMap
    metas.foldLeft(out) { case (d, (c, m)) => MetaOps.withVarMeta(d, c, m) }
  }

  /** Column-wise stitch on keys; duplicate value columns are an error
    * (concat axis=1, `tables.py:1448-1458`).
    */
  def concatColumns(a: DataFrame, b: DataFrame, keys: Seq[String]): DataFrame = {
    val dup = (a.columns.toSet & b.columns.toSet) -- keys.toSet
    require(dup.isEmpty, s"duplicate columns in concat axis=1: ${dup.mkString(", ")}")
    a.join(b, keys, "full_outer")
  }

  /** Deterministic hash split (train/val/test carve-out): assign each row
    * a split label from the PORTABLE hash of its key + salt — stable
    * across runs, engines and cluster sizes (md5-low-60, the same
    * cross-engine hash the checksum/simhash oracles use), so a re-run
    * never migrates a row between train and test. `splits` are
    * (label, percent) in order, summing to 100. Pure codegen'd
    * projection — no shuffle, no sampling nondeterminism.
    */
  def hashSplit(df: DataFrame, keyCol: String, splits: Seq[(String, Int)],
                salt: String = "split", outCol: String = "split"): DataFrame = {
    require(splits.nonEmpty && splits.map(_._2).sum == 100,
      s"split percents must sum to 100 (got ${splits.map(_._2).sum})")
    require(splits.forall(_._2 > 0), "split percents must be positive")
    val bucket = TextOps.md5Hash60(org.apache.spark.sql.functions.concat(col(keyCol).cast("string"), lit(":" + salt))) % 100
    val cumThresholds = splits.scanLeft(0)(_ + _._2).tail
    val expr = splits.zip(cumThresholds).tail.foldLeft(
      when(bucket < splits.head._2, splits.head._1)) {
      case (acc, ((label, _), cum)) => acc.when(bucket < cum, label)
    }
    df.withColumn(outCol, expr)
  }

  /** 2^60 — the md5-low-60 hash space; rate thresholds are pre-scaled into
    * it so mixture sampling is an INTEGER compare (no float division to
    * disagree across engines).
    */
  val HashSpace: Long = 1L << 60

  /** Pre-scaled integer threshold for a sampling rate in the md5-low-60
    * space — exposed so a cross-engine oracle can inline the exact
    * literal.
    */
  def rateThreshold(rate: Double): Long = {
    require(rate >= 0.0 && rate <= 1.0, s"rate out of [0,1]: $rate")
    math.min(HashSpace, (rate * HashSpace).toLong)
  }

  /** Deterministic per-stratum subsampling — the training-MIX composition
    * step (e.g. keep 30% of English, all of the tail languages). A row
    * survives iff its portable md5-low-60 key hash falls under its
    * stratum's pre-scaled integer threshold: stable across runs, engines
    * and cluster sizes, and UNIFORM within each stratum. Pure codegen'd
    * filter — no shuffle, no RNG.
    *
    * @param rates (stratum value, keep rate in [0,1]); strata not listed
    *              use `defaultRate`
    */
  def sampleMixture(df: DataFrame, keyCol: String, stratumCol: String,
                    rates: Seq[(String, Double)], defaultRate: Double,
                    salt: String = "mix"): DataFrame = {
    val b = TextOps.md5Hash60(
      org.apache.spark.sql.functions.concat(col(keyCol).cast("string"), lit(":" + salt)))
    val thresh = rates.foldLeft(lit(rateThreshold(defaultRate))) {
      case (acc, (k, r)) => when(col(stratumCol) === k, lit(rateThreshold(r))).otherwise(acc)
    }
    df.filter(b < thresh)
  }
}
