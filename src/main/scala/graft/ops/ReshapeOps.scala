package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Reshaping operators — the reference's signature ops (SURVEY.md §2.9). */
object ReshapeOps {

  /** Wide→long (owid-etl `melt`, `tables.py:1478-1537`) via Spark's native
    * unpivot (Spark 3.4+) — one narrow codegen'd pass, no shuffle.
    */
  def melt(df: DataFrame, idVars: Seq[String], valueVars: Seq[String],
           varName: String = "variable", valueName: String = "value"): DataFrame = {
    val out = df.unpivot(idVars.map(col).toArray, valueVars.map(col).toArray, varName, valueName)
    // processing log: the value column's parents are ALL melted source
    // columns (their last targets); field metadata combines pairwise
    // (unit kept iff identical across sources, origins unioned).
    val metas = valueVars.flatMap(v => MetaOps.varMeta(df, v).map(v -> _))
    if (metas.isEmpty) out
    else {
      val parents = metas.map { case (n, m) => m.parentRef(n) }.toList
      val combined = metas.map(_._2).reduce(VariableMeta.combineFields)
      MetaOps.withVarMeta(out, valueName, combined.logOp(valueName, "melt", parents))
    }
  }

  /** Long→wide (owid-etl `pivot`, `tables.py:1553-1620`):
    * groupBy(index).pivot(column).agg(first(value)). Callers pass explicit
    * `values` when known — skips the extra distinct job Spark otherwise
    * runs to discover pivot values (matters at scale).
    */
  def pivot(df: DataFrame, index: Seq[String], column: String, value: String,
            values: Seq[String] = Nil): DataFrame = {
    val g = df.groupBy(index.map(col): _*)
    val p = if (values.nonEmpty) g.pivot(column, values) else g.pivot(column)
    val wide = p.agg(first(col(value)))
    // the value column's metadata (incl. an ordinal's varType/sortOrder)
    // travels to every generated column — melt→pivot round-trips keep the
    // axis order intact (reference: pivot keeps variable metadata)
    MetaOps.varMeta(df, value) match {
      case None => wide
      case Some(m) => wide.columns.filterNot(index.contains)
        .foldLeft(wide)((acc, c) => MetaOps.withVarMeta(acc, c, m))
    }
  }

  /** Max generated column name length (the reference trims grapher
    * short_names past MySQL's 255-char identifier limit,
    * `etl/grapher_io.py:987`; parquet/metastore identifiers hit similar
    * walls). Names over the limit keep a readable prefix and append a
    * 12-hex md5 of the FULL name, so trimmed names stay deterministic,
    * collision-resistant, and stable across runs.
    */
  val MaxNameLen = 255
  private val NamePrefixLen = MaxNameLen - 13 // "_" + 12 hex

  /** Column-expression form of the trim — runs inside the fan-out plan
    * (names are generated per-row; a driver-side trim would need a
    * collect).
    */
  def trimLongNameExpr(name: Column): Column =
    when(length(name) > MaxNameLen,
      concat(substring(name, 1, NamePrefixLen), lit("_"),
        substring(md5(name), 1, 12))).otherwise(name)

  /** Driver-side twin of [[trimLongNameExpr]] — MUST produce identical
    * output (used where names are already driver strings, e.g.
    * [[longToWideTables]]). Lengths and the prefix cut are measured in
    * CODE POINTS, matching Spark's `length`/`substring` on UTF8String —
    * `String.length`/`substring` count UTF-16 units and would cut a
    * different prefix on names containing supplementary-plane characters.
    */
  def trimLongName(name: String): String =
    if (name.codePointCount(0, name.length) <= MaxNameLen) name
    else {
      val digest = java.security.MessageDigest.getInstance("MD5")
        .digest(name.getBytes("UTF-8")).map("%02x".format(_)).mkString
      name.substring(0, name.offsetByCodePoints(0, NamePrefixLen)) + "_" + digest.take(12)
    }

  // ---- per-dimension metadata expansion -----------------------------
  // The reference expands each fan-out slice's variable metadata per
  // dimension combination (`etl/grapher_helpers.py:146-264`): fields with
  // `<<dim>>` placeholders are template-substituted; a plain title gets
  // the default "Title - Age: 10-18 - Sex: male" composition. Of jinja,
  // the bounded `<% if dim == "v" %>…<% else %>…<% endif %>` subset is
  // evaluated ([[evalControlBlocks]]); anything beyond it is REJECTED
  // loudly — a raw template leaking into published metadata is worse
  // than an error.

  private val PlaceholderRe =
    "<<\\s*([A-Za-z0-9_]+)\\s*((?:\\|\\s*[A-Za-z_]+(?:\\([^)]*\\))?\\s*)*)>>".r
  private val FilterRe = "\\|\\s*([A-Za-z_]+)(?:\\(([^)]*)\\))?".r
  private val FilterArgRe = "\"([^\"]*)\"|'([^']*)'".r
  private val IfRe =
    "<%\\s*if\\s+([A-Za-z0-9_]+)\\s*(==|!=)\\s*(?:\"([^\"]*)\"|'([^']*)')\\s*%>".r
  private val ElseRe = "<%\\s*else\\s*%>".r
  private val EndifRe = "<%\\s*endif\\s*%>".r
  private val ForRe =
    "<%\\s*for\\s+([A-Za-z0-9_]+)\\s+in\\s+([A-Za-z0-9_]+)\\s*%>".r
  private val EndforRe = "<%\\s*endfor\\s*%>".r

  def usesTemplate(s: String): Boolean =
    s.contains("<<") || s.contains("<%") || s.contains("<#")

  /** Strip `<# … #>` comment blocks — the comment delimiters the
    * reference's jinja environment configures (`grapher_helpers.py:26-34`).
    * Stripped FIRST, so a commented-out control tag is gone before the
    * control scan (jinja semantics). Unterminated comments are loud.
    */
  private def stripComments(text: String): String = {
    if (!text.contains("<#")) return text
    val sb = new StringBuilder
    var rest = text
    while (rest.contains("<#")) {
      val at = rest.indexOf("<#")
      sb.append(rest.substring(0, at))
      val end = rest.indexOf("#>", at + 2)
      require(end >= 0, s"unterminated comment '<#' in template '$text'")
      rest = rest.substring(end + 2)
    }
    sb.append(rest)
    sb.toString
  }

  /** Apply a `| filter | filter(args)` chain — the small jinja filter set
    * metadata templates actually use. `value` is None for an UNDEFINED
    * placeholder, which only `default(...)` may resolve; any other filter
    * on an undefined name stays loud. Unknown filters are rejected by
    * name — a raw filter leaking into published metadata is worse than an
    * error.
    */
  private def applyFilters(value: Option[String], chain: String,
                           name: String, template: String): String = {
    var v = value
    for (m <- FilterRe.findAllMatchIn(chain)) {
      val fn = m.group(1)
      val args = Option(m.group(2)).toSeq.flatMap(raw =>
        FilterArgRe.findAllMatchIn(raw).map(am =>
          Option(am.group(1)).getOrElse(am.group(2))).toSeq)
      (fn, v) match {
        case ("default", None) => v = Some(args.headOption.getOrElse(""))
        case ("default", Some(_)) => () // defined: jinja keeps the value
        case (_, None) => throw new IllegalArgumentException(
          s"unknown dimension '<<$name>>' in template '$template' " +
          s"(only '| default(...)' may resolve an undefined name)")
        case ("upper", Some(x)) => v = Some(x.toUpperCase)
        case ("lower", Some(x)) => v = Some(x.toLowerCase)
        case ("capitalize", Some(x)) =>
          v = Some(x.take(1).toUpperCase + x.drop(1).toLowerCase)
        case ("title", Some(x)) =>
          v = Some(x.split(" ", -1).map(w =>
            w.take(1).toUpperCase + w.drop(1).toLowerCase).mkString(" "))
        case ("trim", Some(x)) => v = Some(x.trim)
        case ("replace", Some(x)) =>
          require(args.size == 2,
            s"'| replace' takes two quoted arguments in template '$template'")
          v = Some(x.replace(args(0), args(1)))
        case (other, Some(_)) => throw new IllegalArgumentException(
          s"unsupported template filter '| $other' in template '$template' " +
          "(supported: default, upper, lower, capitalize, title, trim, replace)")
      }
    }
    v.getOrElse(throw new IllegalArgumentException(
      s"unknown dimension '<<$name>>' in template '$template'"))
  }

  /** Evaluate the BOUNDED control subset — the conditionals and loops of
    * the reference's `_expand_jinja` (`etl/grapher_helpers.py:194-232`)
    * without shipping a template engine:
    *
    *   - `<% if dim == "value" %>…[<% else %>…]<% endif %>` (also `!=`)
    *   - `<% for v in <dim>_values %>…<<v>>…<% endfor %>` over the
    *     dimension's OBSERVED values (`lists`), the loop body rendered
    *     once per value with `<<v>>` bound (with exactly one dimension,
    *     plain `values` also resolves)
    *
    * Sequential blocks are allowed; everything else — nesting, filters,
    * an unknown dimension or iterable, a loop variable shadowing a
    * dimension — is rejected LOUDLY: a raw control tag leaking into
    * published metadata is worse than an error.
    */
  private[ops] def evalControlBlocks(text: String, dims: Map[String, String],
                                     lists: Map[String, Seq[String]] = Map.empty): String = {
    val sb = new StringBuilder
    var rest = text
    while (rest.contains("<%")) {
      val at = rest.indexOf("<%")
      sb.append(rest.substring(0, at))
      val tail = rest.substring(at)
      (IfRe.findPrefixMatchOf(tail), ForRe.findPrefixMatchOf(tail)) match {
        case (Some(m), _) =>
          val dim = m.group(1)
          val value = Option(m.group(3)).getOrElse(m.group(4))
          val have = dims.getOrElse(dim, throw new IllegalArgumentException(
            s"unknown dimension '$dim' in template condition '${m.matched}'; " +
            s"have: ${dims.keys.toSeq.sorted.mkString(", ")}"))
          val afterIf = tail.substring(m.end)
          val endif = EndifRe.findFirstMatchIn(afterIf).getOrElse(
            throw new IllegalArgumentException(s"missing <% endif %> in template '$text'"))
          val inner = afterIf.substring(0, endif.start)
          val (thenB, elseB) = ElseRe.findFirstMatchIn(inner) match {
            case Some(e) => (inner.substring(0, e.start), inner.substring(e.end))
            case None => (inner, "")
          }
          // the single else tag is consumed above; ANY other tag inside a
          // branch (nested if/for, a second else, a stray endfor) is loud
          if (thenB.contains("<%") || elseB.contains("<%"))
            throw new IllegalArgumentException(
              s"nested template control blocks are not supported: '$text'")
          val cond = if (m.group(2) == "==") have == value else have != value
          sb.append(if (cond) thenB else elseB)
          rest = afterIf.substring(endif.end)
        case (None, Some(m)) =>
          val loopVar = m.group(1)
          val iterable = m.group(2)
          require(!dims.contains(loopVar),
            s"loop variable '$loopVar' shadows a dimension in template '$text'")
          val vals = lists.getOrElse(iterable, throw new IllegalArgumentException(
            s"unknown iterable '$iterable' in template loop '${m.matched}'; " +
            s"have: ${lists.keys.toSeq.sorted.mkString(", ")}"))
          val afterFor = tail.substring(m.end)
          val endfor = EndforRe.findFirstMatchIn(afterFor).getOrElse(
            throw new IllegalArgumentException(s"missing <% endfor %> in template '$text'"))
          val inner = afterFor.substring(0, endfor.start)
          if (inner.contains("<%")) throw new IllegalArgumentException(
            s"nested template control blocks are not supported: '$text'")
          // bind ONLY the loop variable per iteration; other placeholders
          // stay for the later <<dim>> pass
          val varRe = ("<<\\s*" + java.util.regex.Pattern.quote(loopVar) +
            "\\s*((?:\\|\\s*[A-Za-z_]+(?:\\([^)]*\\))?\\s*)*)>>").r
          vals.foreach(v =>
            sb.append(varRe.replaceAllIn(inner, mm =>
              java.util.regex.Matcher.quoteReplacement(
                applyFilters(Some(v), Option(mm.group(1)).getOrElse(""), loopVar, text)))))
          rest = afterFor.substring(endfor.end)
        case (None, None) => throw new IllegalArgumentException(
          "unsupported template control block (supported subset: " +
          "<% if dim == \"value\" %>…<% else %>…<% endif %>, " +
          "<% for v in <dim>_values %>…<% endfor %>): " +
          s"'${tail.take(48)}' in template '$text'")
      }
    }
    sb.append(rest)
    val out = sb.toString
    // a tag smuggled inside a branch body bypasses the scan above — it
    // must still never reach published metadata
    require(!out.contains("<%"),
      s"unsupported template control block survived expansion: '$out'")
    out
  }

  /** Expand a template: bounded `<% if %>`/`<% for %>` control blocks
    * first, then `<<dim>>` substitution; unknown placeholders fail loudly.
    */
  def expandTemplate(text: String, dims: Map[String, String],
                     lists: Map[String, Seq[String]] = Map.empty): String = {
    val resolved = evalControlBlocks(stripComments(text), dims, lists)
    PlaceholderRe.replaceAllIn(resolved, m => {
      val k = m.group(1)
      val chain = Option(m.group(2)).getOrElse("")
      val base = dims.get(k)
      if (base.isEmpty && !chain.contains("default"))
        throw new IllegalArgumentException(
          s"unknown dimension '<<$k>>' in template '$text'; " +
          s"have: ${dims.keys.toSeq.sorted.mkString(", ")}")
      java.util.regex.Matcher.quoteReplacement(applyFilters(base, chain, k, text))
    })
  }

  /** Default title composition (`_title_column_and_dimensions`,
    * `grapher_helpers.py:236-241`): `Deaths` × (age→10-18, sex→male) →
    * `Deaths - Age: 10-18 - Sex: male`.
    */
  def titleWithDims(title: String, dims: Seq[(String, String)]): String =
    (title +: dims.map { case (n, v) => s"${n.replace('_', ' ').capitalize}: $v" })
      .mkString(" - ")

  /** Expand one slice's metadata for its dimension combination, recording
    * the expansion in the processing log.
    */
  def expandDimensionMeta(meta: VariableMeta, variable: String,
                          dims: Seq[(String, String)],
                          observed: Map[String, Seq[String]] = Map.empty): VariableMeta = {
    val dmap = dims.toMap
    // loop iterables: each dimension's observed value list as
    // `<dim>_values`; with exactly ONE dimension, plain `values` too
    val lists = observed.map { case (d, vs) => s"${d}_values" -> vs } ++
      (if (observed.size == 1) Map("values" -> observed.head._2) else Map.empty)
    def exp(o: Option[String]) = o.map(t => if (usesTemplate(t)) expandTemplate(t, dmap, lists) else t)
    val title = meta.title.map(t =>
      if (usesTemplate(t)) expandTemplate(t, dmap, lists) else titleWithDims(t, dims))
    meta.copy(title = title, unit = exp(meta.unit), shortUnit = exp(meta.shortUnit),
        description = exp(meta.description))
      .logOp(variable, "expand_dims", List(meta.parentRef(variable)),
        comment = Some(dims.map { case (n, v) => s"$n=$v" }.mkString(",")))
  }

  /** Dimension fan-out (owid-etl `_yield_wide_table`,
    * `etl/grapher_helpers.py:74-191`): every combination of dimension
    * values becomes its own column named `col__dim1_v1__dim2_v2`. In Spark
    * this is a pivot on the concatenated dimension key; all-null slices are
    * dropped like the reference, names past [[MaxNameLen]] are
    * hash-trimmed like the reference's short_name trim, and — when the
    * value column carries [[VariableMeta]] — each generated column gets
    * its metadata expanded per dimension combination.
    */
  def wideTableFanOut(df: DataFrame, index: Seq[String], dims: Seq[String],
                      valueCol: String): DataFrame = {
    val nameExpr = trimLongNameExpr(concat_ws("__",
      (lit(valueCol) +: dims.map(d => concat_ws("_", lit(TableOps.underscoreName(d)),
        col(d).cast("string")))): _*))
    // persisted across the operator's internal jobs: the combos distinct,
    // and the pivot aggregation both read it (without the cache each one
    // re-evaluates the source plan + the md5 trim from scratch)
    val long = df.withColumn("__wide_name", nameExpr)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // ONE distinct job yields both the explicit pivot value list (no
      // separate discovery job inside pivot) and the name → dimension
      // combo mapping for metadata expansion; bounded by the pivot width,
      // never corpus-sized
      val combos = long
        .select((col("__wide_name") +: dims.map(d => col(d).cast("string"))): _*)
        .distinct().collect()
      val names = combos.map(_.getString(0)).distinct.sorted.toSeq
      val wide = pivot(long, index, "__wide_name", valueCol, names)
      // drop all-null slices (reference drops empty dimension combos) —
      // one aggregation job for all columns, not one job per column
      val valueColumns = wide.columns.filterNot(index.contains)
      val counts = wide.select(valueColumns.map(c => count(col(s"`$c`")).as(c)).toSeq: _*).collect()(0)
      val keep = valueColumns.zipWithIndex.collect { case (c, i) if counts.getLong(i) > 0 => c }
      val pruned = wide.select((index ++ keep).map(c => col(s"`$c`")).toSeq: _*)
      MetaOps.varMeta(df, valueCol) match {
        case None => pruned
        case Some(m) =>
          // per-dimension OBSERVED value lists (sorted, nulls out) — the
          // iterables a `<% for v in <dim>_values %>` template loops over;
          // derived from the SAME combos pass, no extra job
          val observed = dims.zipWithIndex.map { case (d, i) =>
            d -> combos.flatMap(r => Option(r.getString(i + 1))).distinct.sorted.toSeq
          }.toMap
          combos.filter(r => keep.contains(r.getString(0))).foldLeft(pruned) { (acc, r) =>
            val name = r.getString(0)
            // a NULL dimension value was skipped by concat_ws in the NAME;
            // skip it in the metadata too so name and recorded dims agree
            // (and so templates referencing it fail loudly as unknown)
            val dimVals = dims.zipWithIndex.flatMap { case (d, i) =>
              Option(r.getString(i + 1)).map(d -> _) }
            MetaOps.withVarMeta(acc, name, expandDimensionMeta(m, name, dimVals, observed))
          }
      }
    } finally long.unpersist()
  }

  /** Split a long (variable, value) table into per-variable tables
    * (owid-etl `long_to_wide_tables`, `grapher_helpers.py:284-317`).
    */
  def longToWideTables(df: DataFrame, index: Seq[String], varCol: String,
                       valueCol: String): Map[String, DataFrame] = {
    val vars = df.select(varCol).distinct().collect().map(_.getString(0))
    vars.map { v =>
      v -> df.filter(col(varCol) === v)
        .select((index.map(col) :+
          col(valueCol).as(trimLongName(TableOps.underscoreName(v)))): _*)
    }.toMap
  }

  /** Dynamic-partition write of the dimension fan-out — the at-scale form
    * of `_yield_wide_table`: one directory per dimension combination,
    * written in a single job (`df.write.partitionBy(dims)`).
    */
  def writePartitionedByDims(df: DataFrame, dims: Seq[String], outDir: String): Unit =
    df.write.mode("overwrite").partitionBy(dims: _*).parquet(outDir)
}
