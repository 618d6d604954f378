package graft

import org.apache.spark.sql.functions._
import graft.ops._

/** Per-operator semantics tests on small hand-built frames — mirrors the
  * reference's data-model unit tests (lib/catalog/tests/test_tables.py).
  */
class OpsSpec extends SparkSpec {
  import spark.implicits._

  test("underscore normalizes names and detects collisions") {
    assert(TableOps.underscoreName("CamelCase Name") == "camel_case_name")
    assert(TableOps.underscoreName("GDP (current US$)") == "gdp_current_us")
    assert(TableOps.underscoreName("9years") == "_9years")
    val df = Seq((1, 2)).toDF("My Col", "my-col")
    intercept[IllegalArgumentException](TableOps.underscore(df))
  }

  test("format verifies primary-key uniqueness") {
    val ok = Seq(("a", 1, "x"), ("a", 2, "y")).toDF("k1", "k2", "v")
    TableOps.format(ok, Seq("k1", "k2"))
    val dup = Seq(("a", 1, "x"), ("a", 1, "y")).toDF("k1", "k2", "v")
    intercept[IllegalArgumentException](TableOps.format(dup, Seq("k1", "k2")))
  }

  test("combineTwoOverlapping: df1 wins, df2 fills") {
    val a = Seq(("k1", Some(1.0)), ("k2", None)).toDF("k", "v")
    val b = Seq(("k2", 20.0), ("k3", 30.0)).toDF("k", "v")
    val out = TableOps.combineTwoOverlapping(a, b, Seq("k"))
      .orderBy("k").collect().map(r => (r.getString(0), r.get(1)))
    assert(out.toSeq == Seq(("k1", 1.0), ("k2", 20.0), ("k3", 30.0)))
  }

  test("NaN-aware groupby_agg gates") {
    val df = Seq(
      ("g1", Some(1.0)), ("g1", Some(2.0)), ("g1", None),
      ("g2", Some(5.0)), ("g2", None), ("g2", None)
    ).toDF("g", "v")
    // allow at most 1 null per group → g2 (2 nulls) gated to null
    val out = AggOps.groupbyAggNanAware(df, Seq("g"), "v", "sum",
      numAllowedNulls = Some(1))
      .orderBy("g").collect()
    assert(out(0).getDouble(1) == 3.0)
    assert(out(1).isNullAt(1))
  }

  test("regionAggregates must-have gate drops incomplete regions") {
    val df = Seq(("fr", 2020, 1.0), ("de", 2020, 2.0), ("fr", 2021, 5.0))
      .toDF("entity", "year", "v")
    val memberOf = Map("fr" -> "EU", "de" -> "EU")
    val mustHave = Map("EU" -> Seq("fr", "de"))
    val out = AggOps.regionAggregates(df, "entity", Seq("year"), Seq("v"), memberOf, mustHave)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2)))
    // 2020 has both members → kept; 2021 only fr → gated out
    assert(out.toSeq == Seq(("EU", 2020, 3.0)))
  }

  test("interpolate: interior linear, edges nearest") {
    val df = Seq(
      ("e", 0, Some(10.0)), ("e", 1, None), ("e", 2, None), ("e", 3, Some(40.0)),
      ("e", 4, None)).toDF("ent", "t", "v")
    val out = TimeOps.interpolate(df, Seq("ent"), "t", "v")
      .orderBy("t").collect().map(_.getDouble(2))
    assert(out.toSeq == Seq(10.0, 20.0, 30.0, 40.0, 40.0))
  }

  test("expandTimeColumn densifies per-entity ranges") {
    val df = Seq(("a", 2000, 1.0), ("a", 2003, 2.0), ("b", 2010, 3.0))
      .toDF("ent", "year", "v")
    val out = TimeOps.expandTimeColumn(df, Seq("ent"), "year")
    assert(out.count() == 5) // a: 2000..2003 (4), b: 2010 (1)
    assert(out.filter(col("v").isNull).count() == 2)
  }

  test("melt/pivot round-trip") {
    val df = Seq((1, 10.0, 100.0), (2, 20.0, 200.0)).toDF("id", "a", "b")
    val long = ReshapeOps.melt(df, Seq("id"), Seq("a", "b"))
    assert(long.count() == 4)
    val wide = ReshapeOps.pivot(long, Seq("id"), "variable", "value", Seq("a", "b"))
      .orderBy("id").collect()
    assert(wide(0).getDouble(1) == 10.0 && wide(1).getDouble(2) == 200.0)
  }

  test("wideTableFanOut mangles dimension combos into columns") {
    val df = Seq(("US", 2000, "m", 1.0), ("US", 2000, "f", 2.0), ("FR", 2001, "m", 3.0))
      .toDF("country", "year", "sex", "v")
    val out = ReshapeOps.wideTableFanOut(df, Seq("country", "year"), Seq("sex"), "v")
    assert(out.columns.toSet == Set("country", "year", "v__sex_m", "v__sex_f"))
    val us = out.filter(col("country") === "US").collect()(0)
    assert(us.getAs[Double]("v__sex_m") == 1.0 && us.getAs[Double]("v__sex_f") == 2.0)
  }

  test("fan-out expands per-dimension metadata: <<dim>> templates substitute, plain titles get the default composition, control blocks fail loudly") {
    // "1.5" exercises dotted generated names (metadata attach must not
    // parse them as struct paths); the null age_group row exercises
    // null-dim handling (skipped in name AND metadata, consistently)
    val df = MetaOps.withVarMeta(
      Seq(("US", 2000, "10-18", "m", 1.0), ("US", 2000, "19-25", "f", 2.0),
          ("US", 2000, "1.5", "m", 3.0), ("FR", 2001, null, "f", 4.0))
        .toDF("country", "year", "age_group", "sex", "v"),
      "v", VariableMeta(title = Some("Deaths"),
        unit = Some("deaths"), origins = List("o1")))
    val out = ReshapeOps.wideTableFanOut(df, Seq("country", "year"),
      Seq("age_group", "sex"), "v")
    val m1 = MetaOps.varMeta(out, "v__age_group_10-18__sex_m").get
    assert(m1.title.contains("Deaths - Age group: 10-18 - Sex: m")) // default composition
    assert(m1.origins == List("o1"))
    assert(m1.processing.last.operation == "expand_dims")
    val mDot = MetaOps.varMeta(out, "v__age_group_1.5__sex_m").get
    assert(mDot.title.contains("Deaths - Age group: 1.5 - Sex: m"))
    // null dim: skipped by concat_ws in the name, skipped in the title too
    val mNull = MetaOps.varMeta(out, "v__age_group__sex_f").get
    assert(mNull.title.contains("Deaths - Sex: f"), mNull.title)
    // templated fields substitute per combo
    val df2 = MetaOps.withVarMeta(
      Seq(("US", "m", 1.0), ("US", "f", 2.0)).toDF("country", "sex", "v"),
      "v", VariableMeta(title = Some("Deaths"), unit = Some("deaths (<<sex>>)")))
    val out2 = ReshapeOps.wideTableFanOut(df2, Seq("country"), Seq("sex"), "v")
    assert(MetaOps.varMeta(out2, "v__sex_m").get.unit.contains("deaths (m)"))
    assert(MetaOps.varMeta(out2, "v__sex_f").get.unit.contains("deaths (f)"))
    // templated title: substitution replaces the default composition
    assert(ReshapeOps.expandDimensionMeta(
      VariableMeta(title = Some("Deaths of <<sex>>")), "x", Seq("sex" -> "m"))
      .title.contains("Deaths of m"))
    // unknown placeholder and control blocks fail loudly
    intercept[IllegalArgumentException](
      ReshapeOps.expandTemplate("x <<nope>>", Map("sex" -> "m")))
    intercept[IllegalArgumentException](
      ReshapeOps.expandTemplate("<% if a %>x<% endif %>", Map.empty))
  }

  test("fan-out names past 255 chars are hash-trimmed, deterministic, and distinct; driver and expression twins agree") {
    val longA = "a" * 300
    val longB = "a" * 299 + "b" // same 242-char prefix, different tail
    val df = Seq(("US", longA, 1.0), ("US", longB, 2.0), ("FR", "m", 3.0))
      .toDF("country", "grp", "v")
    val out = ReshapeOps.wideTableFanOut(df, Seq("country"), Seq("grp"), "v")
    val generated = out.columns.filterNot(_ == "country")
    assert(generated.length == 3)
    assert(generated.forall(_.length <= ReshapeOps.MaxNameLen))
    assert(generated.distinct.length == 3) // hash suffix keeps shared-prefix names apart
    assert(generated.contains("v__grp_m")) // short names untouched
    // driver-side twin reproduces the expression's output exactly
    val expectTrimmed = Set(s"v__grp_$longA", s"v__grp_$longB").map(ReshapeOps.trimLongName)
    assert(generated.filter(_.length == ReshapeOps.MaxNameLen).toSet == expectTrimmed)
    assert(ReshapeOps.trimLongName("short") == "short")
    // twins agree on supplementary-plane characters too (Spark counts code
    // points; a UTF-16-unit cut would slice a different prefix)
    val astral = "😀" * 200 // 200 code points, 400 UTF-16 units
    val exprOut = Seq(astral).toDF("n")
      .select(ReshapeOps.trimLongNameExpr(col("n"))).collect()(0).getString(0)
    assert(exprOut == astral) // 200 code points <= 255: untouched
    assert(ReshapeOps.trimLongName(astral) == astral)
    val astralLong = "😀" * 300
    val exprLong = Seq(astralLong).toDF("n")
      .select(ReshapeOps.trimLongNameExpr(col("n"))).collect()(0).getString(0)
    assert(ReshapeOps.trimLongName(astralLong) == exprLong)
  }

  test("metadata: travels through ops, combines on arithmetic") {
    val df = Seq((1.0, 2.0)).toDF("a", "b")
    val withMeta = MetaOps.withVarMeta(
      MetaOps.withVarMeta(df, "a", VariableMeta(title = Some("A"), unit = Some("t"), origins = List("o1"))),
      "b", VariableMeta(title = Some("B"), unit = Some("t"), origins = List("o2")))
    val out = ArithOps.add(withMeta, "a", "b", "c")
    val mc = MetaOps.varMeta(out, "c").get
    assert(mc.unit.contains("t"))          // identical units kept
    assert(mc.title.isEmpty)               // differing titles dropped
    assert(mc.origins.toSet == Set("o1", "o2")) // origins unioned
    // survives select/filter
    val m2 = MetaOps.varMeta(out.filter(col("a") > 0).select("c"), "c")
    assert(m2.contains(mc))
  }

  test("keepMeta lifts plain transforms") {
    val df = MetaOps.withVarMeta(Seq((1.0, 1)).toDF("a", "k"), "a",
      VariableMeta(unit = Some("kg")))
    val out = MetaOps.keepMeta(_.groupBy("k").agg(sum("a").as("a")))(df)
    assert(MetaOps.varMeta(out, "a").get.unit.contains("kg"))
  }

  test("TableIO: sidecar round-trip + repack narrows ints") {
    val dir = tmpDir("tio")
    try {
      val df = MetaOps.withVarMeta(
        Seq((1L, 100L, "x"), (2L, 200L, "y")).toDF("big_id", "small", "s"),
        "small", VariableMeta(unit = Some("ct")))
      TableIO.writeParquet(df, s"$dir/t.parquet", TableMeta("t", primaryKey = List("big_id")))
      val (back, meta) = TableIO.readParquet(spark, s"$dir/t.parquet")
      assert(meta.get.primaryKey == List("big_id"))
      assert(MetaOps.varMeta(back, "small").get.unit.contains("ct"))
      val packed = TableIO.repack(back)
      assert(packed.schema("small").dataType == org.apache.spark.sql.types.ShortType)
      assert(packed.schema("big_id").dataType == org.apache.spark.sql.types.ByteType)
    } finally rmrf(dir)
  }

  test("repack float narrowing honors the tolerance gate") {
    val df = Seq((1.5, 1.5e39), (2.25, 9.87e40))
      .toDF("exact", "huge")
    val packed = TableIO.repack(df, floatRtol = 1e-5)
    // in-range doubles round-trip within float precision -> narrowed;
    // values beyond float range would become Infinity -> kept as double
    assert(packed.schema("exact").dataType == org.apache.spark.sql.types.FloatType)
    assert(packed.schema("huge").dataType == org.apache.spark.sql.types.DoubleType)
    assert(TableIO.repack(df, floatRtol = 0.0).schema("exact").dataType ==
      org.apache.spark.sql.types.DoubleType) // off by default
  }

  test("contentChecksum is order-invariant") {
    val df = Seq((1, "a"), (2, "b"), (3, "c")).toDF("k", "v")
    val shuffled = df.orderBy(rand(7))
    val c1 = df.agg(AggOps.contentChecksum(df, Seq("k", "v"))).collect()(0).getDecimal(0)
    val c2 = shuffled.agg(AggOps.contentChecksum(shuffled, Seq("k", "v"))).collect()(0).getDecimal(0)
    assert(c1 == c2)
  }

  test("structured processing log: melt → merge → add reconstructs each column's parent set") {
    // wide energy table with per-column metadata
    val wide = MetaOps.withVarMeta(
      MetaOps.withVarMeta(
        Seq((2000, 2.0, 3.0)).toDF("year", "coal", "gas"),
        "coal", VariableMeta(title = Some("Coal"), unit = Some("TWh"), origins = List("o_coal"))),
      "gas", VariableMeta(title = Some("Gas"), unit = Some("TWh"), origins = List("o_gas")))
    // melt: energy's parents are BOTH melted source columns
    val long = ReshapeOps.melt(wide, Seq("year"), Seq("coal", "gas"), "fuel", "energy")
    val mEnergy = MetaOps.varMeta(long, "energy").get
    val meltE = mEnergy.processing.last
    assert(meltE.operation == "melt" && meltE.variable == "energy")
    assert(meltE.parents.toSet == Set("coal", "gas"))
    assert(mEnergy.unit.contains("TWh") && mEnergy.origins.toSet == Set("o_coal", "o_gas"))
    // merge: each carried column logs the join with its pre-merge self as parent
    val pop = MetaOps.withVarMeta(Seq((2000, 10.0)).toDF("year", "pop"),
      "pop", VariableMeta(unit = Some("people"), origins = List("o_pop")))
    val merged = TableOps.merge(long, pop, Seq("year"), "inner")
    val mergeE = MetaOps.varMeta(merged, "energy").get.processing.last
    assert(mergeE.operation == "merge" && mergeE.parents == List(meltE.target))
    val mergePopE = MetaOps.varMeta(merged, "pop").get.processing.last
    assert(mergePopE.operation == "merge" && mergePopE.parents == List("pop"))
    // add: the combined column's entry points at both sides' last targets
    val added = ArithOps.add(merged, "energy", "pop", "total")
    val mTotal = MetaOps.varMeta(added, "total").get
    val addE = mTotal.processing.last
    assert(addE.operation == "+" && addE.variable == "total")
    assert(addE.parents.toSet == Set(mergeE.target, mergePopE.target))
    // full ancestry reconstruction: walking targets back from `total`
    // reaches exactly the raw source columns {coal, gas, pop}
    val byTarget = mTotal.processing.map(e => e.target -> e).toMap
    def roots(ref: String): Set[String] = byTarget.get(ref) match {
      case Some(e) => e.parents.toSet.flatMap(roots)
      case None => Set(ref)
    }
    assert(roots(addE.target) == Set("coal", "gas", "pop"))
    assert(mTotal.origins.toSet == Set("o_coal", "o_gas", "o_pop"))
  }

  test("in-place rewrites preserve metadata and log the op: map_values, fill_from, ffill, interpolate") {
    // withColumn REPLACES the field and drops schema metadata — these ops
    // must re-attach it and record a typed entry
    val df = MetaOps.withVarMeta(
      Seq(("US", 1, Some(1.0)), ("US", 2, None), ("US", 3, Some(3.0)))
        .toDF("country", "year", "v"),
      "v", VariableMeta(title = Some("V"), unit = Some("u"), origins = List("o")))
    val filled = graft.ops.TimeOps.ffill(df, Seq("country"), "year", "v")
    val mF = MetaOps.varMeta(filled, "v").get
    assert(mF.unit.contains("u") && mF.processing.last.operation == "ffill")
    val interp = graft.ops.TimeOps.interpolate(df, Seq("country"), "year", "v")
    assert(MetaOps.varMeta(interp, "v").get.processing.last.operation == "interpolate")
    val dfS = MetaOps.withVarMeta(Seq(("usa", 1)).toDF("c", "x"),
      "c", VariableMeta(title = Some("Country")))
    val mapped = TableOps.mapValues(dfS, "c", Map("usa" -> "United States"))
    val mM = MetaOps.varMeta(mapped, "c").get
    assert(mM.title.contains("Country") && mM.processing.last.operation == "map_values")
    val other = Seq(("US", 2, 2.5)).toDF("country", "year", "v")
    val fromOther = TableOps.fillFrom(df, other, Seq("country", "year"), Seq("v"))
    val mFF = MetaOps.varMeta(fromOther, "v").get
    assert(mFF.unit.contains("u") && mFF.processing.last.operation == "fill_from")
    // each entry chains: parent is the column's previous identity
    assert(mFF.processing.last.parents == List("v"))
  }

  test("ordinal metadata (varType + sortOrder) round-trips melt→pivot; sortOrdinal and rename_categories honor it") {
    val ord = VariableMeta(title = Some("Cases"), unit = Some("people"),
      varType = Some("ordinal"), sortOrder = List("low", "mid", "high"))
    var wide0 = Seq(("fr", 1.0, 2.0), ("de", 3.0, 4.0)).toDF("country", "low", "high")
    wide0 = MetaOps.withVarMeta(wide0, "low", ord)
    wide0 = MetaOps.withVarMeta(wide0, "high", ord)
    // melt: the value column carries the combined metadata — order intact
    val long = ReshapeOps.melt(wide0, Seq("country"), Seq("low", "high"), "band", "value")
    val lm = MetaOps.varMeta(long, "value").get
    assert(lm.varType.contains("ordinal") && lm.sortOrder == List("low", "mid", "high"))
    // pivot back: every generated column carries it — full round-trip
    val wide1 = ReshapeOps.pivot(long, Seq("country"), "band", "value", Seq("low", "high"))
    val wm = MetaOps.varMeta(wide1, "low").get
    assert(wm.varType.contains("ordinal") && wm.sortOrder == List("low", "mid", "high"))

    // sortOrdinal: declared order, then unknown labels, then nulls —
    // never lexicographic ("high" < "low" < "mid" would LOOK sorted)
    var cat = Seq(("mid", 1), ("high", 2), ("low", 3), ("unknown", 4),
      (null.asInstanceOf[String], 5)).toDF("band", "v")
    cat = MetaOps.withVarMeta(cat, "band", ord)
    val sorted = MetaOps.sortOrdinal(cat, "band").select("band").collect().map(_.getString(0))
    assert(sorted.toSeq == Seq("low", "mid", "high", "unknown", null), sorted.mkString(","))
    intercept[IllegalArgumentException](
      MetaOps.sortOrdinal(Seq(("x", 1)).toDF("band", "v"), "band"))

    // rename_categories: mapValues renames labels AND the category order
    val renamed = TableOps.mapValues(cat, "band", Map("low" -> "L", "mid" -> "M", "high" -> "H"))
    assert(MetaOps.varMeta(renamed, "band").get.sortOrder == List("L", "M", "H"))
    assert(MetaOps.sortOrdinal(renamed, "band").select("band").collect().map(_.getString(0)).take(3)
      .toSeq == Seq("L", "M", "H"))

    // concat: agreeing orders kept; CONFLICTING orders dropped, not picked
    val sameOrder = TableOps.concat(Seq(cat, cat))
    assert(MetaOps.varMeta(sameOrder, "band").get.sortOrder == List("low", "mid", "high"))
    var cat2 = Seq(("a", 1)).toDF("band", "v")
    cat2 = MetaOps.withVarMeta(cat2, "band", ord.copy(sortOrder = List("high", "mid", "low")))
    assert(MetaOps.varMeta(TableOps.concat(Seq(cat, cat2)), "band").get.sortOrder.isEmpty)
  }

  test("bounded jinja conditionals in dimension metadata expansion; beyond the subset is loud") {
    val m = VariableMeta(title = Some("<<age>> deaths"),
      description = Some("Deaths<% if sex == \"male\" %> among men<% else %> among others<% endif %> aged <<age>>"))
    val male = ReshapeOps.expandDimensionMeta(m, "deaths__sex_male__age_10",
      Seq("sex" -> "male", "age" -> "10"))
    assert(male.description.contains("Deaths among men aged 10"), male.description)
    val female = ReshapeOps.expandDimensionMeta(m, "deaths__sex_female__age_12",
      Seq("sex" -> "female", "age" -> "12"))
    assert(female.description.contains("Deaths among others aged 12"), female.description)
    // != and no-else forms; sequential blocks
    assert(ReshapeOps.expandTemplate("<% if sex != 'male' %>not male<% endif %>",
      Map("sex" -> "female")) == "not male")
    assert(ReshapeOps.expandTemplate(
      "<% if a == 'x' %>X<% endif %>-<% if b == 'y' %>Y<% else %>Z<% endif %>",
      Map("a" -> "x", "b" -> "n")) == "X-Z")
    // loud: unknown iterable, nesting, unknown dimension, tag smuggled in a branch
    assert(intercept[IllegalArgumentException](ReshapeOps.expandTemplate(
      "<% for x in xs %>hm<% endfor %>", Map("y" -> "1")))
      .getMessage.contains("unknown iterable"))
    assert(intercept[IllegalArgumentException](ReshapeOps.expandTemplate(
      "<% if a == 'b' %><% if c == 'd' %>x<% endif %><% endif %>",
      Map("a" -> "b", "c" -> "d")))
      .getMessage.contains("nested"))
    assert(intercept[IllegalArgumentException](ReshapeOps.expandTemplate(
      "<% if sex == 'male' %>x<% endif %>", Map("age" -> "1")))
      .getMessage.contains("unknown dimension"))
    assert(intercept[IllegalArgumentException](ReshapeOps.expandTemplate(
      "<% if a == 'b' %>keep <% endfor %> this<% endif %>", Map("a" -> "b")))
      .getMessage.contains("nested"))
  }

  test("bounded jinja for-loops over a dimension's observed values; beyond the subset is loud") {
    val lists = Map("sex_values" -> Seq("female", "male"), "age_values" -> Seq("10", "12"))
    // loop body rendered once per observed value, loop var bound per pass
    assert(ReshapeOps.expandTemplate(
      "Sexes:<% for v in sex_values %> [<<v>>]<% endfor %> of <<age>>",
      Map("sex" -> "male", "age" -> "10"), lists) == "Sexes: [female] [male] of 10")
    // sequential blocks; if + for mix at top level
    assert(ReshapeOps.expandTemplate(
      "<% if sex == 'male' %>M<% endif %><% for v in age_values %>-<<v>><% endfor %>",
      Map("sex" -> "male"), lists) == "M-10-12")
    // the golden path: a looped description through expandDimensionMeta
    val m = VariableMeta(title = Some("Deaths"),
      description = Some("Deaths at <<age>>; ages covered:<% for a in age_values %> <<a>><% endfor %>"))
    val out = ReshapeOps.expandDimensionMeta(m, "deaths__age_10",
      Seq("age" -> "10"), observed = Map("age" -> Seq("10", "12")))
    assert(out.description.contains("Deaths at 10; ages covered: 10 12"), out.description)
    // exactly one dimension: plain `values` resolves too
    val single = ReshapeOps.expandDimensionMeta(
      VariableMeta(title = Some("T"), description = Some("<% for v in values %>(<<v>>)<% endfor %>")),
      "t__age_10", Seq("age" -> "10"), observed = Map("age" -> Seq("10", "12")))
    assert(single.description.contains("(10)(12)"), single.description)
    // loud: nested loops, loop var shadowing a dim, missing endfor,
    // unresolved loop var leaking past the loop
    assert(intercept[IllegalArgumentException](ReshapeOps.expandTemplate(
      "<% for a in sex_values %><% for b in sex_values %>x<% endfor %><% endfor %>",
      Map.empty, lists)).getMessage.contains("nested"))
    assert(intercept[IllegalArgumentException](ReshapeOps.expandTemplate(
      "<% for sex in sex_values %>x<% endfor %>", Map("sex" -> "m"), lists))
      .getMessage.contains("shadows"))
    assert(intercept[IllegalArgumentException](ReshapeOps.expandTemplate(
      "<% for v in sex_values %>x", Map.empty, lists))
      .getMessage.contains("missing <% endfor %>"))
    assert(intercept[IllegalArgumentException](ReshapeOps.expandTemplate(
      "<% for v in sex_values %>x<% endfor %> then <<v>>", Map("sex" -> "m"), lists))
      .getMessage.contains("unknown dimension"))
  }

  test("jinja comments and the bounded filter set in templates; unknown filters are loud") {
    val dims = Map("sex" -> "male", "age" -> "10-18")
    // comments vanish, including commented-out control tags (stripped
    // BEFORE the control scan — jinja semantics)
    assert(ReshapeOps.expandTemplate("a<# hidden #>b", dims) == "ab")
    assert(ReshapeOps.expandTemplate(
      "<# <% if sex == 'x' %>never<% endif %> #>kept <<sex>>", dims) == "kept male")
    assert(intercept[IllegalArgumentException](ReshapeOps.expandTemplate(
      "a<# open", dims)).getMessage.contains("unterminated"))
    // the filter chain: upper/lower/capitalize/title/trim/replace compose
    assert(ReshapeOps.expandTemplate("<<sex | upper>>", dims) == "MALE")
    assert(ReshapeOps.expandTemplate("<<sex | capitalize>>", dims) == "Male")
    assert(ReshapeOps.expandTemplate(
      "<<age | replace(\"-\", \" to \")>> years", dims) == "10 to 18 years")
    assert(ReshapeOps.expandTemplate(
      "<<sex | upper | replace('MALE', 'M')>>", dims) == "M")
    assert(ReshapeOps.expandTemplate(
      "<<cause | default('all causes') | title>>", dims) == "All Causes")
    // defined value: default is a no-op (jinja semantics)
    assert(ReshapeOps.expandTemplate("<<sex | default('none')>>", dims) == "male")
    // filters bind on loop variables too
    assert(ReshapeOps.expandTemplate(
      "<% for v in sex_values %>[<<v | upper>>]<% endfor %>",
      dims, Map("sex_values" -> Seq("female", "male"))) == "[FEMALE][MALE]")
    // loud: unknown filter, non-default filter on an undefined name,
    // undefined name without a default
    assert(intercept[IllegalArgumentException](ReshapeOps.expandTemplate(
      "<<sex | shout>>", dims)).getMessage.contains("unsupported template filter"))
    assert(intercept[IllegalArgumentException](ReshapeOps.expandTemplate(
      "<<cause | upper>>", dims)).getMessage.contains("unknown dimension"))
    assert(intercept[IllegalArgumentException](ReshapeOps.expandTemplate(
      "<<cause>>", dims)).getMessage.contains("unknown dimension"))
  }
}
