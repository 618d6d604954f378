package graft

import org.apache.spark.sql.functions._
import graft.ops.{DiffOps, TimeOps}

/** Tolerant datadiff (reference `etl/datadiff.py:536-676`) and the composed
  * expand_time_column (since/until bounds + fill strategy,
  * `misc.py:109-349`).
  */
class DiffTimeSpec extends SparkSpec {
  import spark.implicits._

  test("datadiff: rtol/atol tolerance, key drift, string inequality") {
    val a = Seq(
      (1L, 100.0, "x"), (2L, 200.0, "y"), (3L, 300.0, "z"), (4L, 400.0, "w"))
      .toDF("k", "v", "s")
    val b = Seq(
      (1L, 100.0 * (1 + 1e-9), "x"), // within rtol=1e-5 → equal
      (2L, 202.0, "y"),              // 1% off → differs
      (3L, 300.0, "ZZZ"),            // string differs
      (5L, 500.0, "q"))              // key drift both ways (4 only in a, 5 only in b)
      .toDF("k", "v", "s")
    val r = DiffOps.diff(a, b, Seq("k"), rtol = 1e-5, atol = 1e-8)
      .collect().map(x => x.getString(0) ->
        (x.getLong(1), x.getLong(2), Option(x.get(3)).map(_.asInstanceOf[Double]),
          x.getLong(4), x.getLong(5))).toMap
    val (vCmp, vDif, vMad, onlyA, onlyB) = r("v")
    assert(vCmp == 3 && vDif == 1)
    assert(math.abs(vMad.get - 2.0) < 1e-12)
    assert(onlyA == 1 && onlyB == 1)
    val (sCmp, sDif, sMad, _, _) = r("s")
    assert(sCmp == 3 && sDif == 1 && sMad.isEmpty)
    // isClose: false here, true for identical tables
    assert(!DiffOps.isClose(a, b, Seq("k")))
    assert(DiffOps.isClose(a, a, Seq("k")))
  }

  test("datadiff: keys-only frames report key drift instead of crashing") {
    val a = Seq(1L, 2L, 3L).toDF("k")
    val b = Seq(2L, 3L, 4L).toDF("k")
    val r = DiffOps.diff(a, b, Seq("k")).collect()
    assert(r.length == 1 && r(0).getString(0) == "(keys)")
    assert(r(0).getLong(1) == 2 && r(0).getLong(4) == 1 && r(0).getLong(5) == 1)
    assert(!DiffOps.isClose(a, b, Seq("k")) && DiffOps.isClose(a, a, Seq("k")))
  }

  test("datadiff: null semantics — null==null equal, null vs value differs") {
    val a = Seq((1L, Some(1.0)), (2L, None), (3L, Some(3.0))).toDF("k", "v")
    val b = Seq((1L, None), (2L, None), (3L, Some(3.0))).toDF("k", "v")
    val r = DiffOps.diff(a, b, Seq("k")).collect()(0)
    assert(r.getLong(1) == 3 && r.getLong(2) == 1)
  }

  test("expand_time_column: until extension + ffill / zero / interpolate strategies") {
    val df = Seq(
      ("a", 2000, Some(1.0)), ("a", 2003, Some(4.0)),
      ("b", 2001, Some(10.0))).toDF("e", "t", "v")
    def vals(fill: String) = TimeOps.expandTimeColumn(df, Seq("e"), "t",
      "full_range_entity", since = None, until = Some(2004L), fill, Seq("v"))
      .orderBy("e", "t").collect()
      .map(r => (r.getString(0), r.getInt(1), Option(r.get(2)).map(_.asInstanceOf[Double])))

    val ff = vals("ffill")
    assert(ff.filter(_._1 == "a").map(_._2).toSeq == (2000 to 2004))
    assert(ff.filter(_._1 == "b").map(_._2).toSeq == (2001 to 2004)) // extended past max
    assert(ff.find(x => x._1 == "a" && x._2 == 2002).get._3.contains(1.0)) // gap ffilled
    assert(ff.find(x => x._1 == "a" && x._2 == 2004).get._3.contains(4.0)) // extension ffilled
    assert(ff.find(x => x._1 == "b" && x._2 == 2004).get._3.contains(10.0))

    val z = vals("zero")
    assert(z.find(x => x._1 == "a" && x._2 == 2001).get._3.contains(0.0))
    assert(z.find(x => x._1 == "a" && x._2 == 2003).get._3.contains(4.0))

    val ip = vals("interpolate")
    assert(ip.find(x => x._1 == "a" && x._2 == 2001).get._3.contains(2.0)) // linear
    assert(ip.find(x => x._1 == "a" && x._2 == 2002).get._3.contains(3.0))
    assert(ip.find(x => x._1 == "a" && x._2 == 2004).get._3.contains(4.0)) // trailing → nearest

    // since extension backwards + none leaves gaps null
    val none = TimeOps.expandTimeColumn(df, Seq("e"), "t",
      "full_range_entity", since = Some(1999L), until = None, "none", Seq("v"))
      .orderBy("e", "t").collect()
    assert(none.count(r => r.getString(0) == "a") == 5) // 1999..2003
    assert(none.filter(r => r.getString(0) == "a" && r.getInt(1) == 1999).head.isNullAt(2))
  }
}
