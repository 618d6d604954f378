package graft

import graft.ops.SearchOps

class SearchOpsSpec extends SparkSpec {
  import spark.implicits._

  test("bm25: hand-computed ranking on a tiny corpus") {
    // corpus: doc 1 is term-rich for 'cat', doc 2 mentions it once in a
    // long doc, doc 3 not at all, doc 4 = exact short hit
    val docs = Seq(
      (1L, "cat cat cat dog"),
      (2L, "cat " + ("filler " * 20).trim),
      (3L, "dog bird fish"),
      (4L, "cat")).toDF("doc_id", "text")
    val out = SearchOps.bm25TopK(docs, "text", "doc_id", Seq((0L, "cat")), k = 10)
      .as[(Long, Long, Int)].collect().sortBy(_._3)
    // N=4, df(cat)=3 → idf = ln(1 + 1.5/3.5); dl: 4, 21, 3, 1; avgdl=7.25.
    // tf-sat: doc4 tf=1 dl=1 → denom smallest after numerator cap; hand
    // order: doc4 (shortest) > doc1 (tf 3) > doc2 (long) — verified by the
    // closed form below.
    def score(tf: Long, dl: Long): Double = {
      val idf = math.log(1 + (4 - 3 + 0.5) / (3 + 0.5))
      val v = idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / 7.25))
      BigDecimal(v).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val expected = Seq((1L, score(3, 4)), (2L, score(1, 21)), (4L, score(1, 1)))
      .sortBy { case (id, s) => (-s, id) }.map(_._1)
    assert(out.map(_._2).toSeq == expected)
    assert(!out.map(_._2).contains(3L)) // no matching term → absent
  }

  test("bm25: multi-term queries sum contributions; duplicate query terms count once") {
    val docs = Seq(
      (1L, "alpha beta"),
      (2L, "alpha alpha"),
      (3L, "beta beta beta")).toDF("doc_id", "text")
    val both = SearchOps.bm25TopK(docs, "text", "doc_id",
      Seq((0L, "alpha beta"), (1L, "alpha alpha beta")), k = 10)
      .as[(Long, Long, Int)].collect()
    // doc 1 matches both terms → rank 1 for the two-term query
    assert(both.filter(_._1 == 0L).minBy(_._3)._2 == 1L)
    // duplicated 'alpha' in query 1 must not double its contribution:
    // identical ranking to query 0
    val r0 = both.filter(_._1 == 0L).map(r => (r._2, r._3)).toSet
    val r1 = both.filter(_._1 == 1L).map(r => (r._2, r._3)).toSet
    assert(r0 == r1)
  }

  test("bm25: deterministic doc-id tiebreak on exact duplicates") {
    val docs = Seq(
      (5L, "x y z"), (9L, "x y z"), (2L, "x y z"),
      (7L, "unrelated words here")).toDF("doc_id", "text")
    val out = SearchOps.bm25TopK(docs, "text", "doc_id", Seq((0L, "x")), k = 10)
      .as[(Long, Long, Int)].collect().sortBy(_._3).map(_._2).toSeq
    assert(out == Seq(2L, 5L, 9L)) // equal scores → ascending doc id
  }
}
