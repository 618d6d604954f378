package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._
import graft.ops.SimilarityOps

/** Native vector expressions: bit-identical to the HOF formulation,
  * codegen-enabled, SQL-registered via GraftExtensions.
  */
class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val vecs = {
    val rnd = new scala.util.Random(7)
    (0 until 200).map(i => (i.toLong,
      Array.fill(64)(rnd.nextFloat() * 2 - 1),
      Array.fill(64)(rnd.nextDouble() * 2 - 1)))
      .toDF("id", "fvec", "dvec")
  }

  test("native dot/cosine bit-identical to HOF formulation (float + double)") {
    val joined = vecs.as("a").crossJoin(vecs.as("b")).limit(2000)
      .select(
        vector_dot(col("a.fvec"), col("b.fvec")).as("dot_native"),
        SimilarityOps.dotHof(col("a.fvec"), col("b.fvec")).as("dot_hof"),
        cosine_similarity(col("a.dvec"), col("b.dvec")).as("cos_native"),
        SimilarityOps.cosineHof(col("a.dvec"), col("b.dvec")).as("cos_hof"),
        cosine_similarity(col("a.fvec"), col("b.dvec")).as("cos_mixed"))
    val bad = joined.filter(col("dot_native") =!= col("dot_hof") ||
      col("cos_native") =!= col("cos_hof")).count()
    assert(bad == 0, s"$bad rows differ from HOF reference")
    assert(joined.filter(col("cos_mixed").isNull).count() == 0)
  }

  test("expressions participate in whole-stage codegen") {
    // repartition forces a non-local plan (LocalTableScan pre-evaluates);
    // execute first — AQE only materializes codegen stages in the final plan
    val df = vecs.repartition(2)
      .select(cosine_similarity(col("fvec"), col("fvec")).as("c"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // AQE renders codegen stages as "*(n) Op" — the Project containing the
    // expression must be inside one (a CodegenFallback would print bare)
    assert(plan.contains("*(1) Project"), plan)
  }

  test("native minhash signature bit-identical to HOF formulation, incl. empty arrays") {
    val docs = (0 until 100).map { i =>
      (i.toLong, (0 until (i % 7) * 10).map(j => s"tok${(i * 13 + j) % 40}").mkString(" "))
    }.toDF("id", "text") // ids with i % 7 == 0 have EMPTY token-hash arrays after shingling
    val hs = docs.repartition(2).select(col("id"),
      transform(graft.ops.TextOps.shingles(col("text"), 3), x => xxhash64(x)).as("hs"))
    val both = hs.select(col("id"),
      graft.ops.DedupOps.minhashSignatureFromHashes(col("hs"), 16).as("native"),
      graft.ops.DedupOps.minhashSignatureFromHashesHof(col("hs"), 16).as("hof"))
    both.collect().foreach { r =>
      assert(r.getSeq[Any](1) == r.getSeq[Any](2), s"mismatch for id ${r.getLong(0)}")
    }
    // and the native expression stays inside whole-stage codegen once the
    // (interpreted-HOF) shingle hashes are staged behind a cache boundary —
    // exactly how the dedup pipelines call it
    val hsMat = hs.persist()
    hsMat.count()
    val df = hsMat.select(graft.ops.DedupOps.minhashSignatureFromHashes(col("hs"), 8).as("sig"))
    df.collect()
    assert(df.queryExecution.executedPlan.toString.contains("*(1) Project"),
      df.queryExecution.executedPlan.toString)
    hsMat.unpersist()
  }

  test("native simhash64 bit-identical to the 64-vote HOF formulation") {
    val docs = (0 until 80).map { i =>
      (i.toLong, (0 until (i % 5) * 12).map(j => s"w${(i * 7 + j) % 30}").mkString(" "))
    }.toDF("id", "text") // includes EMPTY token sets (i % 5 == 0)
    val hs = docs.repartition(2)
      .select(col("id"), graft.ops.DedupOps.tokenHashes(col("text")).as("hs"))
    val both = hs.select(col("id"),
      graft.ops.DedupOps.simhashFromHashes(col("hs")).as("native"),
      graft.ops.DedupOps.simhashFromHashesHof(col("hs")).as("hof"))
    both.collect().foreach(r =>
      assert(r.getLong(1) == r.getLong(2), s"mismatch for id ${r.getLong(0)}"))
  }

  test("SQL registration via GraftExtensions") {
    // extensions apply at session BUILD time; build a sibling session over
    // the same SparkContext (do NOT stop it — the context is shared)
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      // `spark.sql.extensions` is a STATIC conf (only honored when the
      // SparkContext is created); with a live context use the programmatic
      // builder hook instead
      val s2 = SparkSession.builder()
        .withExtensions(new graft.functions.GraftExtensions)
        .getOrCreate()
      val r = s2.sql(
        """SELECT vector_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d,
          |       cosine_similarity(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c""".stripMargin)
        .collect()(0)
      assert(r.getDouble(0) == 11.0 && math.abs(r.getDouble(1) - 1.0) < 1e-15)
      val mh = s2.sql("SELECT minhash_signature(array(1L, 2L, 3L), 4) AS m")
        .collect()(0).getSeq[Long](0)
      assert(mh.length == 4 && mh.forall(_ >= 0))
      // type error is caught at analysis with the function name in it
      val err = intercept[Exception](s2.sql("SELECT vector_dot(1, 2)").collect())
      assert(err.getMessage.contains("vector_dot"))
    } finally {
      // restore the shared session for subsequent suites
      SparkSession.setActiveSession(spark)
      SparkSession.setDefaultSession(spark)
    }
  }
}
