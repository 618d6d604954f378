package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** SparkSessionExtensions registrar: exposes the native vector expressions
  * to SQL (`SELECT cosine_similarity(e1, e2) ...`). Enable with
  * `spark.sql.extensions=graft.functions.GraftExtensions` or
  * `.withExtensions(new GraftExtensions)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    // MERGE INTO <registered lake table> → CdcMerge (graft.sql.MergeSql)
    e.injectResolutionRule(session => graft.sql.GraftMergeRule(session))
    // SELECT ... FROM <registered lake table> [VERSION AS OF v] →
    // snapshot / snapshotAt (graft.sql.SelectSql)
    e.injectResolutionRule(session => graft.sql.GraftSelectRule(session))
    // OPTIMIZE / VACUUM maintenance statements (graft.sql.MaintenanceSql)
    e.injectParser((session, delegate) => new graft.sql.GraftSqlParser(session, delegate))
    e.injectFunction((
      new FunctionIdentifier("vector_dot"),
      new ExpressionInfo(classOf[VectorDot].getName, "vector_dot"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        VectorDot(exprs(0), exprs(1))))
    e.injectFunction((
      new FunctionIdentifier("cosine_similarity"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_similarity"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        CosineSimilarity(exprs(0), exprs(1))))
    // minhash_signature(hashes, k[, seed]) — k/seed must be literals
    e.injectFunction((
      new FunctionIdentifier("minhash_signature"),
      new ExpressionInfo(classOf[MinHashSignature].getName, "minhash_signature"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        def lit(i: Int): Long = exprs(i) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v.toLong
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Long, _) => v
          case other => throw new IllegalArgumentException(
            s"minhash_signature arg ${i + 1} must be an integer literal, got $other")
        }
        MinHashSignature(exprs(0), lit(1).toInt,
          if (exprs.length > 2) lit(2) else 42L)
      }))
    e.injectFunction((
      new FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        SimHash64(exprs(0))))
  }
}
