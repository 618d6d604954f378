package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.lake.LakeTable
import graft.merge.CdcMerge
import graft.model.Schemas
import graft.sql.LakeCatalog

/** ALTER TABLE schema-evolution DDL over registered lake tables:
  * ADD COLUMN[S] / ALTER COLUMN TYPE widen through the same reconciler the
  * write path uses; everything else delegates to Spark's own grammar.
  */
class AlterSqlSpec extends SparkSpec {

  test("ADD COLUMNS + widen + reject narrowing; evolved table keeps serving") {
    val dir = tmpDir("altersql")
    spark.sparkContext
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .withExtensions(new graft.functions.GraftExtensions)
        .getOrCreate()
      import s2.implicits._
      val table = LakeTable.create(s2, s"$dir/t", Schemas.transcript, numBuckets = 2)
      LakeCatalog.register("lake_alter", s"$dir/t")

      // seed a row under the ORIGINAL schema
      val ts = java.sql.Timestamp.valueOf("2024-03-01 10:00:00")
      val seed = Seq(("I", 1L, "c1", 0, "user", "hello", null.asInstanceOf[String], ts))
        .toDF("op", "lsn", "conv_id", "turn_idx", "role", "text", "tool", "ts")
      CdcMerge(table, seed, epoch = 1L)
      val v1 = table.currentVersion

      // multi-column parenthesized form, incl. a parameterized type
      val r = s2.sql("ALTER TABLE lake_alter ADD COLUMNS (score INT, cost DECIMAL(18,4))").collect()(0)
      assert(r.getInt(0) > 0 && r.getString(1) == "score, cost")
      // bare single-column form
      s2.sql("ALTER TABLE lake_alter ADD COLUMN note STRING").collect()
      val t2 = LakeTable.load(s2, s"$dir/t")
      assert(t2.userSchema.fieldNames.toSeq ==
        Seq("conv_id", "turn_idx", "role", "text", "tool", "ts", "score", "cost", "note"))
      // pre-evolution rows null-fill the new columns
      val row = t2.snapshot().select("text", "score", "note").collect()(0)
      assert(row.getString(0) == "hello" && row.isNullAt(1) && row.isNullAt(2))

      // widen the added column; no-op retype returns the same schema id
      val w = s2.sql("ALTER TABLE lake_alter ALTER COLUMN score TYPE BIGINT").collect()(0)
      val idAfterWiden = w.getInt(0)
      assert(w.getString(1) == "BIGINT")
      val noop = s2.sql("ALTER TABLE lake_alter ALTER COLUMN score TYPE BIGINT").collect()(0)
      assert(noop.getInt(0) == idAfterWiden, "same-type retype must not mint a schema id")

      // a write carrying the evolved columns applies; old key updates in place
      val batch = Seq(("U", 2L, "c1", 0, "user", "hello v2", null.asInstanceOf[String], ts, 42L, "n1"))
        .toDF("op", "lsn", "conv_id", "turn_idx", "role", "text", "tool", "ts", "score", "note")
      CdcMerge(LakeTable.load(s2, s"$dir/t"), batch, epoch = 2L)
      val after = LakeTable.load(s2, s"$dir/t").snapshot()
        .select("text", "score", "note").collect()(0)
      assert(after.getString(0) == "hello v2" && after.getLong(1) == 42L && after.getString(2) == "n1")

      // time travel: the pre-evolution version still reads under its OWN schema
      val old = LakeTable.load(s2, s"$dir/t").snapshotAt(v1)
      assert(!old.columns.contains("score") && old.select("text").collect()(0).getString(0) == "hello")

      // rejections: narrowing, unknown column, duplicate add
      val narrow = intercept[IllegalArgumentException](
        s2.sql("ALTER TABLE lake_alter ALTER COLUMN score TYPE INT").collect())
      assert(narrow.getMessage.contains("schema evolution rejected"))
      val unknown = intercept[IllegalArgumentException](
        s2.sql("ALTER TABLE lake_alter ALTER COLUMN nope TYPE BIGINT").collect())
      assert(unknown.getMessage.contains("no such column"))
      val dup = intercept[IllegalArgumentException](
        s2.sql("ALTER TABLE lake_alter ADD COLUMN score BIGINT").collect())
      assert(dup.getMessage.contains("already exist"))

      // lineage audit: evolve-schema commits are visible
      val ops = s2.sql("DESCRIBE HISTORY lake_alter").collect().map(_.getString(7))
      assert(ops.count(_ == "evolve-schema") == 3) // two ADDs + one widen

      // an ALTER form we don't own on a lake table is loud with the shapes
      val owned = intercept[IllegalArgumentException](
        s2.sql("ALTER TABLE lake_alter RENAME TO other").collect())
      assert(owned.getMessage.contains("supported:"))

      // non-lake targets delegate to Spark's grammar/catalog untouched
      val sparkErr = intercept[Exception](
        s2.sql("ALTER TABLE not_a_lake_table ADD COLUMNS (x INT)").collect())
      assert(!sparkErr.getMessage.contains("supported:"),
        s"non-lake ALTER must fall through to Spark, got: ${sparkErr.getMessage}")
    } finally {
      rmrf(dir)
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }
}
