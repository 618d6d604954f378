package graft

import org.apache.spark.sql.functions._
import graft.ops.TableOps

/** Round-6 optimization internals: the scale-adaptive fan-out used ahead
  * of per-row-heavy stages, and the zorder compaction's materialized
  * cluster column (sorting on a plain attribute instead of re-evaluating
  * the z expression per comparison must not leak the helper column or
  * change the resolved rows).
  */
class FanOutSpec extends SparkSpec {
  import spark.implicits._

  test("fanOut spreads a single-partition input to default parallelism") {
    val one = spark.range(0, 1000).toDF("id").coalesce(1)
    assert(one.rdd.getNumPartitions == 1)
    val out = TableOps.fanOut(one)
    assert(out.rdd.getNumPartitions == spark.sparkContext.defaultParallelism)
    assert(out.select(sum($"id")).head().getLong(0) == 499500L)
  }

  test("fanOut is the identity when the input already splits finely") {
    val target = spark.sparkContext.defaultParallelism
    val wide = spark.range(0, 1000).toDF("id").repartition(target + 2)
    val out = TableOps.fanOut(wide)
    // no extra exchange: same partitioning object, same partition count
    assert(out.rdd.getNumPartitions == target + 2)
    assert(out eq wide)
  }

  test("zorder rewrite keeps the user schema (no leaked cluster column) and the exact row set") {
    import graft.lake.LakeTable
    import graft.merge.{Bootstrap, Compactor}
    val dir = tmpDir("zorder-colspec")
    try {
      val t = LakeTable.create(spark, s"$dir/t", graft.model.Schemas.transcript, 4)
      val rows = spark.range(0, 500).select(
        concat(lit("c"), ($"id" % 37).cast("string")).as("conv_id"),
        ($"id" / 37).cast("int").as("turn_idx"),
        lit("user").as("role"),
        concat(lit("txt"), $"id").as("text"),
        lit(null).cast("string").as("tool"),
        timestamp_seconds(lit(1704067200L) + $"id" * 60).as("ts"))
      Bootstrap.load(t, rows, snapshotLsn = 1000L)
      val before = t.snapshot().orderBy("conv_id", "turn_idx").collect()
      Compactor.zorder(t, Seq("ts"), maxRecordsPerFile = 64L)
      val after = t.snapshot()
      assert(after.columns.toSeq == graft.model.Schemas.transcript.fieldNames.toSeq,
        s"zorder leaked helper columns: ${after.columns.mkString(",")}")
      assert(after.orderBy("conv_id", "turn_idx").collect().toSeq == before.toSeq)
    } finally rmrf(dir)
  }
}
