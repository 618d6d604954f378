package graft

import org.apache.spark.sql.functions._
import graft.merge.CdcMerge

/** Physical-plan-shape assertions for the headline paths — the plans must
  * stay the ones you'd want at 100 TB, not just produce correct rows:
  * filters reach the parquet scan, projections prune the read schema,
  * small joins broadcast, and the merge-on-read dedup combines map-side.
  */
class PlanShapeSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def planOf(name: String): String = {
    val df = Queries.all(name)(spark, sfDir)
    df.collect() // AQE: materialize the final plan
    df.queryExecution.executedPlan.toString
  }

  test("filters and projection push into the parquet scan") {
    val plan = planOf("q_scan_filter_project")
    assert(plan.contains("PushedFilters: ["), plan.take(2000))
    assert(plan.contains("LessThan(l_shipdate") || plan.contains("GreaterThan(l_discount"),
      s"expected a pushed comparison filter:\n${plan.take(2000)}")
    // ReadSchema must be the 5 referenced columns, not all 16 lineitem columns
    val readSchema = "ReadSchema:.*".r.findFirstIn(plan).getOrElse("")
    assert(!readSchema.contains("l_comment") && !readSchema.contains("l_partkey"),
      s"scan reads unreferenced columns: $readSchema")
  }

  test("fact-dim join broadcasts the small side") {
    val plan = planOf("q_join_inner_agg")
    assert(plan.contains("BroadcastHashJoin"), plan.take(3000))
    assert(!plan.contains("SortMergeJoin"), "small-dim join must not sort-merge")
  }

  test("merge-on-read dedup aggregates map-side before the exchange") {
    import spark.implicits._
    val batch = (0 until 1000).map(i =>
      ("c" + (i % 50), i % 20, "U", i.toLong, "role", "text", "tool",
        new java.sql.Timestamp(i.toLong)))
      .toDF("conv_id", "turn_idx", "op", "lsn", "role", "text", "tool", "ts")
      .repartition(4)
    val deduped = CdcMerge.dedupMaxLsnAgg(batch)
    deduped.collect()
    val plan = deduped.queryExecution.executedPlan.toString
    // partial max_by before the shuffle, final after — map-side combine
    assert("HashAggregate.*partial_max_by".r.findFirstIn(plan).isDefined ||
      plan.contains("partial_max_by"), plan.take(3000))
    assert(plan.contains("Exchange hashpartitioning(conv_id"), plan.take(3000))
  }

  test("snapshot of an all-BASE table has no shuffle at all") {
    val dir = tmpDir("planshape")
    try {
      val cfg = graft.gen.WalGen.Config(numEvents = 2000, numConvs = 30)
      val t = graft.lake.LakeTable.create(spark, s"$dir/t",
        graft.model.Schemas.transcript, numBuckets = 2)
      CdcMerge.apply(t, graft.gen.WalGen.events(spark, cfg, 0, 2000).toDF(), 0L)
      graft.merge.Compactor.compact(t, Set(0, 1))
      val df = t.snapshot()
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"clean-table read must be shuffle-free:\n$plan")
      assert(!plan.contains("Window"), "clean-table read must not window")
    } finally rmrf(dir)
  }

  test("dedup/ANN scale paths plan as equi-joins — no quadratic leg") {
    // Encodes BENCH's "no quadratic leg" claim as a regression test: the
    // production (bench-twin) form of every dedup/ANN operator must not
    // plan a CartesianProduct or BroadcastNestedLoopJoin anywhere.
    // Intentionally-quadratic forms are excluded: q_neardup_exact_pairs
    // (bounded oracle baseline) and q_ann_brute_force (the exact baseline
    // broadcast crossJoin).
    val sfDir = "/root/testdata/sf0.001"
    val scalePaths = Seq("q_dedup_exact", "q_dedup_minhash_lsh", "q_dedup_simhash",
      "q_dedup_ngram_jaccard", "q_dedup_drop_neardup", "q_dedup_embedding_cosine",
      "q_ann_lsh", "q_ann_ivf")
    val reg = graft.Queries.allForBench
    scalePaths.foreach { name =>
      val plan = reg(name)(spark, sfDir).queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"),
        s"$name plans a CartesianProduct:\n${plan.take(2000)}")
      assert(!plan.contains("BroadcastNestedLoopJoin"),
        s"$name plans a BroadcastNestedLoopJoin:\n${plan.take(2000)}")
    }
  }

  test("incremental dedup refresh re-shingles only the batch: store side reads checkpointed signatures") {
    import spark.implicits._
    val docs = (0 until 200).map(i => (s"d$i", s"document number $i sharing lots of words with neighbors"))
    val (store, _) = graft.ops.IncrementalDedup.refresh(
      graft.ops.IncrementalDedup.emptyStore(spark), docs.toDF("doc_id", "text"),
      "text", "doc_id")
    val batch = Seq(("n1", "a brand new arrival"), ("n2", "a brand new arrival"))
    val (_, pairs) = graft.ops.IncrementalDedup.refresh(
      store, batch.toDF("doc_id", "text"), "text", "doc_id")
    val plan = pairs.queryExecution.executedPlan.toString
    // the stored side enters as checkpointed rows (ExistingRDD/LocalTableScan
    // family), NOT as a re-computation of the text pipeline; the signature
    // expression appears only for the 2-doc batch side
    assert(plan.contains("ExistingRDD") || plan.contains("Scan ExistingRDD"),
      s"store side is not a checkpoint scan:\n${plan.take(2000)}")
    val shingleOps = "minhash_signature|regexp_extract_all|sentences\\(".r
      .findAllIn(plan).size
    // one signature pipeline (the batch side of the candidate join may be
    // referenced from a reused exchange/subplan, so allow plan-node reuse,
    // but a store-side recompute would roughly double the count vs the
    // batch-only baseline)
    val batchOnlyPlan = graft.ops.IncrementalDedup.signatureOf(
      batch.toDF("doc_id", "text"), "text", "doc_id", 8, 4)
      .queryExecution.executedPlan.toString
    val baseline = "minhash_signature|regexp_extract_all|sentences\\(".r
      .findAllIn(batchOnlyPlan).size
    assert(shingleOps <= baseline * 2,
      s"refresh plan computes signatures $shingleOps times (batch-only baseline $baseline):\n${plan.take(3000)}")
    // and no quadratic leg, same contract as the batch operators
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"))
  }

  test("window fills plan running frames only — no unbounded-FOLLOWING scan") {
    // Spark's UnboundedFollowingWindowFunctionFrame re-scans from the
    // current row to the partition end for EVERY row — O(p²) per
    // partition. bfill and interpolate's next-observation leg must plan
    // as running frames over descending time instead (round-6 finding #5).
    import spark.implicits._
    val df = Seq((1L, 1L, Some(1.0)), (1L, 2L, None), (1L, 3L, Some(3.0)))
      .toDF("ent", "t", "v")
    for ((name, out) <- Seq(
        "bfill" -> graft.ops.TimeOps.bfill(df, Seq("ent"), "t", "v"),
        "interpolate" -> graft.ops.TimeOps.interpolate(df, Seq("ent"), "t", "v"))) {
      val plan = out.queryExecution.executedPlan.toString
      assert(!plan.toLowerCase.contains("unboundedfollowing"),
        s"$name plans an unbounded-following frame:\n${plan.take(3000)}")
    }
    // value golden for the rewritten legs: interior gap interpolated,
    // bfill takes the next observation
    val interp = graft.ops.TimeOps.interpolate(df, Seq("ent"), "t", "v")
      .orderBy("t").collect().map(_.getDouble(2))
    assert(interp.toSeq == Seq(1.0, 2.0, 3.0))
    val bf = graft.ops.TimeOps.bfill(df, Seq("ent"), "t", "v")
      .orderBy("t").collect().map(_.getDouble(2))
    assert(bf.toSeq == Seq(1.0, 3.0, 3.0))
  }

  test("shingles evaluate the tokenize per ROW, not per gram element") {
    // The gram builder must be the zip_with chain (one split per slice),
    // not a transform lambda indexing a captured token array — a captured
    // non-attribute subtree re-evaluates PER ELEMENT (round-6 finding #3).
    // parquet-backed input: a local literal relation would be constant-
    // folded into a LocalTableScan and show no expressions at all
    val df = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val plan = df.select(graft.ops.TextOps.shingles(col("text"), 3).as("s"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("zip_with"), s"expected zip_with gram chain:\n${plan.take(2000)}")
    assert(!plan.contains("element_at"),
      s"gram lambda still indexes a captured token array:\n${plan.take(2000)}")
    // staged forms keep their materializing projections (CollapseProject
    // must not re-inline the multiply-referenced arrays)
    val rep = graft.ops.QualityOps.repetitionSignals(df, "doc_id", "text", 2, " ")
      .queryExecution.executedPlan.toString
    assert(rep.contains("__ls") && rep.contains("__gr"),
      s"repetitionSignals lost its staged array columns:\n${rep.take(3000)}")
    val chunks = graft.ops.ChunkOps.chunkByTokens(df, "doc_id", "text", 2, 0)
      .queryExecution.executedPlan.toString
    assert(chunks.contains("__toks"),
      s"chunkByTokens lost its staged token column:\n${chunks.take(3000)}")
  }
}
