package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.gen.WalGen
import graft.lake.LakeTable
import graft.model.Schemas
import graft.sql.LakeCatalog

/** `MERGE INTO <lake table> USING <source>` SQL surface → CdcMerge. */
class MergeSqlSpec extends SparkSpec {

  test("MERGE INTO SQL applies LSN-gated upserts and deletes to a registered lake table") {
    val dir = tmpDir("mergesql")
    spark.sparkContext // ensure the shared context exists (builder reuses it)
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .withExtensions(new graft.functions.GraftExtensions)
        .getOrCreate()
      val cfg = WalGen.Config(numEvents = 6000, numConvs = 60)
      LakeTable.create(s2, s"$dir/t", Schemas.transcript, numBuckets = 4)
      LakeCatalog.register("lake_transcripts", s"$dir/t")

      WalGen.events(s2, cfg, 0, 3000).toDF().createOrReplaceTempView("changes")
      val r1 = s2.sql(
        """MERGE INTO lake_transcripts USING changes
          |ON lake_transcripts.conv_id = changes.conv_id
          |   AND lake_transcripts.turn_idx = changes.turn_idx
          |WHEN MATCHED THEN UPDATE SET *
          |WHEN NOT MATCHED THEN INSERT *""".stripMargin).collect()(0)
      assert(r1.getBoolean(1), "first MERGE must apply")
      val table = LakeTable.load(s2, s"$dir/t")
      val afterFirst = table.snapshot().count()
      assert(afterFirst > 0)

      // second batch through the same SQL surface → converges to the oracle
      WalGen.events(s2, cfg, 3000, 6000).toDF().createOrReplaceTempView("changes")
      val r2 = s2.sql(
        """MERGE INTO lake_transcripts USING changes
          |ON lake_transcripts.conv_id = changes.conv_id
          |   AND lake_transcripts.turn_idx = changes.turn_idx
          |WHEN MATCHED THEN UPDATE SET *
          |WHEN NOT MATCHED THEN INSERT *""".stripMargin).collect()(0)
      assert(r2.getBoolean(1) && r2.getLong(0) > r1.getLong(0))
      val oracle = WalGen.oracleState(cfg)
      val got = table.snapshot().select("conv_id", "turn_idx", "text").collect()
        .map(r => ((r.getString(0), r.getInt(1)), r.getString(2))).toMap
      assert(got.size == oracle.size)
      oracle.foreach { case (k, e) => assert(got(k) == e.text) }

      // unregistered target still resolves through the normal path (error)
      val err = intercept[Exception](s2.sql(
        "MERGE INTO no_such_table USING changes ON 1=1 WHEN MATCHED THEN UPDATE SET *").collect())
      assert(err.getMessage.toLowerCase.contains("no_such_table") ||
        err.getMessage.toLowerCase.contains("table"))

      // statements whose semantics the CDC upsert would NOT honor are
      // REJECTED loudly, never silently executed as an upsert:
      // pure delete combined with INSERT (can't insert tombstoned rows)
      val delIns = intercept[Exception](s2.sql(
        """MERGE INTO lake_transcripts USING changes
          |ON lake_transcripts.conv_id = changes.conv_id
          |   AND lake_transcripts.turn_idx = changes.turn_idx
          |WHEN MATCHED THEN DELETE
          |WHEN NOT MATCHED THEN INSERT *""".stripMargin).collect())
      assert(delIns.getMessage.contains("cannot be combined"), delIns.getMessage)
      // DELETE condition referencing TARGET columns (not evaluable
      // source-side) is loud, not silently mis-routed
      val delTgt = intercept[Exception](s2.sql(
        """MERGE INTO lake_transcripts USING changes
          |ON lake_transcripts.conv_id = changes.conv_id
          |   AND lake_transcripts.turn_idx = changes.turn_idx
          |WHEN MATCHED AND lake_transcripts.text = 'x' THEN DELETE
          |WHEN MATCHED THEN UPDATE SET *
          |WHEN NOT MATCHED THEN INSERT *""".stripMargin).collect())
      assert(delTgt.getMessage.contains("source columns"), delTgt.getMessage)
      val badOn = intercept[Exception](s2.sql(
        """MERGE INTO lake_transcripts USING changes
          |ON lake_transcripts.conv_id = changes.conv_id
          |WHEN MATCHED THEN UPDATE SET *
          |WHEN NOT MATCHED THEN INSERT *""".stripMargin).collect())
      assert(badOn.getMessage.contains("key columns"), badOn.getMessage)
      // CROSSED key comparison mentions both key names but is NOT the
      // key-equality upsert — must be rejected, not pass a name-set check
      val crossed = intercept[Exception](s2.sql(
        """MERGE INTO lake_transcripts USING changes
          |ON lake_transcripts.conv_id = changes.turn_idx
          |   AND lake_transcripts.turn_idx = changes.conv_id
          |WHEN MATCHED THEN UPDATE SET *
          |WHEN NOT MATCHED THEN INSERT *""".stripMargin).collect())
      assert(crossed.getMessage.contains("conjunction of same-name key equalities"),
        crossed.getMessage)
      // same-relation self-equality (a tautology mentioning both key
      // names) is NOT the key-equality upsert — rejected
      val selfEq = intercept[Exception](s2.sql(
        """MERGE INTO lake_transcripts USING changes
          |ON lake_transcripts.conv_id = lake_transcripts.conv_id
          |   AND lake_transcripts.turn_idx = changes.turn_idx
          |WHEN MATCHED THEN UPDATE SET *
          |WHEN NOT MATCHED THEN INSERT *""".stripMargin).collect())
      assert(selfEq.getMessage.contains("conjunction of same-name key equalities"),
        selfEq.getMessage)
      // non-equality predicate over the key columns → rejected
      val nonEq = intercept[Exception](s2.sql(
        """MERGE INTO lake_transcripts USING changes
          |ON lake_transcripts.conv_id <= changes.conv_id
          |   AND lake_transcripts.turn_idx = changes.turn_idx
          |WHEN MATCHED THEN UPDATE SET *
          |WHEN NOT MATCHED THEN INSERT *""".stripMargin).collect())
      assert(nonEq.getMessage.contains("conjunction of same-name key equalities"),
        nonEq.getMessage)
    } finally {
      LakeCatalog.unregister("lake_transcripts")
      SparkSession.setActiveSession(spark)
      SparkSession.setDefaultSession(spark)
      rmrf(dir)
    }
  }

  test("MERGE INTO SQL: WHEN MATCHED [AND cond] THEN DELETE maps to tombstones, == CdcMerge batch") {
    val dir = tmpDir("mergesqldel")
    spark.sparkContext
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .withExtensions(new graft.functions.GraftExtensions)
        .getOrCreate()
      import s2.implicits._
      def rows(rs: Seq[(String, String, String, Long)]) = rs.map { case (c, text, op, lsn) =>
        (c, 0, "assistant", text, null.asInstanceOf[String],
          new java.sql.Timestamp(1700000000000L + lsn), op, lsn)
      }.toDF("conv_id", "turn_idx", "role", "text", "tool", "ts", "op", "lsn")
      LakeTable.create(s2, s"$dir/t", Schemas.transcript, numBuckets = 2)
      LakeCatalog.register("lake_del", s"$dir/t")
      val twin = LakeTable.create(s2, s"$dir/twin", Schemas.transcript, numBuckets = 2)

      rows(Seq(("a", "old a", "U", 1), ("b", "old b", "U", 2), ("c", "old c", "U", 3)))
        .createOrReplaceTempView("seed")
      s2.sql(
        """MERGE INTO lake_del USING seed
          |ON lake_del.conv_id = seed.conv_id AND lake_del.turn_idx = seed.turn_idx
          |WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *""".stripMargin).collect()

      // conditional DELETE on a NON-op source column: 'a' is purged even
      // though its op is 'U'; 'b' updates; 'd' inserts
      val batch2 = rows(Seq(("a", "<purge>", "U", 10), ("b", "fresh b", "U", 11),
        ("d", "new d", "U", 12)))
      batch2.createOrReplaceTempView("changes2")
      s2.sql(
        """MERGE INTO lake_del USING changes2
          |ON lake_del.conv_id = changes2.conv_id AND lake_del.turn_idx = changes2.turn_idx
          |WHEN MATCHED AND changes2.text = '<purge>' THEN DELETE
          |WHEN MATCHED THEN UPDATE SET *
          |WHEN NOT MATCHED THEN INSERT *""".stripMargin).collect()
      val table = LakeTable.load(s2, s"$dir/t")
      def state(t: LakeTable) = t.snapshot().select("conv_id", "text")
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      assert(state(table) == Map("b" -> "fresh b", "c" -> "old c", "d" -> "new d"))

      // the equivalent CdcMerge batches (DELETE clause == op-routed rows)
      graft.merge.CdcMerge.apply(twin,
        rows(Seq(("a", "old a", "U", 1), ("b", "old b", "U", 2), ("c", "old c", "U", 3))), 1L)
      graft.merge.CdcMerge.apply(twin, batch2.withColumn("op",
        when(col("text") === "<purge>", lit("D")).otherwise(col("op"))), 2L)
      assert(state(LakeTable.load(s2, s"$dir/twin")) == state(table),
        "SQL DELETE clause drifted from the equivalent CdcMerge batch")

      // pure delete: matched keys tombstoned, ghost keys are no-ops
      rows(Seq(("b", "", "U", 20), ("ghost", "", "U", 21)))
        .createOrReplaceTempView("changes3")
      s2.sql(
        """MERGE INTO lake_del USING changes3
          |ON lake_del.conv_id = changes3.conv_id AND lake_del.turn_idx = changes3.turn_idx
          |WHEN MATCHED THEN DELETE""".stripMargin).collect()
      assert(state(LakeTable.load(s2, s"$dir/t")) == Map("c" -> "old c", "d" -> "new d"))
    } finally {
      LakeCatalog.unregister("lake_del")
      SparkSession.setActiveSession(spark)
      SparkSession.setDefaultSession(spark)
      rmrf(dir)
    }
  }

  test("SELECT over a registered lake table: live snapshot, VERSION AS OF and TIMESTAMP AS OF time travel") {
    val dir = tmpDir("selectsql")
    spark.sparkContext
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .withExtensions(new graft.functions.GraftExtensions)
        .getOrCreate()
      val cfg = WalGen.Config(numEvents = 4000, numConvs = 40)
      val table = LakeTable.create(s2, s"$dir/t", Schemas.transcript, numBuckets = 2)
      LakeCatalog.register("lake_sel", s"$dir/t")
      graft.merge.CdcMerge.apply(table, WalGen.events(s2, cfg, 0, 2000).toDF(), 0L)
      val v1 = table.currentVersion
      val rowsV1 = table.snapshot().count()
      Thread.sleep(10) // distinct commit wall-clocks for the TIMESTAMP AS OF case
      graft.merge.CdcMerge.apply(table, WalGen.events(s2, cfg, 2000, 4000).toDF(), 1L)

      // live snapshot through plain SQL — aggregation + filter on top
      val live = s2.sql("SELECT count(*) AS n FROM lake_sel").collect()(0).getLong(0)
      assert(live == table.snapshot().count())
      val oneConv = s2.sql(
        "SELECT conv_id, turn_idx, text FROM lake_sel WHERE conv_id = " +
        "(SELECT min(conv_id) FROM lake_sel) ORDER BY turn_idx").collect()
      assert(oneConv.nonEmpty)
      // VERSION AS OF reproduces the historical state
      val atV1 = s2.sql(s"SELECT count(*) AS n FROM lake_sel VERSION AS OF $v1")
        .collect()(0).getLong(0)
      assert(atV1 == rowsV1 && atV1 != live)
      // joinable like any relation
      val joined = s2.sql(
        s"""SELECT count(*) AS n FROM lake_sel cur
           |JOIN (SELECT conv_id, turn_idx FROM lake_sel VERSION AS OF $v1) old
           |USING (conv_id, turn_idx)""".stripMargin).collect()(0).getLong(0)
      assert(joined > 0 && joined <= atV1)
      // TIMESTAMP AS OF resolves through commit wall-clock: an instant
      // between the two commits reproduces v1, "now" reads the live
      // state, and a timestamp before the first commit is LOUD — never a
      // silent nearest-pick
      val lin = table.manifest.lineage
      val tV2 = lin.find(_.version == v1 + 1).get.committedAtMs
      assert(tV2 > lin.find(_.version == v1).get.committedAtMs)
      val atTs = s2.sql(
        s"SELECT count(*) AS n FROM lake_sel TIMESTAMP AS OF timestamp_millis(${tV2 - 1})")
        .collect()(0).getLong(0)
      assert(atTs == rowsV1, s"atTs=$atTs rowsV1=$rowsV1")
      val nowTs = s2.sql(
        s"SELECT count(*) AS n FROM lake_sel TIMESTAMP AS OF timestamp_millis(${System.currentTimeMillis()})")
        .collect()(0).getLong(0)
      assert(nowTs == live)
      val early = intercept[Exception](s2.sql(
        "SELECT * FROM lake_sel TIMESTAMP AS OF '2024-01-01'").collect())
      assert(early.getMessage.contains("precedes"), early.getMessage)
      // non-numeric version → loud shape error, not a parse fall-through
      val badV = intercept[Exception](s2.sql(
        "SELECT * FROM lake_sel VERSION AS OF 'abc'").collect())
      assert(badV.getMessage.contains("numeric manifest"), badV.getMessage)
      // INSERT INTO a lake table must NOT be silently resolved into a
      // snapshot READ by the select rule — it fails as an unsupported
      // write through Spark's own path
      val ins = intercept[Exception](s2.sql(
        "INSERT INTO lake_sel VALUES ('x', 0, 'user', 't', NULL, TIMESTAMP '2024-01-01 00:00:00')").collect())
      assert(!ins.getMessage.toLowerCase.contains("version as of")) // not our read path
      assert(s2.sql("SELECT count(*) FROM lake_sel").collect()(0).getLong(0) == live) // nothing written
      // MERGE INTO still owns its target when both rules are active
      WalGen.events(s2, cfg, 0, 100).toDF().createOrReplaceTempView("chg")
      val m = s2.sql(
        """MERGE INTO lake_sel USING chg
          |ON lake_sel.conv_id = chg.conv_id AND lake_sel.turn_idx = chg.turn_idx
          |WHEN MATCHED THEN UPDATE SET *
          |WHEN NOT MATCHED THEN INSERT *""".stripMargin).collect()(0)
      // resolved as the MERGE command (epoch/applied stats row), not a scan;
      // the stale LSNs it replays are shadowed by the per-key max-LSN gate
      assert(m.schema.fieldNames.toSeq == Seq("epoch", "applied", "batch_rows", "affected_buckets"))
      assert(s2.sql("SELECT count(*) FROM lake_sel").collect()(0).getLong(0) == live)
    } finally {
      LakeCatalog.unregister("lake_sel")
      SparkSession.setActiveSession(spark)
      SparkSession.setDefaultSession(spark)
      rmrf(dir)
    }
  }

  test("OPTIMIZE and VACUUM maintenance statements; ordinary SQL still parses through the delegate") {
    val dir = tmpDir("maintsql")
    spark.sparkContext
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .withExtensions(new graft.functions.GraftExtensions)
        .getOrCreate()
      val cfg = WalGen.Config(numEvents = 3000, numConvs = 30)
      val table = LakeTable.create(s2, s"$dir/t", Schemas.transcript, numBuckets = 2)
      LakeCatalog.register("lake_maint", s"$dir/t")
      (0 until 3).foreach { b =>
        graft.merge.CdcMerge.apply(table,
          WalGen.events(s2, cfg, b * 1000L, (b + 1) * 1000L).toDF(), b.toLong)
      }
      val rowsBefore = table.snapshot().count()
      assert(table.manifest.files.exists(_.kind == graft.lake.FileEntry.DELTA))

      // OPTIMIZE ... BLOOM annotates delta files (metadata-only commit)
      val vPreBloom = table.currentVersion
      val bloomed = s2.sql("OPTIMIZE lake_maint BLOOM").collect()(0)
      assert(bloomed.getInt(0) > 0, "no files bloom-annotated")
      assert(table.currentVersion == vPreBloom + 1)
      assert(table.manifest.files
        .filter(_.kind == graft.lake.FileEntry.DELTA).forall(_.bloom.isDefined))
      // idempotent re-run: nothing left to annotate
      assert(s2.sql("OPTIMIZE lake_maint BLOOM").collect()(0).getInt(0) == 0)

      // OPTIMIZE folds deltas into bases
      val opt = s2.sql("OPTIMIZE lake_maint").collect()(0)
      assert(opt.getInt(0) > 0, "no buckets compacted")
      assert(table.manifest.files.forall(_.kind == graft.lake.FileEntry.BASE))
      assert(table.snapshot().count() == rowsBefore)

      // VACUUM RETAIN 1 VERSIONS reclaims superseded files + old manifests
      // (age the files past the command's production mtime grace window)
      val old = java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - 3600000L)
      java.nio.file.Files.walk(java.nio.file.Paths.get(s"$dir/t/data"))
        .forEach(p => java.nio.file.Files.setLastModifiedTime(p, old))
      val vac = s2.sql("VACUUM lake_maint RETAIN 1 VERSIONS").collect()(0)
      assert(vac.getInt(0) > 0, "no data files reclaimed")
      assert(vac.getInt(1) > 0, "no manifests reclaimed")
      assert(table.snapshot().count() == rowsBefore)

      // unregistered name and malformed tails fail loudly
      assert(intercept[Exception](s2.sql("OPTIMIZE nope").collect())
        .getMessage.contains("not a registered lake table"))
      assert(intercept[Exception](s2.sql("VACUUM lake_maint RETAIN VERSIONS").collect())
        .getMessage.contains("expected: VACUUM"))
      // DESCRIBE HISTORY: lineage newest-first, LIMIT honored, commit
      // rows/buckets populated; plain DESCRIBE still reaches Spark
      val hist = s2.sql("DESCRIBE HISTORY lake_maint").collect()
      assert(hist.length >= 4, s"expected >=4 commits, got ${hist.length}") // 3 merges + compaction
      assert(hist.map(_.getLong(0)).toSeq == hist.map(_.getLong(0)).toSeq.sortBy(-_), "not newest-first")
      assert(hist.exists(_.getLong(3) > 0), "no batch_rows recorded")
      assert(hist.forall(_.getTimestamp(1).getTime > 0))
      assert(s2.sql("DESC HISTORY lake_maint LIMIT 2").collect().length == 2)
      // an UNREGISTERED name DELEGATES to Spark instead of dying on our
      // grammar: `DESCRIBE HISTORY nope` is also Spark's column-describe
      // of a table named history — once such a table exists it must work
      val eh = intercept[Exception](s2.sql("DESCRIBE HISTORY nope").collect())
      assert(!eh.getMessage.contains("not a registered lake table"), eh.getMessage)
      s2.sql("SELECT 1 AS nope").createOrReplaceTempView("history")
      assert(s2.sql("DESCRIBE HISTORY nope").collect().nonEmpty) // Spark column describe
      s2.catalog.dropTempView("history")
      // a Spark table literally named `history` still describes through
      // Spark's own grammar — DESCRIBE only becomes ours on the full
      // HISTORY <registered name> form
      s2.sql("SELECT 1 AS a").createOrReplaceTempView("history")
      assert(s2.sql("DESCRIBE history").collect().nonEmpty)
      // everything else still parses through Spark's own grammar
      assert(s2.sql("SELECT 1 + 1 AS two").collect()(0).getInt(0) == 2)
      assert(s2.sql("SELECT count(*) FROM lake_maint").collect()(0).getLong(0) == rowsBefore)
      // leading comments must not hide the statement from the recognizer
      val commented = s2.sql("-- nightly maintenance\n/* run by scheduler */\nOPTIMIZE lake_maint")
        .collect()(0)
      assert(commented.schema.fieldNames.contains("buckets_compacted"))
      // an ALIASED merge target still resolves as MERGE (loud shape
      // validation), not as a snapshot scan slipped under the select rule
      WalGen.events(s2, cfg, 0, 50).toDF().createOrReplaceTempView("chg2")
      val aliased = intercept[Exception](s2.sql(
        """MERGE INTO lake_maint AS t USING chg2
          |ON t.conv_id = chg2.conv_id
          |WHEN MATCHED THEN UPDATE SET *
          |WHEN NOT MATCHED THEN INSERT *""".stripMargin).collect())
      assert(aliased.getMessage.contains("key columns"), aliased.getMessage)
      val aliasedOk = s2.sql(
        """MERGE INTO lake_maint AS t USING chg2
          |ON t.conv_id = chg2.conv_id AND t.turn_idx = chg2.turn_idx
          |WHEN MATCHED THEN UPDATE SET *
          |WHEN NOT MATCHED THEN INSERT *""".stripMargin).collect()(0)
      assert(aliasedOk.schema.fieldNames.contains("applied"))
    } finally {
      LakeCatalog.unregister("lake_maint")
      SparkSession.setActiveSession(spark)
      SparkSession.setDefaultSession(spark)
      rmrf(dir)
    }
  }

  test("shared SQL catalog: a registration published by one session resolves in a SECOND session via the published index") {
    val dir = tmpDir("sharedcat")
    spark.sparkContext
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val catRoot = s"$dir/catalog"
      val s2 = SparkSession.builder()
        .withExtensions(new graft.functions.GraftExtensions)
        .config(LakeCatalog.ROOT_CONF, catRoot)
        .getOrCreate()
      val cfg = WalGen.Config(numEvents = 2000, numConvs = 20)
      val table = LakeTable.create(s2, s"$dir/t", Schemas.transcript, numBuckets = 2)
      graft.merge.CdcMerge.apply(table, WalGen.events(s2, cfg, 0, 2000).toDF(), 0L)
      // durable registration: lands in the published index, NOT the
      // process-local map
      LakeCatalog.register(s2, "shared_convs", s"$dir/t")
      assert(LakeCatalog.lookup("shared_convs").isEmpty, "must not be a local registration")

      // a SECOND session — fresh extensions instance (rules + parser),
      // same catalog root — resolves SELECT, time travel, MERGE, and
      // maintenance SQL on the published name
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      val s3 = SparkSession.builder()
        .withExtensions(new graft.functions.GraftExtensions)
        .config(LakeCatalog.ROOT_CONF, catRoot)
        .getOrCreate()
      val live = table.snapshot().count()
      assert(s3.sql("SELECT count(*) FROM shared_convs").collect()(0).getLong(0) == live)
      WalGen.events(s3, cfg, 0, 100).toDF().createOrReplaceTempView("chg")
      val m = s3.sql(
        """MERGE INTO shared_convs USING chg
          |ON shared_convs.conv_id = chg.conv_id AND shared_convs.turn_idx = chg.turn_idx
          |WHEN MATCHED THEN UPDATE SET *
          |WHEN NOT MATCHED THEN INSERT *""".stripMargin).collect()(0)
      assert(m.schema.fieldNames.contains("applied"))
      assert(s3.sql("OPTIMIZE shared_convs").collect()(0)
        .schema.fieldNames.contains("buckets_compacted"))
      // a DIRECTORY re-publish of the same root must CARRY the synthetic
      // "sql" channel — not wipe the durable registration it cannot
      // rediscover from disk
      new graft.ops.Catalog(s3, catRoot).publish()
      assert(s3.sql("SELECT count(*) FROM shared_convs").collect()(0).getLong(0) >= live)
      // a session WITHOUT the catalog root does NOT see the name
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      val s4 = SparkSession.builder()
        .withExtensions(new graft.functions.GraftExtensions)
        .config(LakeCatalog.ROOT_CONF, "")
        .getOrCreate()
      intercept[Exception](s4.sql("SELECT count(*) FROM shared_convs").collect())
      // durable unregister from the OTHER session removes the name for all
      LakeCatalog.unregister(s3, "shared_convs")
      intercept[Exception](s3.sql("SELECT count(*) FROM shared_convs").collect())
    } finally {
      SparkSession.setActiveSession(spark)
      SparkSession.setDefaultSession(spark)
      rmrf(dir)
    }
  }

  test("RESTORE TABLE statement, lake_changes TVF, and DESCRIBE HISTORY op column") {
    val dir = tmpDir("restoresql")
    spark.sparkContext
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .withExtensions(new graft.functions.GraftExtensions)
        .getOrCreate()
      val cfg = WalGen.Config(numEvents = 4000, numConvs = 40)
      val table = LakeTable.create(s2, s"$dir/t", Schemas.transcript, numBuckets = 2)
      LakeCatalog.register("lake_rest", s"$dir/t")
      graft.merge.CdcMerge.apply(table, WalGen.events(s2, cfg, 0, 2000).toDF(), 0L)
      val v1 = table.currentVersion
      val rowsV1 = table.snapshot().count()
      Thread.sleep(10)
      graft.merge.CdcMerge.apply(table, WalGen.events(s2, cfg, 2000, 4000).toDF(), 1L)
      val v2 = table.currentVersion
      val rowsV2 = table.snapshot().count()

      // changelog TVF: (0, v1] = batch-0 deltas; joins/aggregates like any relation
      val ch1 = s2.sql(s"SELECT count(*) AS n FROM lake_changes('lake_rest', 0, $v1)")
        .collect()(0).getLong(0)
      assert(ch1 > 0)
      val tomb = s2.sql(
        s"SELECT count(*) AS n FROM lake_changes('lake_rest', 0, $v2) WHERE _deleted")
        .collect()(0).getLong(0)
      assert(tomb > 0) // tombstones surface as _deleted rows
      // 2-arg form defaults toVersion to the current version
      assert(s2.sql(s"SELECT count(*) AS n FROM lake_changes('lake_rest', 0)")
        .collect()(0).getLong(0) ==
        s2.sql(s"SELECT count(*) AS n FROM lake_changes('lake_rest', 0, $v2)")
          .collect()(0).getLong(0))
      val unknown = intercept[Exception](
        s2.sql("SELECT * FROM lake_changes('nope', 0)").collect())
      assert(unknown.getMessage.contains("not a registered"), unknown.getMessage)

      // RESTORE ... VERSION AS OF: rolls back as a NEW commit
      val res = s2.sql(s"RESTORE TABLE lake_rest TO VERSION AS OF $v1").collect()(0)
      assert(res.getLong(0) == v1 && res.getLong(1) == v2 + 1)
      assert(s2.sql("SELECT count(*) FROM lake_rest").collect()(0).getLong(0) == rowsV1)
      // pre-restore state still time-travelable through SQL
      assert(s2.sql(s"SELECT count(*) FROM lake_rest VERSION AS OF $v2")
        .collect()(0).getLong(0) == rowsV2)
      // DESCRIBE HISTORY marks the restore
      val hist = s2.sql("DESCRIBE HISTORY lake_rest LIMIT 1").collect()(0)
      assert(hist.getLong(hist.fieldIndex("version")) == v2 + 1)
      assert(hist.getString(hist.fieldIndex("op")) == "restore")
      // a changelog range crossing the restore is refused loudly
      val cross = intercept[Exception](
        s2.sql(s"SELECT * FROM lake_changes('lake_rest', $v2)").collect())
      assert(cross.getMessage.contains("RESTORE"), cross.getMessage)

      // RESTORE ... TIMESTAMP AS OF resolves through commit wall-clock:
      // an instant just before v2's commit restores v1's state again
      graft.merge.CdcMerge.apply(table, WalGen.events(s2, cfg, 2000, 4000).toDF(), 2L)
      assert(s2.sql("SELECT count(*) FROM lake_rest").collect()(0).getLong(0) == rowsV2)
      val tV2 = table.manifest.lineage.find(_.version == v2).get.committedAtMs
      s2.sql(s"RESTORE lake_rest TIMESTAMP AS OF timestamp_millis(${tV2 - 1})").collect()
      assert(s2.sql("SELECT count(*) FROM lake_rest").collect()(0).getLong(0) == rowsV1)

      // malformed / unknown-table forms fail with the expected shapes
      val badV = intercept[Exception](s2.sql("RESTORE lake_rest VERSION AS OF abc").collect())
      assert(badV.getMessage.contains("numeric"), badV.getMessage)
      val noTable = intercept[Exception](s2.sql("RESTORE nope VERSION AS OF 1").collect())
      assert(noTable.getMessage.contains("not a registered"), noTable.getMessage)
    } finally {
      LakeCatalog.unregister("lake_rest")
      SparkSession.setActiveSession(spark)
      SparkSession.setDefaultSession(spark)
      rmrf(dir)
    }
  }
}
