package graft

import org.apache.spark.sql.functions._
import graft.gen.WalGen
import graft.lake.LakeTable
import graft.stream.{CdcEnvelope, CdcStream}
import graft.model.Schemas

/** The JSON envelope tail: Debezium-format lines (with interleaved garbage)
  * streamed through startEnvelope reconverge to the WalGen oracle, garbage
  * lands in the DLQ with reasons, and the no-DLQ mode fails the stream
  * loudly instead of dropping records.
  */
class StreamEnvelopeSpec extends SparkSpec {
  import spark.implicits._

  private val tsOpts = Map(
    "timestampFormat" -> "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX",
    "timestampNTZFormat" -> "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")

  /** WalGen WAL as Debezium JSON lines (op I/U/D → c/u/d, delete image in
    * before), written as `chunks` text files with `garbage` junk lines.
    */
  private def writeDebeziumWal(dir: String, cfg: WalGen.Config, chunks: Int, garbage: Int): Unit = {
    val ev = WalGen.events(spark, cfg, 0, cfg.numEvents).toDF()
    val img = struct(col("conv_id"), col("turn_idx"), col("role"), col("text"), col("tool"), col("ts"))
    val opRaw = when(col("op") === "I", "c").when(col("op") === "U", "u").otherwise("d")
    val env = to_json(struct(
      when(opRaw === "d", img).as("before"),
      when(opRaw =!= "d", img).as("after"),
      struct(col("lsn").as("lsn")).as("source"),
      opRaw.as("op"), lit(1700000000000L).as("ts_ms")), tsOpts)
    val junk = spark.range(garbage.toLong).select(concat(lit("junk line #"), col("id")).as("value"))
    ev.select(env.as("value")).unionAll(junk)
      .repartition(chunks).write.mode("overwrite").text(dir)
  }

  test("debezium JSON tail reconverges to oracle; garbage goes to the DLQ") {
    val dir = tmpDir("envstream")
    val cfg = WalGen.Config(numEvents = 8000, numConvs = 100, maxTurns = 20)
    try {
      writeDebeziumWal(s"$dir/wal", cfg, chunks = 6, garbage = 17)
      val table = LakeTable.create(spark, s"$dir/t", Schemas.transcript, numBuckets = 4)
      val q = CdcStream.startEnvelope(spark, s"$dir/wal", table, s"$dir/ckpt",
        dlqDir = Some(s"$dir/dlq"), maxFilesPerTrigger = 2)
      try q.awaitTermination() finally if (q.isActive) q.stop()

      val oracle = WalGen.oracleState(cfg).toSeq.sortBy { case ((c, t), _) => (c, t) }
      val got = table.snapshot().orderBy("conv_id", "turn_idx")
        .select("conv_id", "turn_idx", "text", "role", "tool").collect()
      assert(got.length == oracle.size, s"rows: ${got.length} vs oracle ${oracle.size}")
      got.zip(oracle).foreach { case (r, ((c, t), e)) =>
        assert(r.getString(0) == c && r.getInt(1) == t && r.getString(2) == e.text,
          s"mismatch at ($c,$t)")
      }

      val dlq = spark.read.parquet(s"$dir/dlq")
      assert(dlq.columns.toSet == Set("record", "error", "epoch"))
      // at-least-once: dedup on (epoch, record) like a reader would
      val junkRows = dlq.select("record", "error").distinct().collect()
      assert(junkRows.length == 17)
      assert(junkRows.forall(_.getString(1) == "unparseable_json"))
    } finally rmrf(dir)
  }

  test("no DLQ configured: malformed input fails the stream loudly") {
    val dir = tmpDir("envstream-strict")
    val cfg = WalGen.Config(numEvents = 500, numConvs = 20)
    try {
      writeDebeziumWal(s"$dir/wal", cfg, chunks = 1, garbage = 1)
      val table = LakeTable.create(spark, s"$dir/t", Schemas.transcript, numBuckets = 2)
      val q = CdcStream.startEnvelope(spark, s"$dir/wal", table, s"$dir/ckpt",
        dlqDir = None)
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        try q.awaitTermination() finally if (q.isActive) q.stop()
      }
      def causes(t: Throwable): Seq[Throwable] =
        if (t == null) Nil else t +: causes(t.getCause)
      assert(causes(e).exists(_.getMessage != null) &&
        causes(e).exists(c => c.getMessage != null && c.getMessage.contains("no DLQ configured")))
    } finally rmrf(dir)
  }

  test("cutover gate on the envelope tail drops pre-snapshot deliveries") {
    val dir = tmpDir("envstream-cutover")
    val cfg = WalGen.Config(numEvents = 2000, numConvs = 40)
    try {
      writeDebeziumWal(s"$dir/wal", cfg, chunks = 2, garbage = 0)
      // bootstrap at S from the WAL itself, then tail the SAME full WAL
      val s0 = 1200L
      val snap = graft.merge.CdcMerge.dedupMaxLsn(
        WalGen.events(spark, cfg, 0, cfg.numEvents).toDF().filter(col("lsn") <= s0))
        .filter(col("op") =!= "D").drop("op")
      val table = LakeTable.create(spark, s"$dir/t", Schemas.transcript, numBuckets = 4)
      graft.merge.Bootstrap.load(table, snap, snapshotLsn = s0)
      val q = CdcStream.startEnvelope(spark, s"$dir/wal", table, s"$dir/ckpt",
        dlqDir = Some(s"$dir/dlq"), cutoverLsn = Some(s0))
      try q.awaitTermination() finally if (q.isActive) q.stop()
      val oracle = WalGen.oracleState(cfg)
      assert(table.snapshot().count() == oracle.size)
      val got = table.snapshot().select("conv_id", "turn_idx", "text").collect()
        .map(r => ((r.getString(0), r.getInt(1)), r.getString(2))).toMap
      assert(oracle.forall { case (k, e) => got.get(k).contains(e.text) })
    } finally rmrf(dir)
  }

  test("verifyCutoverContiguity: a tail starting past the snapshot fails; a contiguous one passes") {
    val dir = tmpDir("envstream-gap")
    val cfg = WalGen.Config(numEvents = 1500, numConvs = 30)
    try {
      val s0 = 600L
      def bootstrapAt(t: String): LakeTable = {
        val snap = graft.merge.CdcMerge.dedupMaxLsn(
          WalGen.events(spark, cfg, 0, cfg.numEvents).toDF().filter(col("lsn") <= s0))
          .filter(col("op") =!= "D").drop("op")
        val table = LakeTable.create(spark, t, Schemas.transcript, numBuckets = 2)
        graft.merge.Bootstrap.load(table, snap, snapshotLsn = s0)
        table
      }
      // gapped tail: events (s0, s0+200] are missing — silent loss without the check
      val gapped = WalGen.events(spark, cfg, 0, cfg.numEvents).toDF()
        .filter(col("lsn") > s0 + 200)
      val img = struct(col("conv_id"), col("turn_idx"), col("role"), col("text"), col("tool"), col("ts"))
      val opRaw = when(col("op") === "I", "c").when(col("op") === "U", "u").otherwise("d")
      def asDebezium(df: org.apache.spark.sql.DataFrame) = df.select(to_json(struct(
        when(opRaw === "d", img).as("before"),
        when(opRaw =!= "d", img).as("after"),
        struct(col("lsn").as("lsn")).as("source"),
        opRaw.as("op"), lit(1700000000000L).as("ts_ms")), tsOpts).as("value"))
      asDebezium(gapped).repartition(1).write.mode("overwrite").text(s"$dir/walgap")
      val t1 = bootstrapAt(s"$dir/t1")
      val q1 = CdcStream.startEnvelope(spark, s"$dir/walgap", t1, s"$dir/ckpt1",
        dlqDir = Some(s"$dir/dlq1"), cutoverLsn = Some(s0), verifyCutoverContiguity = true)
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        try q1.awaitTermination() finally if (q1.isActive) q1.stop()
      }
      def causes(t: Throwable): Seq[Throwable] = if (t == null) Nil else t +: causes(t.getCause)
      assert(causes(e).exists(c => c.getMessage != null && c.getMessage.contains("cutover gap")))

      // contiguous tail (full replay): the check passes and state reconverges
      asDebezium(WalGen.events(spark, cfg, 0, cfg.numEvents).toDF())
        .repartition(2).write.mode("overwrite").text(s"$dir/walfull")
      val t2 = bootstrapAt(s"$dir/t2")
      val q2 = CdcStream.startEnvelope(spark, s"$dir/walfull", t2, s"$dir/ckpt2",
        dlqDir = Some(s"$dir/dlq2"), cutoverLsn = Some(s0), verifyCutoverContiguity = true)
      try q2.awaitTermination() finally if (q2.isActive) q2.stop()
      assert(t2.snapshot().count() == WalGen.oracleState(cfg).size)

      // a batch MIXING pre-snapshot redeliveries with post-gap events must
      // still fail: the check runs on the GATED rows, so the redeliveries'
      // low min cannot mask the gap (regression: the pre-fix check took
      // min over the ungated batch and passed here, losing (600, 800]
      // silently)
      val mixed = WalGen.events(spark, cfg, 0, cfg.numEvents).toDF()
        .filter(col("lsn") <= s0 || col("lsn") > s0 + 200)
      asDebezium(mixed).repartition(1).write.mode("overwrite").text(s"$dir/walmix")
      val t3 = bootstrapAt(s"$dir/t3")
      val q3 = CdcStream.startEnvelope(spark, s"$dir/walmix", t3, s"$dir/ckpt3",
        dlqDir = Some(s"$dir/dlq3"), cutoverLsn = Some(s0), verifyCutoverContiguity = true)
      val e3 = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        try q3.awaitTermination() finally if (q3.isActive) q3.stop()
      }
      assert(causes(e3).exists(c => c.getMessage != null && c.getMessage.contains("cutover gap")))
    } finally rmrf(dir)
  }
}
