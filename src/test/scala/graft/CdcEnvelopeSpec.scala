package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.lake.LakeTable
import graft.merge.CdcMerge
import graft.model.Schemas
import graft.stream.CdcEnvelope

/** Debezium/Maxwell envelope decoding: op mapping, ordering-token
  * extraction, the dead-letter taxonomy (every malformed shape lands in the
  * DLQ with the right reason, never throws, never silently drops), and an
  * end-to-end decode → CdcMerge apply that reconverges to the expected
  * table state.
  */
class CdcEnvelopeSpec extends SparkSpec {
  import spark.implicits._

  private val payload = Schemas.transcript
  private val keys = Schemas.KEY_COLS

  private def dbz(op: String, lsn: Long, before: String, after: String): String =
    s"""{"before":$before,"after":$after,"source":{"version":"2.5.0","connector":"postgresql","db":"conv","lsn":$lsn},"op":"$op","ts_ms":1700000000000}"""

  private def row(conv: String, turn: Int, text: String): String =
    s"""{"conv_id":"$conv","turn_idx":$turn,"role":"user","text":"$text","tool":null,"ts":"2024-03-01 10:00:00"}"""

  test("debezium: op mapping, image selection, lsn extraction") {
    val envs = Seq(
      dbz("c", 10, "null", row("c1", 0, "hello")),
      dbz("r", 11, "null", row("c2", 0, "snapshot read")),
      dbz("u", 12, row("c1", 0, "hello"), row("c1", 0, "hello v2")),
      dbz("d", 13, row("c2", 0, "snapshot read"), "null")
    ).toDF("j")
    val out = CdcEnvelope.decodeDebezium(envs, "j", payload, keys)
    assert(out.filter(col(CdcEnvelope.ERROR_COL).isNotNull).count() == 0)
    val got = CdcEnvelope.good(out, "j")
      .select("op", "lsn", "conv_id", "turn_idx", "text")
      .orderBy("lsn").collect().map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getInt(3), r.getString(4)))
    assert(got.toSeq == Seq(
      ("I", 10L, "c1", 0, "hello"),
      ("I", 11L, "c2", 0, "snapshot read"),
      ("U", 12L, "c1", 0, "hello v2"),
      ("D", 13L, "c2", 0, "snapshot read") // delete image = before
    ))
    // payload columns parse to the declared types
    val sch = CdcEnvelope.good(out, "j").schema
    assert(sch("ts").dataType == TimestampType && sch("turn_idx").dataType == IntegerType)
  }

  test("debezium: dead-letter taxonomy, one reason per malformed shape") {
    val envs = Seq(
      "this is not json",                                             // unparseable_json
      "null",                                                         // JSON null literal → unparseable_json
      "[1,2,3]",                                                      // non-object → unparseable_json
      s"""{"before":null,"after":${row("c1", 0, "x")},"source":{"lsn":1},"ts_ms":1}""",  // missing_op
      dbz("t", 2, "null", "null"),                                    // truncate → unsupported_op:t
      s"""{"before":null,"after":${row("c1", 0, "x")},"source":{},"op":"c","ts_ms":1}""", // missing_lsn
      dbz("d", 3, "null", "null"),                                    // delete without before → missing_payload
      dbz("c", 4, "null", "null"),                                    // insert without after → missing_payload
      dbz("c", 5, "null", """{"conv_id":null,"turn_idx":0,"role":"u","text":"x","tool":null,"ts":"2024-03-01 10:00:00"}"""), // missing_key:conv_id
      dbz("c", 6, "null", """{"conv_id":"c9","turn_idx":null,"role":"u","text":"x","tool":null,"ts":"2024-03-01 10:00:00"}"""), // missing_key:turn_idx
      null                                                            // null_record
    ).toDF("j")
    val out = CdcEnvelope.decodeDebezium(envs, "j", payload, keys)
    assert(CdcEnvelope.good(out, "j").count() == 0)
    val dlq = CdcEnvelope.deadLetters(out, "j").as[(String, String)].collect().toSeq
    val reasons = dlq.map(_._2)
    assert(reasons == Seq(
      "unparseable_json", "unparseable_json", "unparseable_json",
      "missing_op", "unsupported_op:t", "missing_lsn",
      "missing_payload", "missing_payload",
      "missing_key:conv_id", "missing_key:turn_idx", "null_record"))
    // DLQ keeps the raw record for re-drive (null record stays null)
    assert(dlq.head._1 == "this is not json" && dlq.last._1 == null)
  }

  test("debezium: alternate lsn field (mysql pos)") {
    val env = Seq(
      s"""{"before":null,"after":${row("c1", 0, "x")},"source":{"file":"binlog.000002","pos":4711},"op":"c","ts_ms":1}"""
    ).toDF("j")
    val out = CdcEnvelope.decodeDebezium(env, "j", payload, keys, lsnField = "pos")
    val g = CdcEnvelope.good(out, "j").select("lsn").as[Long].collect()
    assert(g.toSeq == Seq(4711L))
  }

  private def mxw(typ: String, xid: java.lang.Long, data: String, xoffset: java.lang.Long = null): String = {
    val xo = if (xoffset == null) "" else s""","xoffset":$xoffset"""
    val xi = if (xid == null) "" else s""","xid":$xid"""
    s"""{"database":"conv","table":"transcripts","type":"$typ","ts":1700000000$xi$xo,"data":$data}"""
  }

  test("maxwell: op mapping, xid lsn, data image for all ops") {
    val envs = Seq(
      mxw("insert", 100L, row("m1", 0, "hi")),
      mxw("bootstrap-insert", 101L, row("m2", 0, "boot")),
      mxw("update", 102L, row("m1", 0, "hi v2")),
      mxw("delete", 103L, row("m2", 0, "boot"))
    ).toDF("j")
    val out = CdcEnvelope.decodeMaxwell(envs, "j", payload, keys)
    val got = CdcEnvelope.good(out, "j").select("op", "lsn", "conv_id", "text")
      .orderBy("lsn").collect().map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getString(3)))
    assert(got.toSeq == Seq(
      ("I", 100L, "m1", "hi"), ("I", 101L, "m2", "boot"),
      ("U", 102L, "m1", "hi v2"), ("D", 103L, "m2", "boot")))
  }

  test("maxwell: dead letters — ddl type, missing xid, xoffset overflow") {
    val envs = Seq(
      s"""{"database":"conv","table":"t","type":"table-create","ts":1,"xid":1,"data":null}""",
      mxw("insert", null, row("m1", 0, "x")),
      mxw("insert", 5L, row("m1", 0, "x"), xoffset = (1L << 20))
    ).toDF("j")
    val out = CdcEnvelope.decodeMaxwell(envs, "j", payload, keys, xoffsetAware = true)
    val reasons = CdcEnvelope.deadLetters(out, "j").select("error").as[String].collect().toSeq
    assert(reasons == Seq("unsupported_op:table-create", "missing_lsn", "missing_lsn"))
  }

  test("maxwell: xoffsetAware composes a total intra-transaction order") {
    val envs = Seq(
      mxw("insert", 7L, row("m1", 0, "a"), xoffset = 0L),
      mxw("update", 7L, row("m1", 0, "b"), xoffset = 1L),
      mxw("insert", 8L, row("m1", 1, "c")) // no xoffset → offset 0
    ).toDF("j")
    val out = CdcEnvelope.decodeMaxwell(envs, "j", payload, keys, xoffsetAware = true)
    val lsns = CdcEnvelope.good(out, "j").select("lsn").as[Long].collect().sorted.toSeq
    assert(lsns == Seq(7L * (1L << 20), 7L * (1L << 20) + 1, 8L * (1L << 20)))
  }

  test("end-to-end: debezium stream with dups and interleaved garbage applies to the lake") {
    val dir = tmpDir("lake-env")
    try {
      val envs = Seq(
        dbz("c", 1, "null", row("e1", 0, "v1")),
        "garbage{{{",
        dbz("u", 3, row("e1", 0, "v1"), row("e1", 0, "v3")),
        dbz("u", 2, row("e1", 0, "v1"), row("e1", 0, "v2")), // reordered: loses to lsn 3
        dbz("u", 3, row("e1", 0, "v1"), row("e1", 0, "v3")), // duplicate delivery
        dbz("c", 4, "null", row("e2", 0, "w1")),
        dbz("d", 5, row("e2", 0, "w1"), "null")
      ).toDF("j")
      val annotated = CdcEnvelope.decodeDebezium(envs, "j", payload, keys)
      assert(CdcEnvelope.deadLetters(annotated, "j").count() == 1)
      val batch = CdcEnvelope.good(annotated, "j")
        .select(Schemas.changeEvent.fieldNames.map(col).toIndexedSeq: _*)
      val table = LakeTable.create(spark, dir, Schemas.transcript, numBuckets = 4)
      CdcMerge(table, batch, epoch = 0L, mode = CdcMerge.MergeOnRead)
      val got = table.snapshot().select("conv_id", "turn_idx", "text")
        .orderBy("conv_id", "turn_idx").collect().map(r => (r.getString(0), r.getInt(1), r.getString(2)))
      assert(got.toSeq == Seq(("e1", 0, "v3"))) // e2 deleted, lsn-3 text wins
    } finally rmrf(dir)
  }

  test("input column colliding with decoder output is rejected loudly") {
    val df = Seq(("x", "I")).toDF("j", "op")
    val e = intercept[IllegalArgumentException] {
      CdcEnvelope.decodeDebezium(df, "j", payload, keys)
    }
    assert(e.getMessage.contains("collide"))
  }
}
