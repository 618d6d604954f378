package graft.stream

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Decoders for the standard CDC envelope formats a binlog/WAL tail actually
  * delivers — Debezium and Maxwell JSON — into the engine's change-event
  * shape `(op: I|U|D, lsn: long, <payload columns>)` (see
  * [[graft.model.Schemas.changeEvent]]).
  *
  * Reference analogue: owid-etl detects upstream change by re-checksumming
  * snapshot inputs (`etl/snapshot.py`, `etl/files.py` checksum walk) and has
  * no row-level change format of its own; a CDC engine replacing that loop
  * must speak the formats real log-tailing connectors emit. Both decoders
  * are pure Catalyst expressions (`from_json` + conditional projection) —
  * no UDF, codegen-friendly, and therefore safe on the 10^10-event hot path.
  *
  * == Dead-letter contract ==
  *
  * Malformed records are never dropped silently and never fail the stream:
  * every input row comes back with an `_error` column (null = decodable).
  * `good()` / `deadLetters()` split the annotated frame; the dead-letter
  * side keeps the raw record so it can be re-driven after a fix. Error
  * taxonomy (first failing check wins, checked in this order):
  *
  *   - `null_record`       — the envelope column itself is SQL null (e.g. a
  *                           Kafka value tombstone)
  *   - `unparseable_json`  — not valid JSON / not a JSON object
  *   - `missing_op`        — envelope parses but carries no op/type field
  *   - `unsupported_op:<x>`— op outside the decoder's mapping (e.g. Debezium
  *                           `t` truncate, Maxwell `table-create` DDL)
  *   - `missing_lsn`       — no usable ordering token (see below)
  *   - `missing_payload`   — the row image the op requires is absent
  *                           (Debezium delete without `before`, insert
  *                           without `after`, …)
  *   - `missing_key:<col>` — the row image is present but a key column the
  *                           caller named is null
  *
  * == Ordering tokens ==
  *
  * Debezium: `source.<lsnField>` (default `lsn`, the Postgres WAL LSN; MySQL
  * deployments should pass `lsnField = "pos"`... any integral field of
  * `source` works). Maxwell: `xid` — Maxwell has no total order within a
  * transaction, so all rows of one transaction share an LSN and the engine's
  * deterministic same-LSN tie-break applies (documented in
  * `lake/LakeTable.scala:82-97`); callers needing strict intra-txn order
  * must enable Maxwell's `output_xoffset` and pass `xoffsetAware = true`,
  * which forms `lsn = xid * 2^20 + xoffset` (Maxwell caps row batches well
  * below 2^20 rows per txn; values ≥ 2^20 are rejected as `missing_lsn`).
  *
  * Timestamps in the payload must be ISO-8601/`yyyy-MM-dd HH:mm:ss[.SSSSSS]`
  * strings (Debezium `TemporalPrecisionMode=isostring` / Maxwell default);
  * epoch-integer temporal converters need a pre-mapping, which is loudly
  * NOT performed here — a silent epoch-vs-ISO guess corrupts data quietly.
  */
object CdcEnvelope {

  val ERROR_COL = "_error"
  private val RESERVED = Seq("op", "lsn", ERROR_COL, "__parsed")

  /** Corrupt-record capture field inside the parsed envelope struct.
    * `from_json` in PERMISSIVE mode does NOT return a null struct on
    * malformed input — it returns all-null fields and writes the raw text
    * here (verified against Spark 4.1); this is the only reliable
    * malformed-vs-empty-envelope discriminator.
    */
  private val CORRUPT = "_corrupt"
  private val parseOpts = Map("columnNameOfCorruptRecord" -> CORRUPT)

  /** Spark schema of a Debezium envelope carrying `payload`-shaped rows.
    * `sourceFields` lists the integral fields of `source` the caller may
    * use as ordering tokens (only those are parsed; the rest of `source`
    * is connector-specific and skipped by the JSON parser).
    */
  def debeziumSchema(payload: StructType, sourceFields: Seq[String]): StructType =
    StructType(Seq(
      StructField("before", payload),
      StructField("after", payload),
      StructField("source", StructType(sourceFields.map(f => StructField(f, LongType)))),
      StructField("op", StringType),
      StructField("ts_ms", LongType),
      StructField(CORRUPT, StringType)
    ))

  /** Maxwell envelope schema (https://maxwells-daemon.io/dataformat/). */
  def maxwellSchema(payload: StructType): StructType =
    StructType(Seq(
      StructField("database", StringType),
      StructField("table", StringType),
      StructField("type", StringType),
      StructField("ts", LongType),
      StructField("xid", LongType),
      StructField("xoffset", LongType),
      StructField("commit", BooleanType),
      StructField("data", payload),
      StructField("old", payload),
      StructField(CORRUPT, StringType)
    ))

  private def requireNoCollision(df: DataFrame, payload: StructType, jsonCol: String): Unit = {
    val out = RESERVED ++ payload.fieldNames
    val clash = df.columns.filter(c => c != jsonCol && out.contains(c))
    require(clash.isEmpty,
      s"input columns ${clash.mkString(", ")} collide with decoder output columns; rename them first")
    require(!payload.fieldNames.contains(CORRUPT),
      s"payload column $CORRUPT collides with the corrupt-record capture field")
  }

  /** Shared tail of both decoders: given per-format (opRaw → I|U|D mapping,
    * lsn, image) columns — all written against `col("__parsed")` — emit the
    * annotated output frame. The envelope is parsed ONCE into a materialized
    * `__parsed` column; every derived column reads struct fields off it
    * (whole-stage codegen subexpression elimination then shares even those),
    * so cost is one JSON parse per row regardless of payload width.
    * `when` chains evaluate in order and a null condition is false, so
    * null-guards precede value checks.
    */
  private def assemble(df: DataFrame, jsonCol: String, payload: StructType,
                       keyCols: Seq[String], parsedExpr: Column, opRaw: Column,
                       opMapped: Column, lsn: Column, image: Column,
                       lsnErr: Column): DataFrame = {
    val missingKey = keyCols.foldLeft(lit(null).cast(StringType)) { (acc, k) =>
      require(payload.fieldNames.contains(k), s"key column $k not in payload schema")
      coalesce(acc, when(image.getField(k).isNull, s"missing_key:$k"))
    }
    val err =
      when(col(jsonCol).isNull, "null_record")
        .when(col("__parsed").getField(CORRUPT).isNotNull, "unparseable_json")
        .when(opRaw.isNull, "missing_op")
        .when(opMapped.isNull, concat(lit("unsupported_op:"), opRaw))
        .when(lsnErr.isNotNull, lsnErr)
        .when(image.isNull, "missing_payload")
        .otherwise(missingKey)

    val payloadCols = payload.fields.toSeq.map(f => image.getField(f.name).as(f.name))
    df.withColumn("__parsed", parsedExpr).select(
      (df.columns.map(col).toSeq ++
        Seq(opMapped.as("op"), lsn.cast(LongType).as("lsn")) ++
        payloadCols :+ err.as(ERROR_COL)): _*)
  }

  /** Decode Debezium-format envelopes in `df(jsonCol)`. Ops: `c`/`r`
    * (create / snapshot read) → I, `u` → U, `d` → D; the delete image is
    * `before`, all others `after`.
    */
  def decodeDebezium(df: DataFrame, jsonCol: String, payload: StructType,
                     keyCols: Seq[String], lsnField: String = "lsn"): DataFrame = {
    requireNoCollision(df, payload, jsonCol)
    val schema = debeziumSchema(payload, Seq(lsnField))
    val parsed0 = from_json(col(jsonCol), schema, parseOpts)
    val parsed = col("__parsed")
    val opRaw = parsed.getField("op")
    val opMapped = when(opRaw.isin("c", "r"), "I")
      .when(opRaw === "u", "U")
      .when(opRaw === "d", "D")
    val lsn = parsed.getField("source").getField(lsnField)
    val image = when(opRaw === "d", parsed.getField("before"))
      .otherwise(parsed.getField("after"))
    assemble(df, jsonCol, payload, keyCols, parsed0, opRaw, opMapped, lsn, image,
      lsnErr = when(lsn.isNull, "missing_lsn"))
  }

  /** Decode Maxwell-format envelopes. Ops: `insert`/`bootstrap-insert` → I,
    * `update` → U, `delete` → D (Maxwell's `data` holds the full row image
    * for all three; `old` only carries pre-update values of changed columns
    * and is not needed for latest-wins apply).
    */
  def decodeMaxwell(df: DataFrame, jsonCol: String, payload: StructType,
                    keyCols: Seq[String], xoffsetAware: Boolean = false): DataFrame = {
    requireNoCollision(df, payload, jsonCol)
    val schema = maxwellSchema(payload)
    val parsed0 = from_json(col(jsonCol), schema, parseOpts)
    val parsed = col("__parsed")
    val opRaw = parsed.getField("type")
    val opMapped = when(opRaw.isin("insert", "bootstrap-insert"), "I")
      .when(opRaw === "update", "U")
      .when(opRaw === "delete", "D")
    val xid = parsed.getField("xid")
    val xoff = parsed.getField("xoffset")
    val lsn =
      if (xoffsetAware) xid * lit(1L << 20) + coalesce(xoff, lit(0L))
      else xid
    val lsnErr =
      if (xoffsetAware)
        when(xid.isNull, "missing_lsn")
          .when(coalesce(xoff, lit(0L)) >= (1L << 20), "missing_lsn")
      else when(xid.isNull, "missing_lsn")
    val image = parsed.getField("data")
    assemble(df, jsonCol, payload, keyCols, parsed0, opRaw, opMapped, lsn, image, lsnErr)
  }

  /** Decodable rows, envelope and annotation columns dropped — ready for
    * [[graft.merge.CdcMerge]].
    */
  def good(annotated: DataFrame, jsonCol: String): DataFrame =
    annotated.filter(col(ERROR_COL).isNull).drop(ERROR_COL, jsonCol)

  /** The dead-letter side: raw record + error reason, nothing else, so the
    * DLQ sink's schema is stable across payload evolutions.
    */
  def deadLetters(annotated: DataFrame, jsonCol: String): DataFrame =
    annotated.filter(col(ERROR_COL).isNotNull)
      .select(col(jsonCol).as("record"), col(ERROR_COL).as("error"))
}
