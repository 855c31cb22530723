package graft.functions

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.avro.io.DecoderFactory
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Avro-binary → plain-JSON decode of a Debezium envelope value (S15,
  * reference README.md:262-263, 309 — the KafkaAvroDeserializer /
  * Confluent-converter wire format).
  *
  * Decodes with the writer schema (carried as its JSON form — the
  * stand-in for a schema-registry lookup, which this offline environment
  * cannot host) and re-emits the record as plain JSON text, so the
  * entire downstream pipeline (`from_json` with the declared envelope
  * schema, post-image projection, merge) is IDENTICAL for both wire
  * formats — exactly how Debezium's JSON and Avro converters present the
  * same logical envelope.
  *
  * CodegenFallback is deliberate: Avro decoding is a library call with
  * no codegen form, the expression sits in a single ingest projection
  * (never a filter that pushdown could re-inline), and the per-record
  * decoder/reader are reused across rows within a partition.
  *
  * `lenient` (the STREAMING door's mode — [[graft.cdc.Ingest.AvroValues]]):
  * a record that fails to decode yields [[AvroDecodeErrors.diagnostic]]
  * JSON (error + base64 raw bytes) instead of throwing. The diagnostic
  * deliberately does NOT parse as a Debezium envelope, so the existing
  * DLQ split quarantines it with the bytes preserved — without this, one
  * poison frame threw through the pre-foreachBatch projection, failed
  * the micro-batch before the DLQ split could run, and wedged the
  * checkpoint on permanent replay. Batch helpers stay strict (default):
  * a one-shot replay SHOULD fail loudly on wire corruption.
  */
case class AvroToJson(child: Expression, schemaJson: String, lenient: Boolean = false)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"avro_to_json requires binary, got ${other.catalogString}")
  }

  @transient private lazy val schema: Schema = new Schema.Parser().parse(schemaJson)
  @transient private lazy val reader = new GenericDatumReader[GenericRecord](schema)
  // reused across rows: binaryDecoder(bytes, old) recycles the instance
  @transient private var decoder: org.apache.avro.io.BinaryDecoder = _
  @transient private var record: GenericRecord = _

  override protected def nullSafeEval(v: Any): Any = {
    val bytes = v.asInstanceOf[Array[Byte]]
    try {
      decoder = DecoderFactory.get().binaryDecoder(bytes, decoder)
      record = reader.read(record, decoder)
      // GenericRecord.toString is the record's plain-JSON rendering —
      // union fields collapse to their value (null prints as null), which
      // is byte-compatible with what the Debezium JSON converter emits.
      UTF8String.fromString(record.toString)
    } catch {
      case e: Throwable if lenient && scala.util.control.NonFatal(e) =>
        // a failed read can leave the reused record/decoder in an
        // undefined partial state — drop them so the NEXT row decodes
        // from fresh instances, not a corrupted carry-over
        record = null; decoder = null
        AvroDecodeErrors.diagnostic(bytes, e)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "avro_to_json"
}

object AvroToJson {
  def apply(value: Column, schemaJson: String): Column =
    Bridge.column(AvroToJson(Bridge.expression(value), schemaJson))
  def apply(value: Column, schemaJson: String, lenient: Boolean): Column =
    Bridge.column(AvroToJson(Bridge.expression(value), schemaJson, lenient))
}

/** Shared lenient-mode failure rendering for the two Avro decode
  * expressions: a JSON diagnostic carrying the error and the record's
  * raw bytes (base64), shaped so the envelope parse downstream yields
  * no `payload.op` and the DLQ split quarantines it — poison costs one
  * DLQ row (with its bytes recoverable for replay-after-fix), never
  * the micro-batch. */
object AvroDecodeErrors {
  def diagnostic(bytes: Array[Byte], e: Throwable): UTF8String = {
    val msg = (e.getClass.getSimpleName + ": " + String.valueOf(e.getMessage))
      .take(200).replace("\\", "\\\\").replace("\"", "\\\"")
      .replace("\n", " ").replace("\r", " ").replace("\t", " ")
    val b64 = java.util.Base64.getEncoder.encodeToString(bytes)
    UTF8String.fromString(s"""{"_graft_decode_error":"$msg","raw_b64":"$b64"}""")
  }
}
