package graft.functions

import scala.collection.mutable

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.avro.io.DecoderFactory
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Confluent-framed Avro → plain-JSON decode: the full
  * KafkaAvroDeserializer wire format (reference README.md:262-263),
  * including the 5-byte header the value converter prepends — magic
  * byte 0 + big-endian int32 schema id — resolved against an id→schema
  * `registry` map (the offline stand-in for a schema-registry HTTP
  * lookup; swapping the map for a registry client is the one-line port).
  *
  * Per-id readers are cached per expression instance, so a topic whose
  * schema evolved (multiple live writer ids) decodes without re-parsing
  * schemas per row. Frame errors (short value, wrong magic, unknown id)
  * throw with the record's hex prefix — silent nulls would let wire
  * corruption masquerade as tombstones.
  *
  * Same CodegenFallback rationale as [[AvroToJson]]: a library decode in
  * a single ingest projection, never in a pushable filter. Same
  * `lenient` contract too (the streaming door's mode): a frame/decode
  * failure yields [[AvroDecodeErrors.diagnostic]] JSON the DLQ split
  * quarantines instead of throwing through the micro-batch.
  */
case class ConfluentAvroToJson(child: Expression, registry: Map[Int, String],
                               lenient: Boolean = false)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"confluent_avro_to_json requires binary, got ${other.catalogString}")
  }

  @transient private lazy val readers =
    mutable.Map.empty[Int, GenericDatumReader[GenericRecord]]
  @transient private var decoder: org.apache.avro.io.BinaryDecoder = _
  @transient private var record: GenericRecord = _

  override protected def nullSafeEval(v: Any): Any = {
    val bytes = v.asInstanceOf[Array[Byte]]
    try {
      if (bytes.length < 5 || bytes(0) != 0)
        throw new IllegalArgumentException(
          s"not a Confluent-framed Avro value (magic 0 + int32 id): " +
            bytes.take(5).map(b => f"$b%02x").mkString(" "))
      val id = ((bytes(1) & 0xff) << 24) | ((bytes(2) & 0xff) << 16) |
        ((bytes(3) & 0xff) << 8) | (bytes(4) & 0xff)
      val reader = readers.getOrElseUpdate(id, {
        val json = registry.getOrElse(id, throw new IllegalArgumentException(
          s"schema id $id not in registry (known: ${registry.keys.toSeq.sorted.mkString(",")})"))
        new GenericDatumReader[GenericRecord](new Schema.Parser().parse(json))
      })
      decoder = DecoderFactory.get().binaryDecoder(bytes, 5, bytes.length - 5, decoder)
      record = reader.read(if (readers.size == 1) record else null, decoder)
      UTF8String.fromString(record.toString)
    } catch {
      case e: Throwable if lenient && scala.util.control.NonFatal(e) =>
        record = null; decoder = null
        AvroDecodeErrors.diagnostic(bytes, e)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "confluent_avro_to_json"
}

object ConfluentAvroToJson {
  def apply(value: Column, registry: Map[Int, String]): Column =
    Bridge.column(ConfluentAvroToJson(Bridge.expression(value), registry))
  def apply(value: Column, registry: Map[Int, String], lenient: Boolean): Column =
    Bridge.column(ConfluentAvroToJson(Bridge.expression(value), registry, lenient))
}
