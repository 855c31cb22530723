package graft.cdc

import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericRecord}
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Spark-schema ⇄ Avro bridge for the Debezium envelope (S15).
  *
  * The reference's path-2 wire format is Avro via the Confluent
  * converters (README.md:262-263, 309 — KafkaAvroDeserializer). This
  * environment bundles core Avro (a Spark runtime dependency) but not
  * the spark-avro module, so the bridge is built directly on the public
  * `org.apache.avro` API: a StructType→Schema converter for the
  * envelope's type subset (int/long/double/boolean/string/struct, all
  * nullable unions — exactly what Debezium JSON envelopes carry) plus a
  * Row→GenericRecord encoder for the workload generator's Avro twin.
  * Decode lives in [[graft.functions.AvroToJson]].
  */
object Avro {

  /** Avro record schema for a Spark struct; every field is a
    * `["null", T]` union (Spark fields are nullable by default and
    * Debezium's before/after are genuinely optional). Nested record
    * names are path-qualified so before/after (same shape, two fields)
    * get distinct, legal Avro names. */
  def toAvroSchema(st: StructType, name: String = "Envelope"): Schema = {
    val fields = st.fields.map { f =>
      val t = f.dataType match {
        case IntegerType => Schema.create(Schema.Type.INT)
        case LongType => Schema.create(Schema.Type.LONG)
        case DoubleType => Schema.create(Schema.Type.DOUBLE)
        case BooleanType => Schema.create(Schema.Type.BOOLEAN)
        case StringType => Schema.create(Schema.Type.STRING)
        case s: StructType => toAvroSchema(s, s"${name}_${f.name}")
        case other => throw new IllegalArgumentException(
          s"unsupported envelope field type: ${other.catalogString} (field ${f.name})")
      }
      new Schema.Field(f.name, Schema.createUnion(
        Schema.create(Schema.Type.NULL), t), null, Schema.Field.NULL_DEFAULT_VALUE)
    }
    Schema.createRecord(name, null, "graft.cdc", false, fields.toList.asJava)
  }

  private def nonNullBranch(s: Schema): Schema =
    if (s.getType == Schema.Type.UNION)
      s.getTypes.asScala.find(_.getType != Schema.Type.NULL).get
    else s

  /** Recursive Row → GenericRecord for schemas produced by
    * [[toAvroSchema]] (runs on executors; schema is re-parsed per
    * partition from its JSON form, never serialized). */
  def rowToRecord(row: Row, schema: Schema): GenericRecord = {
    val rec = new GenericData.Record(schema)
    schema.getFields.asScala.foreach { f =>
      val i = row.fieldIndex(f.name)
      val v: AnyRef =
        if (row.isNullAt(i)) null
        else row.get(i) match {
          case r: Row => rowToRecord(r, nonNullBranch(f.schema))
          case other => other.asInstanceOf[AnyRef]
        }
      rec.put(f.name, v)
    }
    rec
  }
}
