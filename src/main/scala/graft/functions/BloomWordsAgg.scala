package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{BinaryType, DataType}

/** Fixed-width bloom BIT-OR aggregate for the file-group manifest index
  * (round 21, guide §1.2 "per-task work" + §2.4 "remove shuffles"):
  * `child` is an `array<bigint>` of bit positions (the commit path's
  * K codegen'd xxhash64 positions per row) and the aggregate ORs them
  * into a `words`×64-bit buffer, emitting the raw little-struct bytes
  * (big-endian longs, word 0 first).
  *
  * Exists so the commit's per-bucket STATS aggregation and its KEY
  * BLOOM build are ONE grouped aggregation instead of two jobs: the
  * historical shape exploded K rows per input row into a
  * (bucket, word) bit_or — a second pass over the persisted merge
  * output plus a second collect per commit. The OR is
  * order/partitioning-invariant, so the sketch is bit-identical to the
  * exploded build (FileGroupsSpec pins probe behavior; the bits are
  * the same function of the same key set).
  *
  * Buffer is `words` longs (512 B at the manifest's 4096-bit sketch) —
  * ObjectHashAggregate territory, thousands of buckets per commit at
  * most, never row-count-sized state.
  */
case class BloomWordsAgg(child: Expression, words: Int,
                         mutableAggBufferOffset: Int = 0,
                         inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  override def createAggregationBuffer(): Array[Long] = new Array[Long](words)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      var i = 0
      while (i < arr.numElements()) {
        val p = arr.getLong(i)
        buf((p >>> 6).toInt) |= (1L << (p & 63L).toInt)
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < words) { a(i) |= b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = serialize(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(words * 8)
    var i = 0
    while (i < words) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(words)(bb.getLong)
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomWordsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomWordsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BloomWordsAgg =
    copy(child = newChild)

  override def prettyName: String = "graft_bloom_words"
}

object BloomWordsAgg {
  /** Column form: aggregate an array-of-bit-positions column into the
    * serialized word bytes (hex-encode on the driver for the manifest's
    * historical format). */
  def agg(positions: Column, words: Int): Column =
    Bridge.column(BloomWordsAgg(Bridge.expression(positions), words)
      .toAggregateExpression())
}
