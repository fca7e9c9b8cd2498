package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Elementwise SUM of `array<bigint>` vectors — the aggregation kernel that
  * lets centroid/statistics builds keep vectors as single array values
  * end-to-end instead of exploding to (row × dim) tuples.
  *
  * The positional-explode formulation shuffles |rows| × dims records and
  * re-assembles arrays with `collect_list` + `array_sort`; this aggregate
  * shuffles ONE buffer per group per partition (map-side partial merge,
  * like any SUM), so a 100 TB corpus of 4k-dim embeddings aggregates at
  * 1/dims of the shuffle volume with no re-assembly step.
  *
  * Implemented as a `TypedImperativeAggregate` (the same machinery as
  * `collect_list`/`percentile`): the buffer is a primitive `Array[Long]`,
  * grown to the longest input seen; rows beyond a shorter vector's length
  * contribute zero. Callers guarantee no per-element overflow (quantized
  * components < 2^31 summed over < 2^32 rows, as with [[DotL]]).
  */
case class VectorSumL(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires an array<bigint> input, got ${other.simpleString}")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "vector_sum_l"
  override def children: Seq[Expression] = Seq(child)

  override def createAggregationBuffer(): Array[Long] = Array.emptyLongArray

  private def add(buf: Array[Long], v: ArrayData): Array[Long] = {
    val n = v.numElements()
    val out = if (n <= buf.length) buf else java.util.Arrays.copyOf(buf, n)
    var i = 0
    while (i < n) { out(i) += v.getLong(i); i += 1 }
    out
  }

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) buf else add(buf, v.asInstanceOf[ArrayData])
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    val (big, small) = if (buf.length >= other.length) (buf, other) else (other, buf)
    var i = 0
    while (i < small.length) { big(i) += small(i); i += 1 }
    big
  }

  // SQL convention: an all-NULL (or empty) group sums to NULL, matching SUM
  override def eval(buf: Array[Long]): Any =
    if (buf.isEmpty) null else new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(off: Int): VectorSumL =
    copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): VectorSumL =
    copy(inputAggBufferOffset = off)
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): Expression = copy(child = cs.head)
}
