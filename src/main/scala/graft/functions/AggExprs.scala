package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** collect_set over BIGINT with a hard size cap: the buffer stops growing
  * at cap+1 elements, so a hot group (a non-discriminative LSH bucket at
  * web scale can approach the corpus) costs bounded memory instead of
  * materializing millions of ids in one aggregation buffer and OOMing the
  * executor. A group that overflowed is detectable downstream as
  * size(ids) = cap + 1 — candidate-pair generation drops it, which is the
  * bound-the-hot-key semantics the op wants anyway. Output is sorted for
  * deterministic downstream pair enumeration.
  *
  * Why a custom aggregate: no built-in expresses "give up beyond N" —
  * collect_set/collect_list buffer everything BEFORE any size filter can
  * run (SURVEY §4 rule: custom Catalyst only where built-ins genuinely
  * can't express the semantics; this is a memory-safety semantic).
  */
case class CappedCollectSetLong(
    child: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashSet[Long]] with UnaryLike[Expression] {

  override def createAggregationBuffer(): mutable.HashSet[Long] = mutable.HashSet.empty

  override def update(b: mutable.HashSet[Long], input: InternalRow): mutable.HashSet[Long] = {
    val v = child.eval(input)
    // grow to at most cap+1: the +1 marks overflow without unbounded growth
    if (v != null && b.size <= cap) b += v.asInstanceOf[Long]
    b
  }

  override def merge(b: mutable.HashSet[Long], o: mutable.HashSet[Long]): mutable.HashSet[Long] = {
    val it = o.iterator
    while (it.hasNext && b.size <= cap) b += it.next()
    b
  }

  override def eval(b: mutable.HashSet[Long]): Any = {
    val arr = b.toArray
    java.util.Arrays.sort(arr)
    new GenericArrayData(arr)
  }

  override def serialize(b: mutable.HashSet[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + b.size * 8)
    bb.putInt(b.size)
    b.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashSet[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val s = mutable.HashSet.empty[Long]
    var i = 0
    while (i < n) { s += bb.getLong; i += 1 }
    s
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_capped_collect_set expects bigint, got ${child.dataType}")

  override def withNewMutableAggBufferOffset(newOffset: Int): CappedCollectSetLong =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CappedCollectSetLong =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CappedCollectSetLong =
    copy(child = newChild)
}
