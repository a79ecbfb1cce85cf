package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.sql.SparkSessionExtensions

/** `minhash_union(sig)` — TypedImperativeAggregate merging per-row MinHash
  * signatures into one set-union signature per group (elementwise min).
  *
  * MinHash's defining property: sig(A ∪ B) = elementwise-min(sig(A),
  * sig(B)), so a group's merged signature estimates the Jaccard similarity
  * of whole document COLLECTIONS — cross-source overlap without ever
  * joining documents (SURVEY.md §7.4 — the custom-aggregate rung of the
  * ladder; the buffer is 64 longs, mergeable in any order, so map-side
  * partial aggregation works and the shuffle carries 512 bytes per group).
  */
case class MinHashUnion(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  private val nPerm = MinHashSignature.NPerm

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(nPerm)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val arr = child.eval(input).asInstanceOf[ArrayData]
    if (arr != null) {
      val n = math.min(arr.numElements(), nPerm)
      var i = 0
      while (i < n) {
        val v = arr.getLong(i)
        if (v < buf(i)) buf(i) = v
        i += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < nPerm) {
      if (b2(i) < b1(i)) b1(i) = b2(i)
      i += 1
    }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(nPerm * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(nPerm)(bb.getLong())
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "minhash_union"

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashUnion =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashUnion =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MinHashUnion =
    copy(child = newChildren.head)
}

object MinHashUnion {
  def inject(ext: SparkSessionExtensions): Unit =
    ext.injectFunction((
      FunctionIdentifier("minhash_union"),
      new ExpressionInfo(classOf[MinHashUnion].getName, "minhash_union"),
      (children: Seq[Expression]) => MinHashUnion(children.head)
        .toAggregateExpression()))
}
