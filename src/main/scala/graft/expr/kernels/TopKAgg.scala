package graft.expr.kernels

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k aggregate over long values: returns the k largest as
  * a descending array<long>. The custom-AGGREGATE rung of the
  * extension ladder (scalar rung: LongDot/MinHashSig).
  *
  * Why not built-ins? `collect_list` + sort + slice carries EVERY value
  * through the shuffle (unbounded buffers); window row_number + filter
  * shuffles every row and sorts whole partitions. This aggregate's
  * state is a k-bounded min-heap, merged map-side like any partial
  * aggregate: the shuffle moves at most k longs per (group, map task)
  * regardless of data size — the right shape for "top-k per key" over
  * 100 TB with many groups. Deterministic: the result is the k largest
  * VALUES (a multiset property), independent of partitioning and merge
  * order. */
case class TopKLongs(child: Expression, k: Int,
                     mutableAggBufferOffset: Int = 0,
                     inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.PriorityQueue[java.lang.Long]]
  with ImplicitCastInputTypes with UnaryLike[Expression] {

  require(k > 0, "k must be positive")

  // ints/shorts upcast at analysis time; a string column is rejected
  // there instead of a mid-job ClassCastException in update().
  // (AbstractDataType is private[sql], so the return type is inferred.)
  override def inputTypes = Seq(LongType)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_top_k"

  override def createAggregationBuffer(): java.util.PriorityQueue[java.lang.Long] =
    new java.util.PriorityQueue[java.lang.Long](k + 1)

  private def offer(buf: java.util.PriorityQueue[java.lang.Long], v: Long): Unit = {
    if (buf.size < k) buf.offer(v)
    else if (buf.peek() < v) { buf.poll(); buf.offer(v) }
  }

  override def update(buf: java.util.PriorityQueue[java.lang.Long],
                      input: InternalRow): java.util.PriorityQueue[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) offer(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(b1: java.util.PriorityQueue[java.lang.Long],
                     b2: java.util.PriorityQueue[java.lang.Long]): java.util.PriorityQueue[java.lang.Long] = {
    val it = b2.iterator()
    while (it.hasNext) offer(b1, it.next())
    b1
  }

  override def eval(buf: java.util.PriorityQueue[java.lang.Long]): Any = {
    val arr = new Array[Long](buf.size)
    var i = buf.size - 1
    val q = new java.util.PriorityQueue[java.lang.Long](buf)
    while (i >= 0) { arr(i) = q.poll(); i -= 1 } // heap pops ascending → fill backwards
    new GenericArrayData(arr)
  }

  override def serialize(buf: java.util.PriorityQueue[java.lang.Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) out.writeLong(it.next())
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.PriorityQueue[java.lang.Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.offer(in.readLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): TopKLongs =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TopKLongs =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): TopKLongs =
    copy(child = newChild)
}
