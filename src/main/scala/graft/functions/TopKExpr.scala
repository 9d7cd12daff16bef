package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.Bridge
import org.apache.spark.sql.types._

/** Bounded top-k as a native aggregate: keeps a k-element min-heap of
  * `(score double, id long)` per group, merged associatively — so the
  * per-query top-k of a KNN scoring pass runs as partial/final
  * aggregation (each map partition ships at most k pairs per group)
  * instead of a window `row_number`, which must shuffle and sort
  * EVERY scored pair. At |queries|×|corpus| scoring scale that is the
  * difference between shuffling k·|queries| rows and all of them.
  *
  * Ordering: score descending, id ascending on ties — identical to
  * `Window.orderBy(sim.desc, id.asc)` + `row_number <= k`.
  */
object TopKExpr {
  /** `array<struct<score double, id long>>`, best-first. */
  def topK(score: Column, id: Column, k: Int): Column =
    Bridge.column(TopKAgg(Bridge.expression(score), Bridge.expression(id), k)
      .toAggregateExpression())
}

case class TopKAgg(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKHeap] {

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): TopKHeap = new TopKHeap(k)

  override def update(buf: TopKHeap, input: InternalRow): TopKHeap = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      buf.offer(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(a: TopKHeap, b: TopKHeap): TopKHeap = { a.absorb(b); a }

  override def eval(buf: TopKHeap): Any = {
    val sorted = buf.sortedBestFirst
    new GenericArrayData(sorted.map { case (s, i) =>
      InternalRow(s, i)
    })
  }

  override def serialize(buf: TopKHeap): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): TopKHeap = TopKHeap.fromBytes(k, bytes)

  override def withNewMutableAggBufferOffset(o: Int): TopKAgg = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKAgg = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(score = c(0), id = c(1))
}

/** k-bounded heap ordered worst-first (so the root is the eviction
  * candidate). "Better" = higher score, then smaller id.
  */
final class TopKHeap(val k: Int) {
  private val pq = new java.util.PriorityQueue[Array[Long]](
    math.max(1, k),
    (x: Array[Long], y: Array[Long]) => {
      val sx = java.lang.Double.longBitsToDouble(x(0))
      val sy = java.lang.Double.longBitsToDouble(y(0))
      if (sx != sy) java.lang.Double.compare(sx, sy) // worst (lowest) first
      else java.lang.Long.compare(y(1), x(1))        // larger id = worse
    })

  private def better(s: Double, i: Long, root: Array[Long]): Boolean = {
    val rs = java.lang.Double.longBitsToDouble(root(0))
    s > rs || (s == rs && i < root(1))
  }

  def offer(s: Double, i: Long): Unit = {
    if (pq.size < k) pq.offer(Array(java.lang.Double.doubleToLongBits(s), i))
    else if (better(s, i, pq.peek())) {
      pq.poll()
      pq.offer(Array(java.lang.Double.doubleToLongBits(s), i))
    }
  }

  def absorb(other: TopKHeap): Unit = {
    val it = other.pq.iterator()
    while (it.hasNext) {
      val e = it.next()
      offer(java.lang.Double.longBitsToDouble(e(0)), e(1))
    }
  }

  def sortedBestFirst: Array[(Double, Long)] = {
    val arr = new Array[(Double, Long)](pq.size)
    val it = pq.iterator()
    var i = 0
    while (it.hasNext) {
      val e = it.next()
      arr(i) = (java.lang.Double.longBitsToDouble(e(0)), e(1))
      i += 1
    }
    arr.sortBy { case (s, id) => (-s, id) }
  }

  def toBytes: Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(pq.size)
    val it = pq.iterator()
    while (it.hasNext) {
      val e = it.next()
      out.writeLong(e(0))
      out.writeLong(e(1))
    }
    out.flush()
    bos.toByteArray
  }
}

object TopKHeap {
  def fromBytes(k: Int, bytes: Array[Byte]): TopKHeap = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val h = new TopKHeap(k)
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val s = java.lang.Double.longBitsToDouble(in.readLong())
      val id = in.readLong()
      h.offer(s, id)
      i += 1
    }
    h
  }
}
