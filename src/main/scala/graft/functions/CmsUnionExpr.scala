package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graftshim.Bridge
import org.apache.spark.sql.types.{BinaryType, DataType}
import org.apache.spark.util.sketch.CountMinSketch

/** In-plan union of serialized count-min sketches: the merge runs as
  * partial/final aggregation on the EXECUTORS (CMS union is cell-wise
  * addition — associative and commutative), so only the one merged
  * blob ever reaches the driver. This replaces collecting every
  * per-slice blob (~112 KB each at the default config — a thousand
  * slices was ~112 MB of driver heap) with a tree-shaped merge whose
  * driver cost is a single blob.
  *
  * All inputs must share (eps, confidence, seed) — i.e. come from one
  * [[graft.operators.Sketches.cmsPartials]] build; Spark's
  * `CountMinSketch.mergeInPlace` rejects incompatible shapes.
  */
object CmsUnionExpr {
  /** Aggregate column: `binary` merged sketch, NULL over no rows. */
  def cmsUnion(sketchBlob: Column): Column =
    Bridge.column(CmsUnionAgg(Bridge.expression(sketchBlob)).toAggregateExpression())
}

/** Mutable one-slot buffer: null until the first blob arrives. */
final class CmsUnionBuf(var sketch: CountMinSketch) {
  def absorb(other: CountMinSketch): Unit =
    if (other != null) {
      if (sketch == null) sketch = other
      else sketch.mergeInPlace(other)
    }
}

case class CmsUnionAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CmsUnionBuf] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): CmsUnionBuf = new CmsUnionBuf(null)

  override def update(buf: CmsUnionBuf, input: InternalRow): CmsUnionBuf = {
    val blob = child.eval(input)
    if (blob != null)
      buf.absorb(CountMinSketch.readFrom(
        new ByteArrayInputStream(blob.asInstanceOf[Array[Byte]])))
    buf
  }

  override def merge(a: CmsUnionBuf, b: CmsUnionBuf): CmsUnionBuf = {
    a.absorb(b.sketch)
    b.sketch = null // absorbed in place — don't let b alias the merged state
    a
  }

  override def eval(buf: CmsUnionBuf): Any =
    if (buf.sketch == null) null else buf.sketch.toByteArray

  override def serialize(buf: CmsUnionBuf): Array[Byte] =
    if (buf.sketch == null) Array.emptyByteArray else buf.sketch.toByteArray

  override def deserialize(bytes: Array[Byte]): CmsUnionBuf =
    if (bytes.isEmpty) new CmsUnionBuf(null)
    else new CmsUnionBuf(CountMinSketch.readFrom(new ByteArrayInputStream(bytes)))

  override def withNewMutableAggBufferOffset(o: Int): CmsUnionAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CmsUnionAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c(0))
}
