package graft.functions

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types._

/** `graft_topk(expr, k)`: the k largest values of `expr` per group (by
  * `expr`'s natural ordering — for structs, field-by-field left to right),
  * returned as an array sorted descending. With `asc = true` it is instead
  * the k SMALLEST values sorted ascending — the bottom-k twin, so the
  * TopKRewrite rule covers ascending `row_number()` windows (oldest-N per
  * key) with the same bounded buffer.
  *
  * Why not `row_number() OVER (PARTITION BY g ORDER BY ...) <= k`? A window
  * shuffles and sorts EVERY row of every group; this aggregate is a bounded
  * buffer (≤ k values per group) with map-side partial aggregation, so the
  * exchange carries at most k rows per group per input partition and no
  * sort ever sees the full group. At 100 TB "latest-N per key" that is the
  * difference between shuffling the corpus and shuffling ~k·groups rows.
  *
  * The buffer over-allocates to 4k and compacts by sort+truncate, so
  * per-row maintenance is amortized O(log k) comparisons without a heap
  * allocation per element.
  */
case class TopKOrdered(
    child: Expression,
    kExpr: Expression,
    asc: Boolean = false,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.ArrayBuffer[Any]] {

  private lazy val k: Int = kExpr.eval() match {
    case i: Int => i
    case other => throw new IllegalArgumentException(s"k must be int, got $other")
  }

  @transient private lazy val ordering: Ordering[Any] = {
    val natural = TypeUtils.getInterpretedOrdering(child.dataType)
    if (asc) natural else natural.reverse
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (!kExpr.foldable || kExpr.dataType != IntegerType) {
      TypeCheckResult.TypeCheckFailure("graft_topk: k must be a foldable int")
    } else if (kExpr.eval() == null || kExpr.eval().asInstanceOf[Int] <= 0) {
      TypeCheckResult.TypeCheckFailure("graft_topk: k must be > 0")
    } else if (!RowOrdering.isOrderable(child.dataType)) {
      TypeCheckResult.TypeCheckFailure(s"graft_topk: ${child.dataType} is not orderable")
    } else {
      TypeCheckResult.TypeCheckSuccess
    }

  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child, kExpr)

  override def createAggregationBuffer(): mutable.ArrayBuffer[Any] =
    mutable.ArrayBuffer.empty[Any]

  /** Sort in output order, keep k — called when the buffer overflows 4k. */
  private def compact(buf: mutable.ArrayBuffer[Any]): mutable.ArrayBuffer[Any] =
    if (buf.length <= k) buf
    else {
      val kept = buf.sorted(ordering).take(k)
      buf.clear()
      buf ++= kept
    }

  override def update(buf: mutable.ArrayBuffer[Any], input: InternalRow): mutable.ArrayBuffer[Any] = {
    val v = child.eval(input)
    if (v != null) {
      buf += InternalRow.copyValue(v)
      if (buf.length >= 4 * k) compact(buf) else buf
    } else buf
  }

  override def merge(buf: mutable.ArrayBuffer[Any], other: mutable.ArrayBuffer[Any]): mutable.ArrayBuffer[Any] = {
    buf ++= other
    compact(buf)
  }

  override def eval(buf: mutable.ArrayBuffer[Any]): Any =
    new GenericArrayData(buf.sorted(ordering).take(k).toArray)

  @transient private lazy val valueProj = UnsafeProjection.create(Array(child.dataType))
  @transient private lazy val valueRow = new UnsafeRow(1)

  override def serialize(buf: mutable.ArrayBuffer[Any]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.length)
    buf.foreach { v =>
      val row = valueProj.apply(InternalRow(v))
      out.writeInt(row.getSizeInBytes)
      row.writeToStream(out, null)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.ArrayBuffer[Any] = {
    val in = ByteBuffer.wrap(bytes)
    val n = in.getInt
    val buf = mutable.ArrayBuffer.empty[Any]
    var i = 0
    while (i < n) {
      val sz = in.getInt
      val rowBytes = new Array[Byte](sz)
      in.get(rowBytes)
      valueRow.pointTo(rowBytes, sz)
      buf += InternalRow.copyValue(valueRow.get(0, child.dataType))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKOrdered =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKOrdered =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopKOrdered =
    copy(child = newChildren(0), kExpr = newChildren(1))

  override def prettyName: String = "graft_topk"
}

/** RowOrdering.isOrderable lives in catalyst's expressions package object in
  * some versions; alias the check here so TopKOrdered compiles against the
  * public surface only.
  */
private object RowOrdering {
  def isOrderable(dt: DataType): Boolean =
    org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(dt)
}
