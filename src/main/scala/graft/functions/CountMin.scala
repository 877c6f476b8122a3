package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/** Count-min sketch over BIGINT keys — point-frequency estimates in
  * `depth × width` counters regardless of key cardinality: the companion
  * to Misra-Gries (graft_heavyhitters finds WHICH items are frequent; CMS
  * answers "how often did THIS item occur" for any item, without holding
  * the vocabulary). Merge is element-wise counter addition — associative
  * and commutative, so partial aggregation and shuffle order can never
  * change the sketch (CmsSpec proves sharded ≡ single-partition
  * bit-for-bit).
  *
  * Guarantees (both one-sided, both gated in q96): estimates NEVER
  * undercount (each row's counter saw every occurrence of the key, plus
  * collisions), and overcount ≤ ε·N with ε = e/width at probability
  * 1 − e^(−depth) over the hash family — fixed hashes here (the engine's
  * xxhash64 lanes), so for a given corpus the outcome is deterministic and
  * the gate asserts the measured bound.
  */
object CmsUtil {
  def rowHash(v: Long, row: Int, width: Int): Int = {
    val h = org.apache.spark.sql.catalyst.expressions.XxHash64Function
      .hash(v, LongType, GraftFunctions.XXSEED + row)
    java.lang.Long.remainderUnsigned(h, width).toInt
  }

  def toBytes(counts: Array[Long], depth: Int, width: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + counts.length * 8)
    bb.putInt(depth).putInt(width)
    counts.foreach(bb.putLong)
    bb.array()
  }

  def fromBytes(bytes: Array[Byte]): (Array[Long], Int, Int) = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val depth = bb.getInt
    val width = bb.getInt
    val counts = Array.fill(depth * width)(bb.getLong)
    (counts, depth, width)
  }
}

/** `graft_cms(keyBigint, depth, width)` → binary sketch. */
case class CmsAgg(
    child: Expression,
    depthExpr: Expression,
    widthExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  private lazy val depth: Int = depthExpr.eval().asInstanceOf[Int]
  private lazy val width: Int = widthExpr.eval().asInstanceOf[Int]

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != LongType)
      TypeCheckResult.TypeCheckFailure("graft_cms expects a bigint key")
    else if (!depthExpr.foldable || depthExpr.dataType != IntegerType ||
             !widthExpr.foldable || widthExpr.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure("graft_cms: depth/width must be foldable ints")
    else if (depthExpr.eval().asInstanceOf[Int] <= 0 ||
             widthExpr.eval().asInstanceOf[Int] <= 0)
      TypeCheckResult.TypeCheckFailure("graft_cms: depth and width must be > 0")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child, depthExpr, widthExpr)

  override def createAggregationBuffer(): Array[Long] = new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val key = v.asInstanceOf[Long]
      var d = 0
      while (d < depth) {
        buf(d * width + CmsUtil.rowHash(key, d, width)) += 1L
        d += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = CmsUtil.toBytes(buf, depth, width)

  override def serialize(buf: Array[Long]): Array[Byte] =
    CmsUtil.toBytes(buf, depth, width)
  override def deserialize(bytes: Array[Byte]): Array[Long] =
    CmsUtil.fromBytes(bytes)._1

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): CmsAgg =
    copy(child = cs(0), depthExpr = cs(1), widthExpr = cs(2))

  override def prettyName: String = "graft_cms"
}

/** `graft_cms_est(sketchBinary, keyBigint)` → bigint estimate (min over
  * the sketch's rows). Decode is cached per distinct sketch object — pass
  * the sketch as a LITERAL (collect it once, like the Bloom/centroid
  * constants) so the cache hits every row.
  */
case class CmsEstimate(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, LongType) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "graft_cms_est expects (binary, bigint)")
    }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  @transient private var cached: (Array[Byte], (Array[Long], Int, Int)) = _

  override def nullSafeEval(sketch: Any, key: Any): Any = {
    val bytes = sketch.asInstanceOf[Array[Byte]]
    if (cached == null || !(cached._1 eq bytes)) cached = (bytes, CmsUtil.fromBytes(bytes))
    val (counts, depth, width) = cached._2
    val k = key.asInstanceOf[Long]
    var best = Long.MaxValue
    var d = 0
    while (d < depth) {
      val c = counts(d * width + CmsUtil.rowHash(k, d, width))
      if (c < best) best = c
      d += 1
    }
    best
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)

  override def prettyName: String = "graft_cms_est"
}
