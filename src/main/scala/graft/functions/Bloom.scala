package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/** Mergeable Bloom filter over BIGINT keys — the set-membership sketch a
  * decontamination / "seen before" pass broadcasts instead of a distinct
  * key table: `nBits` bits cost nBits/8 bytes regardless of corpus size,
  * versus 8 bytes per DISTINCT key for the exact semi-join side. One-sided
  * error: a member is NEVER reported absent (no false negatives — the
  * property q92 gates), non-members surface as false positives at rate
  * ≈ (1 − e^(−k·n/m))^k.
  *
  * Probe positions use Kirsch-Mitzenmacher double hashing: h_i = h1 + i·h2
  * (mod nBits) with h1/h2 = the two xxhash64 lanes the engine already uses
  * (seed 42 then lane fold — [[GraftFunctions.hashStrLane]]). Merge is
  * bitwise OR — associative and commutative, so partial aggregation and
  * shuffle order can never change the result (unlike count-style sketches
  * with floating merges).
  */
object BloomUtil {
  /** (h1, h2) for a long key, derived from the session's xxhash64 family. */
  def hashes(v: Long): (Long, Long) = {
    val h1 = org.apache.spark.sql.catalyst.expressions.XxHash64Function
      .hash(v, LongType, GraftFunctions.XXSEED)
    val h2 = org.apache.spark.sql.catalyst.expressions.XxHash64Function
      .hash(v, LongType, h1) | 1L // odd, so probes cover the ring
    (h1, h2)
  }

  def set(bits: Array[Long], nBits: Int, v: Long, k: Int): Unit = {
    val (h1, h2) = hashes(v)
    var i = 0
    while (i < k) {
      val pos = java.lang.Long.remainderUnsigned(h1 + i * h2, nBits).toInt
      bits(pos >> 6) |= 1L << (pos & 63)
      i += 1
    }
  }

  def contains(bits: Array[Long], nBits: Int, v: Long, k: Int): Boolean = {
    val (h1, h2) = hashes(v)
    var i = 0
    while (i < k) {
      val pos = java.lang.Long.remainderUnsigned(h1 + i * h2, nBits).toInt
      if ((bits(pos >> 6) & (1L << (pos & 63))) == 0L) return false
      i += 1
    }
    true
  }

  def toBytes(bits: Array[Long], nBits: Int, k: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + bits.length * 8)
    bb.putInt(nBits).putInt(k)
    bits.foreach(bb.putLong)
    bb.array()
  }

  def fromBytes(bytes: Array[Byte]): (Array[Long], Int, Int) = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val nBits = bb.getInt
    val k = bb.getInt
    val bits = Array.fill((nBits + 63) / 64)(bb.getLong)
    (bits, nBits, k)
  }
}

/** `graft_bloom(keyBigint, nBits, numHashes)` → binary sketch. */
case class BloomAgg(
    child: Expression,
    nBitsExpr: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  private lazy val nBits: Int = nBitsExpr.eval().asInstanceOf[Int]
  private lazy val kH: Int = kExpr.eval().asInstanceOf[Int]

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != LongType)
      TypeCheckResult.TypeCheckFailure("graft_bloom expects a bigint key")
    else if (!nBitsExpr.foldable || nBitsExpr.dataType != IntegerType ||
             !kExpr.foldable || kExpr.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure("graft_bloom: nBits/numHashes must be foldable ints")
    else if (nBitsExpr.eval().asInstanceOf[Int] <= 0 || kExpr.eval().asInstanceOf[Int] <= 0)
      TypeCheckResult.TypeCheckFailure("graft_bloom: nBits and numHashes must be > 0")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child, nBitsExpr, kExpr)

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long]((nBits + 63) / 64)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) BloomUtil.set(buf, nBits, v.asInstanceOf[Long], kH)
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) |= other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = BloomUtil.toBytes(buf, nBits, kH)

  override def serialize(buf: Array[Long]): Array[Byte] =
    BloomUtil.toBytes(buf, nBits, kH)
  override def deserialize(bytes: Array[Byte]): Array[Long] =
    BloomUtil.fromBytes(bytes)._1

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): BloomAgg =
    copy(child = cs(0), nBitsExpr = cs(1), kExpr = cs(2))

  override def prettyName: String = "graft_bloom"
}

/** `graft_bloom_contains(sketchBinary, keyBigint)` → boolean. */
case class BloomContains(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, LongType) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "graft_bloom_contains expects (binary, bigint)")
    }
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true

  // the broadcast sketch is a constant per task: decode once, not per row
  @transient private var cached: (Array[Byte], (Array[Long], Int, Int)) = _

  override def nullSafeEval(sketch: Any, key: Any): Any = {
    val bytes = sketch.asInstanceOf[Array[Byte]]
    if (cached == null || !(cached._1 eq bytes)) cached = (bytes, BloomUtil.fromBytes(bytes))
    val (bits, nBits, k) = cached._2
    BloomUtil.contains(bits, nBits, key.asInstanceOf[Long], k)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)

  override def prettyName: String = "graft_bloom_contains"
}
