package graft.functions

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `graft_heavyhitters(item, k)`: Misra-Gries frequent-items sketch over a
  * string column — at most `k` counters per aggregation buffer, merged with
  * the Agarwal et al. "Mergeable Summaries" rule (sum counters, subtract the
  * (k+1)-st largest, drop non-positive), so partial aggregation composes in
  * ANY order with the classic deterministic GUARANTEES intact:
  *
  *   - superset: every item with true count > n/(k+1) is in the output;
  *   - underestimate: est ≤ true count, always;
  *   - bounded error: true count − est ≤ n/(k+1).
  *
  * The ESTIMATES (and which sub-threshold items survive) DO depend on merge
  * order, so a query must expose the guarantees (booleans against exact
  * counts — SparkEntry q67) or re-count the candidates exactly in a second
  * pass, never hash-compare raw estimates across runs.
  *
  * Why an aggregate and not `groupBy(item).count.orderBy.limit`? The exact
  * form shuffles one row per DISTINCT item — at 100 TB of tokens that is the
  * vocabulary, fat-tailed and skewed. This sketch's exchange is ≤ k rows per
  * input partition (like [[TopKOrdered]]), and the standard two-pass
  * heavy-hitters pipeline (sketch → broadcast candidates → exact count of
  * just those) never materializes the tail at all.
  *
  * Reference scope note: the reference engine has no frequent-items surface;
  * this is part of the §2.7 pipeline extension (SURVEY.md), same family as
  * dedup/ANN.
  */
case class MisraGries(
    child: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  private lazy val k: Int = kExpr.eval() match {
    case i: Int => i
    case other => throw new IllegalArgumentException(s"k must be int, got $other")
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (!kExpr.foldable || kExpr.dataType != IntegerType) {
      TypeCheckResult.TypeCheckFailure("graft_heavyhitters: k must be a foldable int")
    } else if (kExpr.eval() == null || kExpr.eval().asInstanceOf[Int] <= 0) {
      TypeCheckResult.TypeCheckFailure("graft_heavyhitters: k must be > 0")
    } else if (child.dataType != StringType) {
      TypeCheckResult.TypeCheckFailure(
        s"graft_heavyhitters: expects a string item column, got ${child.dataType}")
    } else {
      TypeCheckResult.TypeCheckSuccess
    }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("est", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child, kExpr)

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty[String, Long]

  override def update(buf: mutable.HashMap[String, Long],
      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val item = v.asInstanceOf[UTF8String].toString
      buf.get(item) match {
        case Some(c) => buf.update(item, c + 1)
        case None if buf.size < k => buf.update(item, 1L)
        case None =>
          // classic decrement-all: the new item and one unit of every
          // counter annihilate; zeros vacate their counter
          val dead = mutable.ArrayBuffer.empty[String]
          buf.foreach { case (i, c) =>
            if (c == 1L) dead += i else buf.update(i, c - 1)
          }
          dead.foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(buf: mutable.HashMap[String, Long],
      other: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    other.foreach { case (i, c) => buf.update(i, buf.getOrElse(i, 0L) + c) }
    if (buf.size > k) {
      // subtract the (k+1)-st largest count from everyone, keep positives —
      // exactly k survivors at most, error adds up per Mergeable Summaries
      val counts = buf.values.toArray
      java.util.Arrays.sort(counts)
      val t = counts(counts.length - (k + 1)) // (k+1)-st largest
      val dead = mutable.ArrayBuffer.empty[String]
      buf.foreach { case (i, c) =>
        if (c - t <= 0L) dead += i else buf.update(i, c - t)
      }
      dead.foreach(buf.remove)
    }
    buf
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val rows = buf.toArray.sortBy { case (i, c) => (-c, i) }
      .map { case (i, c) => InternalRow(UTF8String.fromString(i), c) }
    new GenericArrayData(rows.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (i, c) =>
      val b = i.getBytes("UTF-8")
      out.writeInt(b.length)
      out.write(b)
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.update(new String(b, "UTF-8"), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): MisraGries =
    copy(child = newChildren(0), kExpr = newChildren(1))

  override def prettyName: String = "graft_heavyhitters"
}
