package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `graft_dv_live(fileKey, rowIndex, files, offsets, runs)` → boolean —
  * the DELETION-VECTOR scan-side filter: TRUE iff `(fileKey, rowIndex)`
  * is NOT covered by the deletion runs. The vector set rides as three
  * FOLDABLE literals built once on the driver from the sidecars:
  *
  *  - `files`:   sorted `array<string>` of file keys (UTF8 byte order),
  *  - `offsets`: `array<bigint>` of length `files.length + 1` delimiting
  *               each file's segment in `runs` (in RUN PAIRS),
  *  - `runs`:    flat `array<bigint>` of `[start, endExclusive)` row-index
  *               pairs, sorted by start within each file segment.
  *
  * Membership is two binary searches — O(log files + log runs) per row,
  * zero shuffle — which is what replaces the distributed anti-join for
  * bounded vector sets (a 10⁹-row delete still falls back to the join;
  * see TableLog.readEntrySet). Run-length pairs make a RANGE delete on
  * clustered data nearly free: a million deleted contiguous rows is ONE
  * pair. NULL file/row (the empty-snapshot frame) is LIVE.
  */
case class DvLive(file: Expression, ri: Expression, filesE: Expression,
    offsetsE: Expression, runsE: Expression)
  extends Expression with CodegenFallback {

  override def children: Seq[Expression] = Seq(file, ri, filesE, offsetsE, runsE)

  override def checkInputDataTypes(): TypeCheckResult =
    (file.dataType, ri.dataType, filesE.dataType, offsetsE.dataType,
        runsE.dataType) match {
      case (StringType, LongType, ArrayType(StringType, _),
          ArrayType(LongType, _), ArrayType(LongType, _)) =>
        if (!filesE.foldable || !offsetsE.foldable || !runsE.foldable)
          TypeCheckResult.TypeCheckFailure(
            "graft_dv_live vector args must be literal arrays")
        else TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "graft_dv_live expects (string, bigint, array<string>, " +
          "array<bigint>, array<bigint>)")
    }

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false

  // the vector literals decode once per task, never per row
  @transient private lazy val files: Array[UTF8String] = {
    val a = filesE.eval(null).asInstanceOf[ArrayData]
    Array.tabulate(a.numElements())(i => a.getUTF8String(i).clone())
  }
  @transient private lazy val offsets: Array[Long] =
    offsetsE.eval(null).asInstanceOf[ArrayData].toLongArray()
  @transient private lazy val runs: Array[Long] =
    runsE.eval(null).asInstanceOf[ArrayData].toLongArray()

  override def eval(input: InternalRow): Any = {
    val f = file.eval(input)
    val r = ri.eval(input)
    if (f == null || r == null) return true // no position info: live
    val key = f.asInstanceOf[UTF8String]
    val row = r.asInstanceOf[Long]
    // file segment
    var lo = 0; var hi = files.length - 1; var fi = -1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      val c = files(mid).compareTo(key)
      if (c == 0) { fi = mid; lo = hi + 1 }
      else if (c < 0) lo = mid + 1
      else hi = mid - 1
    }
    if (fi < 0) return true // file carries no vector
    // greatest run with start <= row, within the file's segment
    var plo = offsets(fi).toInt; var phi = offsets(fi + 1).toInt - 1
    var hit = -1
    while (plo <= phi) {
      val mid = (plo + phi) >>> 1
      if (runs(2 * mid) <= row) { hit = mid; plo = mid + 1 }
      else phi = mid - 1
    }
    hit < 0 || row >= runs(2 * hit + 1)
  }

  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): Expression =
    copy(file = cs(0), ri = cs(1), filesE = cs(2), offsetsE = cs(3),
      runsE = cs(4))

  override def prettyName: String = "graft_dv_live"
}
