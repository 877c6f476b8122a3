package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.expr

/** Engine-portable 6-dp ratio derivation — the fix for the q103/q116/q121
  * lesson line: `round(CAST(num/den AS DOUBLE), 6)` at a halfway or
  * ULP-boundary quotient rounds DIFFERENTLY across engine versions (IEEE
  * division produces a value a half-ulp either side of the decimal
  * boundary; which side is version/library-dependent). Any hashed ratio
  * column must therefore never pass through a double at all.
  *
  * [[ratio6]] computes round-half-away-from-zero(num/den, 6 dp) entirely
  * in integer space:
  *
  *   micro = sign(num) · ((2·10⁶·|num| + den) div (2·den))      [den > 0]
  *   ratio = micro · 10⁻⁶  (exact decimal scaling, no division)
  *
  * Every step is exact integer/decimal arithmetic with one integral
  * divide of non-negative operands — truncation, floor and euclidean
  * division all agree there, so ANY engine produces the identical micro.
  * The final scaling is a DECIMAL(18,0) × DECIMAL(7,6) multiply (exact by
  * construction, result scale 6) — never a divide, because decimal
  * division rounding rules also vary by engine.
  *
  * The DuckDB oracle mirror is the same formula over HUGEINT with `//`
  * (see SparkEntry oracle entries for q116/q121).
  */
object IntRatio {

  /** round-half-away(num/den · 10⁶) / 10⁶ as DECIMAL(18,6), from two
    * DECIMAL(38,0) column NAMES (the operands must be named columns of the
    * input frame — the integral divide is spelled via the SQL `div`
    * operator, which has no Column-DSL equivalent). Caller guards den > 0.
    */
  def ratio6(numCol: String, denCol: String): Column = expr(
    s"""CAST(
       |  CAST(
       |    CAST(CASE WHEN $numCol < 0 THEN -1 ELSE 1 END AS BIGINT)
       |    * ((CAST(2000000 AS DECIMAL(38,0)) * abs($numCol) + $denCol)
       |       div (CAST(2 AS DECIMAL(38,0)) * $denCol))
       |  AS DECIMAL(18,0))
       |  * CAST(0.000001 AS DECIMAL(7,6))
       |AS DECIMAL(18,6))""".stripMargin)

  /** The DuckDB spelling of the same derivation over HUGEINT, for oracle
    * SQL strings: `num`/`den` are SQL sub-expressions of HUGEINT-castable
    * type; den > 0 is the caller's guard.
    */
  def duckRatio6(num: String, den: String): String =
    s"""CAST(
       |  CAST(
       |    CAST(CASE WHEN ($num) < 0 THEN -1 ELSE 1 END AS HUGEINT)
       |    * ((2000000 * abs(CAST(($num) AS HUGEINT)) + CAST(($den) AS HUGEINT))
       |       // (2 * CAST(($den) AS HUGEINT)))
       |  AS DECIMAL(18,0))
       |  * CAST(0.000001 AS DECIMAL(7,6))
       |AS DECIMAL(18,6))""".stripMargin

  /** round-half-away(num/den · 10⁶) as a plain BIGINT — the micro-integer
    * BEFORE the decimal scaling step of [[ratio6]]. This is the column a
    * hash-gated projection should emit: a BIGINT in the 10⁶-10⁹ range is
    * exactly representable in every downstream representation (int64,
    * float64, Python int, pandas, Arrow), whereas DECIMAL(38,0) and even
    * DECIMAL(18,6) outputs proved canonicalization-hazardous in the driver
    * harness (q116/q121, rounds 6-8: value-identical outputs hash-failed on
    * wide-decimal formatting alone). Caller guards den > 0.
    */
  def micro(numCol: String, denCol: String): Column = expr(
    s"""CAST(
       |  CAST(CASE WHEN $numCol < 0 THEN -1 ELSE 1 END AS BIGINT)
       |  * ((CAST(2000000 AS DECIMAL(38,0)) * abs($numCol) + $denCol)
       |     div (CAST(2 AS DECIMAL(38,0)) * $denCol))
       |AS BIGINT)""".stripMargin)

  /** DuckDB mirror of [[micro]] over HUGEINT → BIGINT. Caller guards
    * den > 0.
    */
  def duckMicro(num: String, den: String): String =
    s"""CAST(
       |  CAST(CASE WHEN ($num) < 0 THEN -1 ELSE 1 END AS HUGEINT)
       |  * ((2000000 * abs(CAST(($num) AS HUGEINT)) + CAST(($den) AS HUGEINT))
       |     // (2 * CAST(($den) AS HUGEINT)))
       |AS BIGINT)""".stripMargin
}
