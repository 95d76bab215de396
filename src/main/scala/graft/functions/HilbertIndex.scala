package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Native Catalyst expression: Hilbert-curve index of two
  * non-negative integer keys — the space-filling companion to
  * [[ZInterleave]] (Morton). The Hilbert curve visits every cell of
  * the `2^bits x 2^bits` grid with UNIT steps (consecutive indexes
  * are always grid neighbors — Morton jumps across quadrant seams),
  * so sorting by it yields zone min/max envelopes that are never
  * worse and usually tighter than Z-order on range predicates; it is
  * the `hilbert_index` layout Delta OPTIMIZE and Iceberg's sort-order
  * spec offer beside ZORDER.
  *
  * The mapping is the classic quadrant-rotation fold (per bit level
  * `s`, the quadrant digit `(3*rx) XOR ry` scales by `s*s`, then the
  * frame reflects/transposes — Warren, Hacker's Delight §16; the
  * public-domain `xy2d` form): a pure integer loop, fused under
  * whole-stage codegen, no allocation. Inputs are masked to `bits`
  * bits (quantize upstream), the index fits positive in a long for
  * `bits <= 31`. [[HilbertIndex.hilbertSqlCtes]] renders the same
  * fold as a chain of `bits` CTEs — arithmetic CASE only, so any SQL
  * engine reproduces the index bit-exactly ([[HilbertIndex.d2xy]] is
  * the driver-side inverse used by the specs' bijection/adjacency
  * proofs).
  */
case class HilbertIndex(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {

  require(bits > 0 && bits <= 31, s"bits $bits must be in 1..31")

  override def dataType: DataType = LongType
  override def nullable: Boolean = left.nullable || right.nullable

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case LongType | IntegerType | ShortType | ByteType => true
      case _ => false
    }
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hilbert_index needs two integral columns, got ${left.dataType.sql} and ${right.dataType.sql}")
  }

  private def asLong(e: Expression, v: Any): Long = e.dataType match {
    case LongType    => v.asInstanceOf[Long]
    case IntegerType => v.asInstanceOf[Int].toLong
    case ShortType   => v.asInstanceOf[Short].toLong
    case ByteType    => v.asInstanceOf[Byte].toLong
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val n = 1L << bits
    var x = asLong(left, a) & (n - 1)
    var y = asLong(right, b) & (n - 1)
    var d = 0L
    var s = n >> 1
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = n - 1 - x; y = n - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    java.lang.Long.valueOf(d)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val n = 1L << bits
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val d = ctx.freshName("d")
      val s = ctx.freshName("s")
      val rx = ctx.freshName("rx")
      val ry = ctx.freshName("ry")
      val t = ctx.freshName("t")
      s"""
         |long $x = ((long) $a) & ${n - 1}L;
         |long $y = ((long) $b) & ${n - 1}L;
         |long $d = 0L;
         |for (long $s = ${n >> 1}L; $s > 0; $s >>= 1) {
         |  long $rx = (($x & $s) > 0) ? 1L : 0L;
         |  long $ry = (($y & $s) > 0) ? 1L : 0L;
         |  $d += $s * $s * ((3L * $rx) ^ $ry);
         |  if ($ry == 0) {
         |    if ($rx == 1) { $x = ${n - 1}L - $x; $y = ${n - 1}L - $y; }
         |    long $t = $x; $x = $y; $y = $t;
         |  }
         |}
         |${ev.value} = $d;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HilbertIndex =
    copy(left = newLeft, right = newRight)
}

object HilbertIndex {
  import org.apache.spark.sql.graftbridge.Bridge

  /** Column-level entry point. */
  def hilbert_index(a: Column, b: Column, bits: Int = 16): Column =
    Bridge.column(HilbertIndex(Bridge.expression(a), Bridge.expression(b), bits))

  /** Driver-side inverse (`d -> (x, y)`), for specs and diagnostics:
    * the standard base-case-up unfold with per-level `rot(s)`.
    */
  def d2xy(bits: Int, d: Long): (Long, Long) = {
    require(bits > 0 && bits <= 31, s"bits $bits must be in 1..31")
    val n = 1L << bits
    require(d >= 0 && d < n * n, s"d $d out of [0, ${n * n})")
    var x = 0L
    var y = 0L
    var t = d
    var s = 1L
    while (s < n) {
      val rx = 1L & (t / 2)
      val ry = 1L & (t ^ rx)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val tt = x; x = y; y = tt
      }
      x += s * rx
      y += s * ry
      t /= 4
      s <<= 1
    }
    (x, y)
  }

  /** Portable-SQL rendering: the loop cannot be one expression (x and
    * y are loop-carried), so it unrolls into `bits` chained CTEs —
    * `CASE` + integer arithmetic only, term-for-term the Spark fold.
    * The quadrant digit uses the arithmetic XOR identity for bit
    * values (`(3*rx) XOR ry = 3*rx + ry - 2*rx*ry` for rx, ry in
    * {0,1}) so no engine-specific XOR operator is needed.
    *
    * Emits `<pfx>0 AS (...), ..., <finalCte> AS (SELECT passCols...,
    * acc AS outCol FROM ...)` for splicing into a `WITH`; `fromCte`
    * supplies `xExpr`/`yExpr` plus the passthrough columns. Each CTE
    * is referenced exactly once, so DuckDB's reference-count inlining
    * stays linear (no MATERIALIZED hint needed).
    */
  def hilbertSqlCtes(fromCte: String, xExpr: String, yExpr: String,
      bits: Int, passCols: Seq[String], finalCte: String,
      outCol: String, pfx: String = "h"): String = {
    require(bits > 0 && bits <= 31, s"bits $bits must be in 1..31")
    val n = 1L << bits
    val pass = if (passCols.isEmpty) "" else passCols.mkString("", ", ", ", ")
    val head =
      s"""${pfx}0 AS (SELECT $pass
         |  (CAST(($xExpr) AS BIGINT) & ${n - 1}) AS ${pfx}x0,
         |  (CAST(($yExpr) AS BIGINT) & ${n - 1}) AS ${pfx}y0,
         |  CAST(0 AS BIGINT) AS ${pfx}a0 FROM $fromCte)""".stripMargin
    val rounds = (0 until bits).map { r =>
      val s = 1L << (bits - 1 - r)
      val hx = s"${pfx}x$r"
      val hy = s"${pfx}y$r"
      val ha = s"${pfx}a$r"
      val rx = s"(CASE WHEN ($hx & $s) > 0 THEN 1 ELSE 0 END)"
      val ry = s"(CASE WHEN ($hy & $s) > 0 THEN 1 ELSE 0 END)"
      s"""${pfx}${r + 1} AS (SELECT $pass
         |  CASE WHEN ($hy & $s) > 0 THEN $hx
         |       WHEN ($hx & $s) > 0 THEN ${n - 1} - $hy
         |       ELSE $hy END AS ${pfx}x${r + 1},
         |  CASE WHEN ($hy & $s) > 0 THEN $hy
         |       WHEN ($hx & $s) > 0 THEN ${n - 1} - $hx
         |       ELSE $hx END AS ${pfx}y${r + 1},
         |  $ha + ${s * s} * (3 * $rx + $ry - 2 * $rx * $ry)
         |    AS ${pfx}a${r + 1} FROM ${pfx}$r)""".stripMargin
    }
    val fin =
      s"""$finalCte AS (SELECT $pass ${pfx}a$bits AS $outCol
         |  FROM ${pfx}$bits)""".stripMargin
    (head +: rounds :+ fin).mkString(",\n")
  }
}
