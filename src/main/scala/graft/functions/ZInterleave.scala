package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Native Catalyst expression: Morton (Z-order) bit interleave of two
  * non-negative integer keys — `a`'s low `bits` bits land on even
  * positions, `b`'s on odd. Sorting or range-partitioning by the
  * result clusters rows that are close in BOTH dimensions, which is
  * the standard multi-dimensional data-skipping layout (Delta/Iceberg
  * `ZORDER BY`): after `sortWithinPartitions(z)` every parquet
  * row-group's min/max envelope is tight in both keys, so predicates
  * on EITHER dimension prune row groups, not just the leading sort
  * key of a lexicographic layout.
  *
  * Inputs are masked to their low `bits` bits (quantize upstream —
  * e.g. `key % 1024` or a width-bucket — so the mask is a no-op);
  * with `bits <= 31` the result fits positive in a long. The
  * expression is a pure bit shuffle: no allocation, fused loop under
  * whole-stage codegen, and an exact SQL rendering
  * ([[ZInterleave.zInterleaveSql]]) keeps it oracle-checkable on any
  * engine with integer shifts.
  */
case class ZInterleave(left: Expression, right: Expression, bits: Int)
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
      s"z_interleave needs two integral columns, got ${left.dataType.sql} and ${right.dataType.sql}")
  }

  private def asLong(e: Expression, v: Any): Long = e.dataType match {
    case LongType    => v.asInstanceOf[Long]
    case IntegerType => v.asInstanceOf[Int].toLong
    case ShortType   => v.asInstanceOf[Short].toLong
    case ByteType    => v.asInstanceOf[Byte].toLong
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val mask = (1L << bits) - 1
    val x = asLong(left, a) & mask
    val y = asLong(right, b) & mask
    var z = 0L
    var i = 0
    while (i < bits) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    java.lang.Long.valueOf(z)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mask = (1L << bits) - 1
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val z = ctx.freshName("z")
      val i = ctx.freshName("i")
      s"""
         |long $x = ((long) $a) & ${mask}L;
         |long $y = ((long) $b) & ${mask}L;
         |long $z = 0L;
         |for (int $i = 0; $i < $bits; $i++) {
         |  $z |= (($x >> $i) & 1L) << (2 * $i);
         |  $z |= (($y >> $i) & 1L) << (2 * $i + 1);
         |}
         |${ev.value} = $z;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZInterleave =
    copy(left = newLeft, right = newRight)
}

object ZInterleave {
  import org.apache.spark.sql.graftbridge.Bridge

  /** Column-level entry point. */
  def z_interleave(a: Column, b: Column, bits: Int = 16): Column =
    Bridge.column(ZInterleave(Bridge.expression(a), Bridge.expression(b), bits))

  /** Portable-SQL rendering of the same bit shuffle (plain `& << >>`
    * plus a sum — runs on DuckDB and most engines): `a`/`b` are SQL
    * expressions for the two keys. Exactly mirrors the Spark
    * expression, term by term.
    */
  def zInterleaveSql(a: String, b: String, bits: Int = 16): String = {
    require(bits > 0 && bits <= 31, s"bits $bits must be in 1..31")
    val mask = (1L << bits) - 1
    // every term fully parenthesized: Postgres-family engines give
    // << and | EQUAL precedence (left-assoc), so a bare `x << i | y`
    // would parse as `(x << i | y) << j` down the chain
    val terms = (0 until bits).flatMap(i => Seq(
      s"((((($a) & $mask) >> $i) & 1) << ${2 * i})",
      s"((((($b) & $mask) >> $i) & 1) << ${2 * i + 1})"))
    terms.mkString("CAST((", " | ", ") AS BIGINT)")
  }

  /** Register `z_interleave(a, b, bits)` for SQL use in this session. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "z_interleave", exprs => {
        if (exprs.length != 3)
          throw new IllegalArgumentException(
            s"z_interleave requires exactly 3 arguments (a, b, bits), got ${exprs.length}")
        val bits = exprs(2) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"z_interleave bits must be an integer literal, got $other")
        }
        ZInterleave(exprs.head, exprs(1), bits)
      }, "built-in")
}
