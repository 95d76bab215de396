package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: polynomial rolling-hash document
  * fingerprint `h = Σ (h·31 + c_i) mod (2^31 − 1)` over the string's
  * Unicode code points (code points, not UTF-16 units, so the oracle's
  * `unicode()`-based recurrence agrees beyond the BMP).
  *
  * Why a custom `Expression` rather than a UDF: `doGenCode` emits a
  * plain Java loop that fuses into whole-stage codegen — no
  * serialization boundary, no closure dispatch per row, the same cost
  * profile as a builtin. (Preference (b) of the build rules: a native
  * expression where builtins can't express the computation — there is
  * no fold-over-characters builtin.)
  *
  * The modulus keeps every intermediate below 2^36 so the arithmetic
  * is overflow-free in any engine with 64-bit integers; the DuckDB
  * oracle evaluates the identical recurrence with `list_reduce`.
  */
case class RollingHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    var h = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = (h * 31 + cp) % 2147483647L
      i += Character.charCount(cp)
    }
    java.lang.Long.valueOf(h)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      s"""
         |String $s = $c.toString();
         |long $h = 0L;
         |int $i = 0;
         |while ($i < $s.length()) {
         |  int ${i}cp = $s.codePointAt($i);
         |  $h = ($h * 31 + ${i}cp) % 2147483647L;
         |  $i += Character.charCount(${i}cp);
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

object RollingHash {
  import org.apache.spark.sql.graftbridge.Bridge

  /** Column-level entry point (Spark 4 classic Column↔Expression
    * bridge).
    */
  def rolling_hash(c: Column): Column =
    Bridge.column(RollingHash(Bridge.expression(c)))

  /** Register `rolling_hash` for SQL use in this session. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "rolling_hash", exprs => RollingHash(exprs.head), "built-in")

  /** DuckDB rendering of the identical recurrence (TXT placeholder). */
  val rollingHashSql: String =
    "list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      "list_transform(range(1, length(TXT) + 1), i -> CAST(unicode(substr(TXT, CAST(i AS INT), 1)) AS BIGINT))), " +
      "(h, c) -> (h * 31 + c) % 2147483647)"
}
