package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Literal, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Bit-packing for product-quantization code arrays.
  *
  * [[PqPack]] turns an `array<int>` of `m` codes (each in
  * `[0, 2^bits)`) into a little-nibble-first binary column:
  * `bits = 4` packs two codes per byte (code `2j` in the low nibble of
  * byte `j`, code `2j+1` in the high nibble; an odd `m` zero-pads the
  * final high nibble), `bits = 8` is one code per byte. [[PqUnpack]]
  * inverts it given the same `bits` and the code count `m` (needed to
  * drop the pad nibble — byte length alone cannot distinguish m=7
  * from m=8 at 4 bits).
  *
  * This is the storage format that realizes PQ's compression claim:
  * dim=64 float32 embeddings (256 bytes) become 4 bytes at
  * m=8/k=16 — 64:1 — instead of the 8·4-byte ints of the unpacked
  * `array<int>` twin (which stays the oracle-gated representation:
  * flat ints hash across engines, packed blobs don't add oracle
  * value). Both directions are single fused loops under whole-stage
  * codegen; out-of-range codes throw rather than truncate, because a
  * silently masked code decodes to the WRONG centroid and poisons
  * every downstream ADC distance.
  */
case class PqPack(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  private def bitsLit: Option[Int] = right match {
    case Literal(v: Int, IntegerType) => Some(v)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult = left.dataType match {
    case ArrayType(IntegerType, _) => bitsLit match {
      case Some(4) | Some(8) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "pq_pack bits must be the literal 4 or 8")
    }
    case t => TypeCheckResult.TypeCheckFailure(
      s"pq_pack needs array<int>, got ${t.sql}")
  }

  override protected def nullSafeEval(codesAny: Any, bitsAny: Any): Any = {
    val codes = codesAny.asInstanceOf[ArrayData]
    val bits = bitsAny.asInstanceOf[Int]
    val m = codes.numElements()
    val max = 1 << bits
    val out = new Array[Byte](if (bits == 4) (m + 1) / 2 else m)
    var i = 0
    while (i < m) {
      if (codes.isNullAt(i)) return null
      val c = codes.getInt(i)
      if (c < 0 || c >= max)
        throw new IllegalArgumentException(
          s"pq_pack: code $c at position $i out of range [0, $max)")
      if (bits == 4) {
        if ((i & 1) == 0) out(i / 2) = c.toByte
        else out(i / 2) = (out(i / 2) | (c << 4)).toByte
      } else out(i) = c.toByte
      i += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (codes, bits) => {
      val m = ctx.freshName("m")
      val i = ctx.freshName("i")
      val c = ctx.freshName("c")
      val out = ctx.freshName("out")
      s"""
         |int $m = $codes.numElements();
         |byte[] $out = new byte[$bits == 4 ? ($m + 1) / 2 : $m];
         |for (int $i = 0; $i < $m; $i++) {
         |  if ($codes.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  int $c = $codes.getInt($i);
         |  if ($c < 0 || $c >= (1 << $bits))
         |    throw new IllegalArgumentException(
         |      "pq_pack: code " + $c + " at position " + $i +
         |      " out of range [0, " + (1 << $bits) + ")");
         |  if ($bits == 4) {
         |    if (($i & 1) == 0) $out[$i / 2] = (byte) $c;
         |    else $out[$i / 2] = (byte) ($out[$i / 2] | ($c << 4));
         |  } else $out[$i] = (byte) $c;
         |}
         |if (!${ev.isNull}) ${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqPack =
    copy(left = newLeft, right = newRight)
}

/** Inverse of [[PqPack]]: `(bin, bits, m)` → `array<int>` of `m`
  * codes. Throws when the binary length disagrees with `(bits, m)` —
  * a length mismatch means the blob was packed under a different
  * geometry and every decoded code would be garbage.
  */
case class PqUnpack(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true

  private def intLit(e: Expression): Option[Int] = e match {
    case Literal(v: Int, IntegerType) => Some(v)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult = first.dataType match {
    case BinaryType => (intLit(second), intLit(third)) match {
      case (Some(4) | Some(8), Some(m)) if m > 0 =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "pq_unpack needs literal bits in {4, 8} and a positive literal m")
    }
    case t => TypeCheckResult.TypeCheckFailure(
      s"pq_unpack needs binary, got ${t.sql}")
  }

  override protected def nullSafeEval(
      binAny: Any, bitsAny: Any, mAny: Any): Any = {
    val bin = binAny.asInstanceOf[Array[Byte]]
    val bits = bitsAny.asInstanceOf[Int]
    val m = mAny.asInstanceOf[Int]
    val expect = if (bits == 4) (m + 1) / 2 else m
    if (bin.length != expect)
      throw new IllegalArgumentException(
        s"pq_unpack: ${bin.length}-byte blob does not hold $m codes at $bits bits " +
          s"(expected $expect bytes)")
    val out = new Array[Int](m)
    var i = 0
    while (i < m) {
      out(i) =
        if (bits == 4) (bin(i / 2) >> ((i & 1) * 4)) & 0xf
        else bin(i) & 0xff
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (bin, bits, m) => {
      val i = ctx.freshName("i")
      val expect = ctx.freshName("expect")
      val out = ctx.freshName("out")
      val gad = classOf[GenericArrayData].getName
      s"""
         |int $expect = $bits == 4 ? ($m + 1) / 2 : $m;
         |if ($bin.length != $expect)
         |  throw new IllegalArgumentException(
         |    "pq_unpack: " + $bin.length + "-byte blob does not hold " + $m +
         |    " codes at " + $bits + " bits (expected " + $expect + " bytes)");
         |int[] $out = new int[$m];
         |for (int $i = 0; $i < $m; $i++) {
         |  $out[$i] = $bits == 4
         |    ? ($bin[$i / 2] >> (($i & 1) * 4)) & 0xf
         |    : $bin[$i] & 0xff;
         |}
         |${ev.value} = new $gad($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): PqUnpack =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object PqCodes {
  import org.apache.spark.sql.graftbridge.Bridge

  /** Pack an `array<int>` code column at `bits` ∈ {4, 8} per code. */
  def pq_pack(codes: Column, bits: Int): Column =
    Bridge.column(PqPack(Bridge.expression(codes),
      Literal(bits, IntegerType)))

  /** Unpack a [[pq_pack]]ed binary column back to `m` int codes. */
  def pq_unpack(bin: Column, bits: Int, m: Int): Column =
    Bridge.column(PqUnpack(Bridge.expression(bin),
      Literal(bits, IntegerType), Literal(m, IntegerType)))

  /** Register `pq_pack`/`pq_unpack` for SQL use in this session. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "pq_pack", exprs => {
        if (exprs.length != 2)
          throw new IllegalArgumentException(
            s"pq_pack requires exactly 2 arguments, got ${exprs.length}")
        PqPack(exprs.head, exprs(1))
      }, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "pq_unpack", exprs => {
        if (exprs.length != 3)
          throw new IllegalArgumentException(
            s"pq_unpack requires exactly 3 arguments, got ${exprs.length}")
        PqUnpack(exprs.head, exprs(1), exprs(2))
      }, "built-in")
  }
}
