package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native Catalyst expression: all `bands` random-hyperplane LSH band
  * keys of a numeric vector in one fused loop, as `array<bigint>` —
  * band b's key packs the sign bits of planes [b·r, (b+1)·r) at local
  * positions 0..r-1.
  *
  * Bit-identical to the Column formulation it replaces (one
  * `VecDot(vec, typedLit(weights(p)))` per plane, `when(proj > 0,
  * 1L << i)` summed per band): the projection is the same
  * sequential-fold double dot product, the sign test and bit packing
  * are the same. What changes is the PLAN, not the values. The
  * Column form embedded `planes` separate 64-double literal arrays in
  * the expression tree — at the near-dup configuration (192 planes)
  * that tree, duplicated by the optimizer into every operator
  * referencing the keys on both sides of the candidate self-join,
  * produced 14 MiB task binaries and driver-side planning cost that
  * dwarfed the actual compute. Here the weight matrix never enters
  * the EXPRESSION TREE: the plan node is four ints and a child, and
  * the matrix — a pure deterministic function of (bands·r, dim)
  * ([[LshBandKeys.planeWeight]], the md5-derived family the DuckDB
  * oracle reproduces symbolically) — is materialized once at codegen
  * time (driver side, `ctx.addReferenceObj`) and rides the stage's
  * references array as ONE compact object (~100 KB at 192×64, per
  * stage, however many operators use the keys); the interpreted
  * fallback derives it lazily per executor instead.
  *
  * Null semantics match the Column form: null vector → null key
  * array; a null ELEMENT nulls every projection, so every sign test
  * fails and the keys are all zero; a wrong-length non-null vector
  * raises (never silently single-buckets — that would be a hidden
  * O(n²) at scale).
  */
case class LshBandKeys(child: Expression, bands: Int, r: Int, dim: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = {
    if (bands <= 0 || r <= 0 || r > 63 || dim <= 0)
      TypeCheckResult.TypeCheckFailure(
        s"lsh_band_keys needs bands > 0, 0 < r <= 63, dim > 0; got bands=$bands r=$r dim=$dim")
    else child.dataType match {
      case ArrayType(FloatType | DoubleType | IntegerType | LongType, _) =>
        TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"lsh_band_keys needs a numeric array, got ${t.sql}")
    }
  }

  private def elemType: DataType =
    child.dataType.asInstanceOf[ArrayType].elementType

  /** Flat plane-major weight matrix: weight of (plane p, 1-based dim
    * d) at index p·dim + d − 1. Derived, not stored in the plan node —
    * on the codegen path this is forced once on the driver and ships
    * as a single reference object per stage; on the interpreted path
    * it is recomputed lazily per executor (transient).
    */
  @transient private lazy val weights: Array[Double] = {
    val planes = bands * r
    val w = new Array[Double](planes * dim)
    var p = 0
    while (p < planes) {
      var d = 1
      while (d <= dim) {
        w(p * dim + d - 1) = LshBandKeys.planeWeight(p, d)
        d += 1
      }
      p += 1
    }
    w
  }

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    if (n != dim)
      throw new IllegalArgumentException(
        s"lshBandKeys: expected $dim-dim vector, got $n")
    val et = elemType
    def get(i: Int): Double = et match {
      case FloatType   => v.getFloat(i).toDouble
      case DoubleType  => v.getDouble(i)
      case IntegerType => v.getInt(i).toDouble
      case LongType    => v.getLong(i).toDouble
    }
    val keys = new Array[Long](bands)
    var anyNull = false
    var d = 0
    while (d < n && !anyNull) { if (v.isNullAt(d)) anyNull = true; d += 1 }
    if (!anyNull) {
      val w = weights
      var b = 0
      while (b < bands) {
        var key = 0L
        var i = 0
        while (i < r) {
          val off = (b * r + i) * dim
          var acc = 0.0
          var j = 0
          while (j < n) { acc += get(j) * w(off + j); j += 1 }
          if (acc > 0) key |= (1L << i)
          i += 1
        }
        keys(b) = key
        b += 1
      }
    }
    new GenericArrayData(keys)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val getter = elemType match {
      case FloatType   => (a: String, i: String) => s"(double) $a.getFloat($i)"
      case DoubleType  => (a: String, i: String) => s"$a.getDouble($i)"
      case IntegerType => (a: String, i: String) => s"(double) $a.getInt($i)"
      case LongType    => (a: String, i: String) => s"(double) $a.getLong($i)"
    }
    val wRef = ctx.addReferenceObj("lshWeights", weights, "double[]")
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n")
      val keys = ctx.freshName("keys")
      val anyNull = ctx.freshName("anyNull")
      val b = ctx.freshName("b")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val key = ctx.freshName("key")
      val acc = ctx.freshName("acc")
      val off = ctx.freshName("off")
      s"""
         |int $n = $v.numElements();
         |if ($n != $dim) {
         |  throw new IllegalArgumentException(
         |    "lshBandKeys: expected $dim-dim vector, got " + $n);
         |}
         |long[] $keys = new long[$bands];
         |boolean $anyNull = false;
         |for (int $j = 0; $j < $n; $j++) {
         |  if ($v.isNullAt($j)) { $anyNull = true; break; }
         |}
         |if (!$anyNull) {
         |  for (int $b = 0; $b < $bands; $b++) {
         |    long $key = 0L;
         |    for (int $i = 0; $i < $r; $i++) {
         |      int $off = ($b * $r + $i) * $dim;
         |      double $acc = 0.0;
         |      for (int $j = 0; $j < $n; $j++) {
         |        $acc += ${getter(v, j)} * $wRef[$off + $j];
         |      }
         |      if ($acc > 0) $key |= (1L << $i);
         |    }
         |    $keys[$b] = $key;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($keys);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): LshBandKeys =
    copy(child = newChild)
}

object LshBandKeys {
  import org.apache.spark.sql.graftbridge.Bridge

  /** Deterministic pseudo-random hyperplane weight for (plane,
    * 1-based dim): top 60 bits of md5("plane:dim") mapped to
    * (-0.5, 0.5). The exact arithmetic of the DuckDB-side rendering
    * in [[graft.ann.Ann]] — md5-keyed so the oracle computes the
    * identical matrix symbolically.
    */
  def planeWeight(plane: Int, dim1: Int): Double =
    (HashSeeds.md5TopLong(s"$plane:$dim1") % 100000L)
      .toDouble / 100000.0 - 0.5

  /** Column-level entry point. */
  def lsh_band_keys(vec: Column, bands: Int, r: Int, dim: Int): Column =
    Bridge.column(LshBandKeys(Bridge.expression(vec), bands, r, dim))
}
