package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: Unicode normalization of a string
  * column — the canonicalization step a dedup/fingerprint pipeline
  * runs BEFORE hashing (CCNet normalizes before building its hash
  * table): "café" typed as `e + COMBINING ACUTE` and as the
  * precomposed `é` are different byte sequences, so without
  * normalization every md5/minhash/simhash operator in this library
  * sees them as different documents.
  *
  * Why a custom `Expression` rather than a UDF: Spark has NO
  * normalization builtin, and `doGenCode` keeps the call inside
  * whole-stage codegen (one static `java.text.Normalizer` call per
  * row — `Normalizer.normalize` fast-paths already-normalized text,
  * which real corpora overwhelmingly are, so the steady-state cost
  * is a scan). Map-only at any scale.
  *
  * `form` is one of NFC / NFD / NFKC / NFKD (validated at
  * construction). Cross-engine: DuckDB exposes `nfc_normalize` —
  * the NFC form is oracle-gated; composition data for the
  * characters used in gates is stable across Unicode versions
  * (normalization of ASSIGNED characters is stabilized by the
  * Unicode standard, so JVM-vs-utf8proc version skew cannot change
  * it).
  */
case class NormalizeText(child: Expression, form: String)
    extends UnaryExpression {

  require(Set("NFC", "NFD", "NFKC", "NFKD").contains(form),
    s"form $form must be one of NFC/NFD/NFKC/NFKD")

  override def dataType: DataType = StringType

  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(java.text.Normalizer.normalize(
      input.asInstanceOf[UTF8String].toString,
      java.text.Normalizer.Form.valueOf(form)))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |  java.text.Normalizer.normalize($c.toString(),
         |    java.text.Normalizer.Form.$form));
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): NormalizeText =
    copy(child = newChild)
}

object NormalizeText {
  import org.apache.spark.sql.graftbridge.Bridge

  /** Column-level entry point. */
  def normalize_text(c: Column, form: String = "NFC"): Column =
    Bridge.column(NormalizeText(Bridge.expression(c), form))

  /** Register `nfc_normalize` (DuckDB's name, NFC form) for SQL use
    * in this session.
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "nfc_normalize", exprs => NormalizeText(exprs.head, "NFC"), "built-in")
}
