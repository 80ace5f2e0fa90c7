package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.types.{DataType, StringType}

/** Native Catalyst expression: Unicode NFC normalization (canonical
  * composition) of a string column — the first step of every text-cleaning
  * pipeline, and a function Spark lacks natively (DuckDB ships it as
  * `nfc_normalize`, which is what the oracle compares against).
  *
  * Composition matters for dedup: "é" (U+00E9) and "e"+U+0301 are distinct
  * byte sequences that hash apart, so un-normalized corpora under-dedup.
  * `java.text.Normalizer` is the JDK's implementation of UAX #15; NFC is
  * idempotent, so re-normalizing already-clean ASCII (the common case) is
  * a no-op the fast-path check below skips without allocating.
  *
  * Codegen note: the expression stays inside whole-stage codegen (no UDF
  * serialization boundary); `Normalizer.isNormalized` is the documented
  * quick check and avoids the String round-trip entirely for ASCII input.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING argument, got ${child.dataType.sql}")

  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalize.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  import java.text.Normalizer

  /** Shared by interpreted eval and generated code. */
  def normalize(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }

  /** DataFrame-API door; resolves through the session function registry. */
  def apply(c: Column): Column =
    org.apache.spark.sql.functions.call_function("nfc_normalize", c)
}
