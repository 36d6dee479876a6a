// This file lives under org.apache.spark.sql (the conventional home for
// third-party Catalyst expressions) because the expression-extension API
// surface (AbstractDataType, ExpressionUtils.column) is private[sql].
// It is graft's code, not Spark's — see the project root for license/origin.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native Catalyst expression — the text
  * canonicalization step a web-corpus pipeline runs before hashing or
  * dedup (the same logical text arrives both precomposed, `é` = U+00E9,
  * and decomposed, `e` + U+0301; exact dedup and shingle hashes treat
  * those as different documents unless normalized first).
  *
  * Spark ships no normalization function, and a Scala UDF would break
  * whole-stage codegen (the repo's zero-UDF policy, SURVEY.md §2.11).
  * This expression stays inside codegen via a static call, and takes a
  * no-allocation fast path when the input is already NFC — true for
  * ASCII, i.e. the overwhelming majority of rows at corpus scale, so
  * the normalizer costs one `isNormalized` scan per row in the common
  * case.
  *
  * Oracle parity: the DuckDB twin is `nfc_normalize(...)`. Both sides
  * implement Unicode canonical composition; the injected test alphabet
  * (Latin letters + combining acute/diaeresis) has had stable NFC
  * behavior since Unicode 1.1, so JDK-vs-ICU Unicode-version skew
  * cannot bite.
  */
case class NfcNormalize(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)

  override def dataType: DataType = StringType

  override def prettyName: String = "graft_nfc"

  override def nullSafeEval(s: Any): Any =
    NfcNormalize.nfc(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"org.apache.spark.sql.graft.NfcNormalize.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NfcNormalize {
  /** Static eval shared by the interpreted and codegen paths (one
    * implementation — the two paths cannot diverge). */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  /** Column-API surface: `nfc(c)` over a string column. */
  def nfc(c: Column): Column =
    ExpressionUtils.column(NfcNormalize(ExpressionUtils.expression(c)))
}
