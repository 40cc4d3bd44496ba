package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Rolling polynomial fingerprint `fold(acc·31 + char) mod 1e9+7` as ONE
  * native expression — the [[Simhash]]/[[MinhashSig]] escalation path:
  * the declarative form ([[graft.textanalysis.TextAnalysis
  * .fingerprintDeclarative]], kept as the cross-checked spec) materializes
  * a one-character UTF8String PER CHARACTER via `split(text, "")` before
  * folding — the dominant allocation in the t01 analysis pass.
  *
  * Semantics are IDENTICAL to `aggregate(split(text, ""), 0L,
  * (acc, c) => (acc*31 + ascii(c)) % 1000000007)`: CODE-POINT iteration —
  * Java regex split("") breaks between code points, so an astral pair
  * stays one element and Spark's ascii (codePointAt) folds its code
  * point; a LONE surrogate is its own element, which
  * UTF8String.fromString turns into '?' → folds as 63. ascii("") = 0
  * keeps the empty string at 0. Spec-equivalence test covers empty,
  * BMP, astral-pair and lone-surrogate inputs. The DuckDB twin in
  * `TextAnalysis.oracle` is unchanged (codepoint semantics there too).
  */
case class Fingerprint(child: Expression) extends UnaryExpression
    with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "fingerprint64"

  override protected def withNewChildInternal(newChild: Expression): Fingerprint =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any =
    Fingerprint.evalUtf8(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.Fingerprint.evalUtf8($c)")
}

object Fingerprint {

  private val P = 1000000007L

  /** static eval shared by interpreted and generated code paths */
  def evalUtf8(input: UTF8String): Long = {
    val s = input.toString
    var acc = 0L
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      val v =
        if (Character.isHighSurrogate(c) && i + 1 < s.length &&
          Character.isLowSurrogate(s.charAt(i + 1))) {
          i += 1
          Character.toCodePoint(c, s.charAt(i))
        } else if (Character.isSurrogate(c)) 63
        else c.toInt
      acc = (acc * 31 + v) % P
      i += 1
    }
    acc
  }
}
