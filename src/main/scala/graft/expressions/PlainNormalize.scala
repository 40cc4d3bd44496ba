package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Whitespace collapse + numeric-context OCR char correction as ONE
  * native single-pass expression — the plain path's entire projection
  * (reference char-correction `pipeline.py:1296-1336`; SURVEY X6/X11).
  *
  * This is the extraction job's HOT stage: every plain/tooljson turn and
  * every τ-ladder fallback pays it, and the declarative form
  * (trim-regex ×2 → split → per-token transform with TWO rlike matches
  * and a translate → array_join) spends its time in per-token regex
  * invocations and small-array allocation — measured 3.1 s of a 4.0 s
  * full-Extract pass at 400 k turns. Here the token gate is a hand
  * character-class loop and the whole output builds into one buffer.
  *
  * Semantics are IDENTICAL to the declarative pipeline, kept as
  * [[graft.functions.TextFunctions.plainNormalizeDeclarative]] and
  * cross-checked in FunctionsSpec (hand cases + ScalaCheck equivalence):
  * tokens = Java-regex `\s+` split of the `\A\s+`/`\s+\z`-trimmed text
  * (an all-whitespace remainder yields one empty token, matching Spark
  * split's limit -1); a token rewrites through the confusables map
  * l,I,|→1 O,o→0 Z,z→2 S,s→5 G→6 g→9 B,b→8 iff ALL its chars are in
  * `[0-9lIoOzZsSgGbB|]` and at least one is a digit; join with single
  * spaces. Blank/null gating stays OUTSIDE in
  * [[graft.functions.TextFunctions.plainNormalize]].
  */
case class PlainNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "plain_normalize"

  override protected def withNewChildInternal(newChild: Expression): PlainNormalize =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any =
    PlainNormalize.evalUtf8(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.PlainNormalize.evalUtf8($c)")
}

object PlainNormalize {

  // java.util.regex \s == the Java-regex \s Spark's regexp_replace/split
  // use (NOT Unicode whitespace) — same hoisted patterns as TokenSpans
  private val WS = java.util.regex.Pattern.compile("\\s+")
  private val LeadWS = java.util.regex.Pattern.compile("\\A\\s+")
  private val TrailWS = java.util.regex.Pattern.compile("\\s+\\z")

  /** confusables map (TextFunctions.ConfusablesFrom/To) */
  private def mapChar(c: Char): Char = c match {
    case 'l' | 'I' | '|' => '1'
    case 'O' | 'o' => '0'
    case 'Z' | 'z' => '2'
    case 'S' | 's' => '5'
    case 'G' => '6'
    case 'g' => '9'
    case 'B' | 'b' => '8'
    case other => other
  }

  /** membership in the non-digit part of `[0-9lIoOzZsSgGbB|]` */
  private def confusable(c: Char): Boolean = c match {
    case 'l' | 'I' | '|' | 'O' | 'o' | 'Z' | 'z' | 'S' | 's' | 'G' | 'g' |
        'B' | 'b' => true
    case _ => false
  }

  /** static eval shared by interpreted and generated code paths */
  def evalUtf8(input: UTF8String): UTF8String = {
    val s0 = input.toString
    val s1 = LeadWS.matcher(s0).replaceFirst("")
    val s = TrailWS.matcher(s1).replaceFirst("")
    val toks = WS.split(s, -1) // "" → [""], matching Spark split semantics
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < toks.length) {
      if (i > 0) sb.append(' ')
      val t = toks(i)
      var ok = t.length > 0
      var hasDigit = false
      var j = 0
      while (ok && j < t.length) {
        val c = t.charAt(j)
        if (c >= '0' && c <= '9') hasDigit = true
        else if (!confusable(c)) ok = false
        j += 1
      }
      if (ok && hasDigit) {
        var k = 0
        while (k < t.length) { sb.append(mapChar(t.charAt(k))); k += 1 }
      } else sb.append(t)
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }
}
