package graft.expressions

import java.util.Locale
import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Text-KIE candidate selection (`pipeline.py:2244-2303` re-expressed) as
  * ONE native expression: `KieBest(preprocessedText)` →
  * `struct<ke:int, kc:int>` (best electricity / carbon candidates, null
  * when none).
  *
  * Semantics are IDENTICAL to the declarative token pipeline in
  * [[graft.operators.FieldExtract]] (and to its DuckDB oracle twin):
  * whitespace tokens fully matching the number shape are candidates,
  * context = ±5 neighboring tokens joined+lowercased, keyword scores ×2
  * plus unit boosts ×3, range guards, best by (score desc, |v−center|
  * asc, position asc). The declarative form ran the tokenize → slice →
  * join → lower → contains chain per token per field through interpreted
  * eval (~4 ms/row measured at sf0.1); this walks the token array once.
  */
case class KieBest(child: Expression) extends UnaryExpression
    with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)

  override def dataType: DataType = KieBest.outType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "kie_best"

  override protected def withNewChildInternal(newChild: Expression): KieBest =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any =
    KieBest.evalUtf8(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.KieBest.evalUtf8($c)")
}

object KieBest {

  val outType: DataType = StructType(Seq(
    StructField("ke", IntegerType, nullable = true),
    StructField("kc", IntegerType, nullable = true)))

  /** full-token number shape — same alternation (and its quirks) as the
    * chain patterns' numAlt
    */
  private val numToken: Pattern =
    Pattern.compile("""(?:\d{1,3}(?:,\d{3})*|\d{2,5})""")

  private val CtxTokens = 5

  private val elecKws = Array("kwh", "electricity", "consumption", "usage",
    "electric", "reading")
  private val carbKws = Array("co2", "carbon", "footprint", "emission", "kg",
    "environmental", "c02")
  private val elecBoost = Array("kwh")
  private val carbBoost = Array("co2e", "co2", "kg")

  def evalUtf8(input: UTF8String): InternalRow = {
    val toks = input.toString.split("\\s+", -1)
    var bestE = Long.MaxValue
    var bestC = Long.MaxValue
    var i = 0
    while (i < toks.length) {
      val tok = toks(i)
      if (tok.nonEmpty && numToken.matcher(tok).matches()) {
        val vs =
          if (tok.indexOf(',') >= 0) tok.replace(",", "") else tok
        if (vs.length >= 1 && vs.length <= 7) {
          val v = java.lang.Long.parseLong(vs)
          if (v >= 10 && v <= 100000) {
            // context = ±CtxTokens neighbors, joined + lowercased
            val lo = math.max(0, i - CtxTokens)
            val hi = math.min(toks.length - 1, i + CtxTokens)
            // array_join semantics: separator between EVERY pair, empty
            // elements included (a length-based check would drop the
            // separator after a leading empty token)
            val sb = new java.lang.StringBuilder(64)
            var first = true
            var j = lo
            while (j <= hi) {
              if (j != i) {
                if (!first) sb.append(' ')
                sb.append(toks(j))
                first = false
              }
              j += 1
            }
            val ctx = sb.toString.toLowerCase(Locale.ROOT)
            val idx = math.min(i + 1L, 1000L) // 1-based, capped

            var es = 0L
            var k = 0
            while (k < elecKws.length) {
              if (ctx.contains(elecKws(k))) es += 2; k += 1
            }
            if (ctx.contains(elecBoost(0))) es += 3
            if (es > 0 && v >= 50 && v <= 50000) {
              val key = (35L - es) * (1L << 48) +
                math.abs(v - 300L) * (1L << 28) + idx * (1L << 18) + v
              if (key < bestE) bestE = key
            }

            var cs = 0L
            k = 0
            while (k < carbKws.length) {
              if (ctx.contains(carbKws(k))) cs += 2; k += 1
            }
            var boosted = false
            k = 0
            while (k < carbBoost.length && !boosted) {
              boosted = ctx.contains(carbBoost(k)); k += 1
            }
            if (boosted) cs += 3
            if (cs > 0 && v >= 10 && v <= 20000) {
              val key = (35L - cs) * (1L << 48) +
                math.abs(v - 120L) * (1L << 28) + idx * (1L << 18) + v
              if (key < bestC) bestC = key
            }
          }
        }
      }
      i += 1
    }
    val ke: Any =
      if (bestE == Long.MaxValue) null else (bestE % (1L << 18)).toInt
    val kc: Any =
      if (bestC == Long.MaxValue) null else (bestC % (1L << 18)).toInt
    InternalRow(ke, kc)
  }
}
