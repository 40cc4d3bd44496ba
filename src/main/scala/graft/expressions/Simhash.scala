package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash of whitespace-tokenized text as ONE native expression —
  * the escalation path VecDot already took: the declarative form
  * ([[graft.dedup.Dedup.simhashFromHashes]]) runs 64 separate `aggregate`
  * passes over the token-hash array per row (measured 8 s at sf0.1);
  * this evaluates tokenize → xxhash64 → 64 bit votes in a single pass
  * with a stack vote array and no allocations beyond the token walk.
  *
  * Semantics are IDENTICAL to the declarative pipeline
  * `simhashFromHashes(tokenHashes(text))` (asserted by DedupSpec):
  * tokens = space-trimmed text split on `\s+`, token hash = Spark's
  * `xxhash64` (XXH64 over UTF-8 bytes, seed 42), bit b set iff the
  * +1/−1 vote over token bits is strictly positive.
  *
  * Reference analog: document fingerprinting for near-dup detection —
  * the graft-side LLM-data-pipeline operator family (builder prompt);
  * hashing role as in `pipeline.py:2580-2585` (sha256 lineage hashes).
  */
case class Simhash(child: Expression) extends UnaryExpression
    with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash64"

  override protected def withNewChildInternal(newChild: Expression): Simhash =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any =
    Simhash.evalUtf8(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.Simhash.evalUtf8($c)")
}

object Simhash {

  private val Seed = 42L // Spark's xxhash64 default seed

  /** hoisted: String.split("\\s+") recompiles the pattern per call */
  private val WS = java.util.regex.Pattern.compile("\\s+")

  /** static eval shared by interpreted and generated code paths */
  def evalUtf8(input: UTF8String): Long = {
    val s = input.toString
    // Spark `trim` strips ' ' only; then split("\\s+") — replicate exactly
    var lo = 0
    var hi = s.length
    while (lo < hi && s.charAt(lo) == ' ') lo += 1
    while (hi > lo && s.charAt(hi - 1) == ' ') hi -= 1
    val trimmed = s.substring(lo, hi)

    val votes = new Array[Int](64)
    val toks = WS.split(trimmed, -1)
    var t = 0
    while (t < toks.length) {
      val u = UTF8String.fromString(toks(t))
      val h = XXH64.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, Seed)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      t += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }
}
