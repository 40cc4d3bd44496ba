package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expr}

import graft.expressions.{HtmlBlocks, KieBest, PdfGlyphRuns, Simhash, TokenSpans}

/** Column facade + SQL registration for the graft's custom Catalyst
  * expressions. Everything else in the engine is Spark built-ins.
  */
object GraftFunctions {

  /** `html_blocks(text)` → array<struct<text,start,end,words,link_words,
    * boiler,cwords,clink_words,cmax_words>>
    */
  def html_blocks(text: Column): Column =
    column(HtmlBlocks(expr(text)))

  /** `pdf_glyph_runs(text)` → array<struct<line,x,y,text,start,end>> */
  def pdf_glyph_runs(text: Column): Column =
    column(PdfGlyphRuns(expr(text)))

  /** `pdf_glyph_runs(text, chunk)` — the `chunk`-th
    * [[graft.expressions.PdfGlyphRuns.MaxRuns]]-sized window of parsed
    * runs (chunked mega-payload processing; chunk may be a
    * `transform(sequence(...))` lambda variable)
    */
  def pdf_glyph_runs(text: Column, chunk: Column): Column =
    column(PdfGlyphRuns(expr(text), expr(chunk)))

  /** `simhash64(text)` → 64-bit document fingerprint (long) */
  def simhash64(text: Column): Column =
    column(Simhash(expr(text)))

  /** `kie_best(text)` → struct<ke:int,kc:int> best field candidates */
  def kie_best(text: Column): Column =
    column(KieBest(expr(text)))

  /** `token_spans(text)` → array<struct<tok,start,end>> whitespace tokens
    * with offsets in the single-space-collapsed string
    */
  def token_spans(text: Column): Column =
    column(TokenSpans(expr(text)))

  /** Exact-arity gate for SQL registration (review fix: `exprs.head`
    * builders silently DROPPED surplus arguments — e.g. a misremembered
    * html_blocks(text, limit) analyzed fine and ignored the limit).
    * Shared with [[graft.GraftExtensions]] — one gate, one message shape.
    */
  private[graft] def arity[T](name: String, ns: Set[Int])(
      f: Seq[org.apache.spark.sql.catalyst.expressions.Expression] => T)(
      exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]): T = {
    require(ns.contains(exprs.length),
      s"$name expects ${ns.toSeq.sorted.mkString(" or ")} argument(s), " +
        s"got ${exprs.length}")
    f(exprs)
  }

  /** Register the expressions for SQL use (`SELECT html_blocks(text)…`). */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction(
      "html_blocks",
      arity("html_blocks", Set(1))(exprs => HtmlBlocks(exprs.head)), "built-in")
    reg.createOrReplaceTempFunction(
      "pdf_glyph_runs",
      arity("pdf_glyph_runs", Set(1, 2))(exprs =>
        if (exprs.length == 2) PdfGlyphRuns(exprs.head, exprs(1))
        else PdfGlyphRuns(exprs.head)), "built-in")
    reg.createOrReplaceTempFunction(
      "simhash64",
      arity("simhash64", Set(1))(exprs => Simhash(exprs.head)), "built-in")
    reg.createOrReplaceTempFunction(
      "kie_best",
      arity("kie_best", Set(1))(exprs => KieBest(exprs.head)), "built-in")
    reg.createOrReplaceTempFunction(
      "token_spans",
      arity("token_spans", Set(1))(exprs => TokenSpans(exprs.head)), "built-in")
  }
}
