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

  /** Register the expressions for SQL use (`SELECT html_blocks(text)…`). */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction(
      "html_blocks", exprs => HtmlBlocks(exprs.head), "built-in")
    reg.createOrReplaceTempFunction(
      "pdf_glyph_runs", exprs =>
        if (exprs.length >= 2) PdfGlyphRuns(exprs.head, exprs(1))
        else PdfGlyphRuns(exprs.head), "built-in")
    reg.createOrReplaceTempFunction(
      "simhash64", exprs => Simhash(exprs.head), "built-in")
    reg.createOrReplaceTempFunction(
      "kie_best", exprs => KieBest(exprs.head), "built-in")
    reg.createOrReplaceTempFunction(
      "token_spans", exprs => TokenSpans(exprs.head), "built-in")
  }
}
