package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expr}

import graft.expressions.{HtmlBlocks, PdfGlyphRuns}

/** Column facade + SQL registration for the graft's two custom Catalyst
  * expressions. Everything else in the engine is Spark built-ins.
  */
object GraftFunctions {

  /** `html_blocks(text)` → array<struct<text,start,end,words,link_words,boiler>> */
  def html_blocks(text: Column): Column =
    column(HtmlBlocks(expr(text)))

  /** `pdf_glyph_runs(text)` → array<struct<line,x,y,text,start,end>> */
  def pdf_glyph_runs(text: Column): Column =
    column(PdfGlyphRuns(expr(text)))

  /** Register both for SQL use (`SELECT html_blocks(text) ...`). */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction(
      "html_blocks", exprs => HtmlBlocks(exprs.head), "built-in")
    reg.createOrReplaceTempFunction(
      "pdf_glyph_runs", exprs => PdfGlyphRuns(exprs.head), "built-in")
  }
}
