package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Glyph-run extraction for PDF-like payloads: `PdfGlyphRuns(text)` →
  * `array<struct<line,x,y,text,start,end>>`.
  *
  * Payload format (FIXTURES.md §2, the sandbox stand-in for a PDFBox-backed
  * glyph source — no PDFBox jar ships with the sandbox): a `%PDF-` header
  * line, then one glyph run per line `G <x> <y> <fontSize> <text...>`, in
  * ARBITRARY order. The expression parses runs with raw char offsets and
  * performs the layout-analysis step: 1-D gap clustering of y coordinates
  * into text lines (`line` field). The reading-order SORT and the line
  * assembly stay downstream as declarative Catalyst `array_sort`/`aggregate`
  * (see `graft.operators.PdfPath`).
  *
  * Reference analog: bbox detection + clockwise point ordering feeding
  * reading-order concatenation (`pytorch_mobile/ocr_pipeline.py:655-664`,
  * `:777-803`); the y-band tolerance plays the role of the deskew tolerance
  * (`pipeline.py:515-556`).
  *
  * Malformed run lines are skipped (no exceptions — bad rows degrade, they
  * don't kill the job, mirroring `_validate_file_format`'s role but with
  * row-level status semantics, SURVEY S3).
  */
case class PdfGlyphRuns(child: Expression) extends UnaryExpression {

  override def dataType: DataType = PdfGlyphRuns.outType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pdf_glyph_runs"

  override protected def withNewChildInternal(newChild: Expression): PdfGlyphRuns =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any =
    PdfGlyphRuns.evalUtf8(input.asInstanceOf[UTF8String])

  /** codegen = a static call — keeps the staged projection inside
    * whole-stage codegen instead of breaking the span (CodegenFallback
    * would route every row through the interpreted eval path).
    */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.PdfGlyphRuns.evalUtf8($c)")
}

object PdfGlyphRuns {

  /** static eval shared by interpreted and generated code paths */
  def evalUtf8(input: UTF8String): ArrayData = {
    val runs = parse(input.toString)
    new GenericArrayData(runs.map { r =>
      InternalRow(r.line, r.x, r.y, UTF8String.fromString(r.text), r.start, r.end)
    }.toArray[Any])
  }

  /** y-distance above which two runs belong to different text lines */
  val RowTol = 10

  val runStruct: StructType = StructType(Seq(
    StructField("line", IntegerType, nullable = false),
    StructField("x", IntegerType, nullable = false),
    StructField("y", IntegerType, nullable = false),
    StructField("text", StringType, nullable = false),
    StructField("start", IntegerType, nullable = false),
    StructField("end", IntegerType, nullable = false)))

  val outType: DataType = ArrayType(runStruct, containsNull = false)

  final case class Run(var line: Int, x: Int, y: Int, text: String,
      start: Int, end: Int)

  def parse(s: String): Array[Run] = {
    val n = s.length
    // skip leading whitespace, then require the %PDF- header line
    var i = 0
    while (i < n && Character.isWhitespace(s.charAt(i))) i += 1
    if (!s.startsWith("%PDF-", i)) return Array.empty
    val headerEnd = s.indexOf('\n', i)
    if (headerEnd < 0) return Array.empty
    i = headerEnd + 1

    val runs = scala.collection.mutable.ArrayBuffer.empty[Run]
    while (i < n) {
      val eol0 = s.indexOf('\n', i)
      val eol = if (eol0 < 0) n else eol0
      // parse "G <x> <y> <size> <text...>" between i and eol
      if (eol - i > 2 && s.charAt(i) == 'G' && s.charAt(i + 1) == ' ') {
        var j = i + 2
        def int(): Option[Int] = {
          var v = 0L; var any = false; var neg = false
          if (j < eol && s.charAt(j) == '-') { neg = true; j += 1 }
          while (j < eol && s.charAt(j) >= '0' && s.charAt(j) <= '9') {
            v = v * 10 + (s.charAt(j) - '0'); any = true; j += 1
            if (v > Int.MaxValue) return None
          }
          if (!any || j >= eol || s.charAt(j) != ' ') None
          else { j += 1; Some(if (neg) (-v).toInt else v.toInt) }
        }
        (int(), int(), int()) match {
          case (Some(x), Some(y), Some(_)) if j < eol =>
            runs += Run(0, x, y, s.substring(j, eol), j, eol)
          case _ => // malformed run line: skipped
        }
      }
      i = eol + 1
    }

    // layout analysis: 1-D gap clustering of y into text lines
    if (runs.nonEmpty) {
      val byY = runs.toArray.sortBy(r => (r.y, r.x, r.start))
      var line = 0
      var prevY = byY(0).y
      byY.foreach { r =>
        if (r.y - prevY > RowTol) line += 1
        r.line = line
        prevY = r.y
      }
    }
    runs.toArray
  }

  /** number of candidate run lines (for parse-confidence), counted cheaply */
  def candidateCount(s: String): Int = {
    var c = 0
    var i = s.indexOf('\n')
    while (i >= 0 && i + 2 < s.length) {
      if (s.charAt(i + 1) == 'G' && s.charAt(i + 2) == ' ') c += 1
      i = s.indexOf('\n', i + 1)
    }
    c
  }
}
