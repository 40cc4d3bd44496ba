package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Literal}
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
  *
  * `chunk` selects a [[PdfGlyphRuns.MaxRuns]]-sized WINDOW of parsed runs
  * (chunk k = parsed runs [k·MaxRuns, (k+1)·MaxRuns)): the patch-split
  * analog (reference `jax_denoising_adapter.py:293-348` — fixed-size
  * patches bound the per-unit working set of an unboundedly large input).
  * Chunk 0 is exactly the unchunked parse; over-cap payloads are processed
  * by evaluating successive chunks (each an O(payload) skip-scan — only
  * rows that actually exceeded the cap pay it) and concatenating, so
  * "truncated" means chunk-capped, not content-dropped-at-MaxRuns. Line
  * numbers are offset chunk·MaxRuns so merged chunks keep a total
  * reading order (chunk-major; the XY-cut runs per chunk — the patch-seam
  * tradeoff the reference blends with overlapping windows). `chunk` is an
  * expression child (not a constructor constant) so the chunk index can
  * be a `transform(sequence(...))` lambda variable — the whole chunked
  * evaluation stays one declarative projection.
  */
case class PdfGlyphRuns(child: Expression, chunk: Expression = Literal(0))
    extends BinaryExpression {

  override def left: Expression = child
  override def right: Expression = chunk
  override def dataType: DataType = PdfGlyphRuns.outType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pdf_glyph_runs"
  // analysis-time typing (review fix): without an input-type check a
  // SQL call like pdf_glyph_runs(text, 1::BIGINT) passed analysis and
  // crashed per-row in codegen/eval (evalUtf8 takes (UTF8String, Int));
  // this makes it a plan-time error instead
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    import org.apache.spark.sql.types.{IntegerType, StringType}
    if (child.dataType != StringType)
      TypeCheckFailure(s"$prettyName expects a STRING payload, got " +
        child.dataType.simpleString)
    else if (chunk.dataType != IntegerType)
      TypeCheckFailure(s"$prettyName expects an INT chunk index, got " +
        chunk.dataType.simpleString)
    else TypeCheckSuccess
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PdfGlyphRuns =
    copy(child = newLeft, chunk = newRight)

  override def nullSafeEval(input: Any, chunkVal: Any): Any =
    PdfGlyphRuns.evalUtf8(input.asInstanceOf[UTF8String],
      chunkVal.asInstanceOf[Int])

  /** codegen = a static call — keeps the staged projection inside
    * whole-stage codegen instead of breaking the span (CodegenFallback
    * would route every row through the interpreted eval path).
    */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (c, k) => s"graft.expressions.PdfGlyphRuns.evalUtf8($c, $k)")
}

object PdfGlyphRuns {

  /** static eval shared by interpreted and generated code paths */
  def evalUtf8(input: UTF8String): ArrayData = evalUtf8(input, 0)

  def evalUtf8(input: UTF8String, chunk: Int): ArrayData = {
    val runs = parse(input.toString, chunk)
    new GenericArrayData(runs.map { r =>
      InternalRow(r.line, r.x, r.y, UTF8String.fromString(r.text), r.start, r.end)
    }.toArray[Any])
  }

  /** y-distance above which two runs belong to different text lines */
  val RowTol = 10

  /** hard cap on parsed runs per payload — the page-cap analog (reference
    * MAX_PAGES, `pipeline.py:1413-1414`): a hostile 100 MB payload row
    * stops parsing here instead of materializing an unbounded array.
    */
  val MaxRuns = 5000

  /** chunked-processing bound (G9 patch-split analog): over-cap payloads
    * are evaluated in up to MaxChunks successive [[MaxRuns]] windows, so
    * the per-row working set stays ≤ MaxChunks·MaxRuns runs and a
    * hostile payload costs at most MaxChunks O(payload) passes.
    * "truncated" lineage means the CHUNK bound fired (content beyond
    * MaxChunks·MaxRuns parsed runs was dropped), not the single-window
    * cap.
    */
  val MaxChunks = 2

  /** minimum x-projection gap (px) that counts as a column gutter for
    * the XY-cut: ~8.5 char cells. Word-scale spacing (a few cells, even
    * when coincidentally aligned across every line of a short page) must
    * never split columns; a real gutter in the payload format is ≥ 80 px.
    */
  val MinXGap = 60

  /** char-cell width of the text-encoded payload format (FIXTURES.md §2:
    * x = 40 + charOffset·7); a PDFBox-backed source would carry real
    * glyph advances through the same interface.
    */
  val CharW = 7

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

  def parse(s: String): Array[Run] = parse(s, 0)

  /** Parse the `chunk`-th [[MaxRuns]]-sized window of parsed runs. The
    * scan always starts from the payload head (run windows are defined in
    * PARSED-run index space, and whether a line parses is only known by
    * parsing it), so chunk k costs one O(payload) pass — paid only by
    * rows whose candidate count exceeded the previous windows.
    */
  def parse(s: String, chunk: Int): Array[Run] = {
    val lo = chunk * MaxRuns
    val hi = lo + MaxRuns
    var parsed = 0
    val n = s.length
    // skip leading whitespace, tolerate ONE wrapping tag (the sniffing
    // cascade routes `<div>…%PDF-…` payloads here — reference analog:
    // magic-byte validation looks past container framing,
    // `pipeline.py:2615-2685`), then require the %PDF- header line
    var i = 0
    while (i < n && Character.isWhitespace(s.charAt(i))) i += 1
    if (i < n && s.charAt(i) == '<') {
      val close = s.indexOf('>', i)
      if (close < 0 || close - i > 200) return Array.empty
      i = close + 1
      while (i < n && Character.isWhitespace(s.charAt(i))) i += 1
    }
    if (!s.startsWith("%PDF-", i)) return Array.empty
    val headerEnd = s.indexOf('\n', i)
    if (headerEnd < 0) return Array.empty
    i = headerEnd + 1

    val runs = scala.collection.mutable.ArrayBuffer.empty[Run]
    while (i < n && parsed < hi) {
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
            if (parsed >= lo) runs += Run(0, x, y, s.substring(j, eol), j, eol)
            parsed += 1
          case _ => // malformed run line: skipped
        }
      }
      i = eol + 1
    }

    // layout analysis: recursive XY-cut (largest-gap-first) assigns
    // reading-order line numbers — left column reads fully before right.
    // Chunk offset keeps merged chunks in a total chunk-major order.
    val arr = runs.toArray
    if (arr.nonEmpty) {
      assignLines(arr)
      if (lo > 0) {
        var k = 0
        while (k < arr.length) { arr(k).line += lo; k += 1 }
      }
    }
    arr
  }

  /** Recursive XY-cut layout analysis (north-star "XY-cut layout
    * analysis"; reference ordering concern
    * `pytorch_mobile/ocr_pipeline.py:655-664`): at each level, split on
    * the LARGEST projection gap — a full-height column gutter (x gap ≥
    * [[MinXGap]]) beats inter-line gaps, so two-column pages order
    * column-major; within a column, y gaps split into text-line bands
    * exactly like the 1-D banding this replaces (single-column payloads
    * get identical line numbers). Depth-capped; leaves fall back to
    * y-banding, so hostile inputs degrade instead of recursing unbounded.
    */
  private def assignLines(all: Array[Run]): Unit = {
    var nextLine = 0

    def yBands(rs: Array[Run]): Array[Array[Run]] = {
      val byY = rs.sortBy(r => (r.y, r.x, r.start))
      val bands = scala.collection.mutable.ArrayBuffer.empty[Array[Run]]
      var start = 0
      var k = 1
      while (k <= byY.length) {
        if (k == byY.length || byY(k).y - byY(k - 1).y > RowTol) {
          bands += byY.slice(start, k)
          start = k
        }
        k += 1
      }
      bands.toArray
    }

    def leaf(rs: Array[Run]): Unit =
      yBands(rs).foreach { band =>
        band.foreach(_.line = nextLine)
        nextLine += 1
      }

    /** largest gap in the merged y-interval projection ([y, y+RowTol]) */
    def maxYGap(rs: Array[Run]): Int = {
      val ys = rs.map(_.y).sorted
      var best = 0
      var maxEnd = ys(0) + RowTol
      var k = 1
      while (k < ys.length) {
        val g = ys(k) - maxEnd
        if (g > best) best = g
        val e = ys(k) + RowTol
        if (e > maxEnd) maxEnd = e
        k += 1
      }
      best
    }

    /** (largest x gap ≥ MinXGap, split x) over [x, x + CharW·len) */
    def maxXGap(rs: Array[Run]): (Int, Int) = {
      val iv = rs.map(r => (r.x, r.x + CharW * r.text.length)).sortBy(_._1)
      var best = 0
      var split = 0
      var maxEnd = iv(0)._2
      var k = 1
      while (k < iv.length) {
        val g = iv(k)._1 - maxEnd
        if (g > best) { best = g; split = maxEnd + g / 2 }
        if (iv(k)._2 > maxEnd) maxEnd = iv(k)._2
        k += 1
      }
      if (best >= MinXGap) (best, split) else (0, 0)
    }

    def cut(rs: Array[Run], depth: Int): Unit =
      if (depth > 32 || rs.length <= 1) leaf(rs)
      else {
        val yg = maxYGap(rs)
        // a column cut needs a gutter spanning MULTIPLE text lines —
        // a single y-band is one line of text, whatever its word spacing
        val (xg, xsplit) = if (yg > 0) maxXGap(rs) else (0, 0)
        if (xg > yg) {
          val (l, r) = rs.partition(_.x < xsplit)
          cut(l, depth + 1)
          cut(r, depth + 1)
        } else if (yg > 0) {
          yBands(rs).foreach(cut(_, depth + 1))
        } else leaf(rs)
      }

    cut(all, 0)
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
