package graft.gen

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Closed-form PDF-payload synthesis for the extract-core value oracle
  * (x19): every payload is derived arithmetically from `doc_id`, so the
  * FULL `Extract` output — reading-order text, raw-char spans, parse
  * confidence, status, block counts — has a closed form a DuckDB oracle
  * can recompute without running the tokenizer. This puts the engine's
  * pdf core (glyph-run parse S2/G1, recursive XY-cut G3, reading-order
  * sort W2, line assembly A3, parse-fraction confidence, τ-ladder plain
  * fallback) under the driver's hash compare; the reference's analog is
  * the bbox→reading-order path (`pytorch_mobile/ocr_pipeline.py:655-664`,
  * `:777-803`) graded by its fixture tests.
  *
  * Payload classes by `doc_id % 4` (k = 2 + doc_id % 3 runs):
  *   0: single column, k valid runs            → conf 1.0, success
  *   1: two columns, file-interleaved rows     → XY-cut column-major
  *      (left column x=40, right x=400: gutter ≥ MinXGap)
  *   2: single column + ONE malformed run line → conf k/(k+1), fallback
  *   3: header + prose tail, zero run lines    → plain fallback (0.3)
  *
  * Geometry (FIXTURES.md §2): y = 100 + 20·i (3 digits, > RowTol apart),
  * token i = 'w'‖((doc_id·7+i) mod 1000) left, 'v'‖((doc_id·11+i) mod
  * 1000) right — lengths 2–4 chars, so span offsets exercise variable-
  * width cumulative arithmetic.
  */
object PdfGen {

  private def y(i: Column): Column = (lit(100) + i * 20).cast("string")

  private def ltok(id: Column, i: Column): Column =
    concat(lit("w"), pmod(id * 7 + i, lit(1000)).cast("string"))

  private def rtok(id: Column, i: Column): Column =
    concat(lit("v"), pmod(id * 11 + i, lit(1000)).cast("string"))

  private def leftLine(id: Column, i: Column): Column =
    concat(lit("G 40 "), y(i), lit(" 12 "), ltok(id, i))

  private def rightLine(id: Column, i: Column): Column =
    concat(lit("G 400 "), y(i), lit(" 12 "), rtok(id, i))

  /** the one malformed run line of class 2 — non-numeric x, skipped by
    * the parser but counted as a candidate `G ` line (9 chars)
    */
  val BadLine = "G x 9 bad"

  /** the closed-form pdf payload as a pure column over `doc_id` — usable
    * wherever a pdf-class payload is needed without the transcript frame
    * shape (e.g. the x04 SQL-surface oracle query).
    */
  def payloadCol(id: Column): Column = {
    val cls = pmod(id, lit(4))
    val k = (lit(2) + pmod(id, lit(3))).cast("int")
    val idxs = sequence(lit(0), k - 1)

    val single = array_join(transform(idxs, i => leftLine(id, i)), "\n")
    val twoCol = array_join(
      flatten(transform(idxs, i => array(leftLine(id, i), rightLine(id, i)))),
      "\n")
    val withBad = array_join(
      concat(
        slice(transform(idxs, i => leftLine(id, i)), 1, 1),
        array(lit(BadLine)),
        slice(transform(idxs, i => leftLine(id, i)), 2, 3)),
      "\n")

    concat(lit("%PDF-SIM\n"),
      when(cls === 0, single)
        .when(cls === 1, twoCol)
        .when(cls === 2, withBad)
        .otherwise(concat(lit("tail "), id.cast("string"))))
  }

  /** docs(doc_id, …) → (conv_id, turn_idx, role, text, tool) transcript
    * frame whose `text` is the closed-form pdf payload for the doc.
    */
  def withPdfPayload(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("conv_id"),
      lit(0).as("turn_idx"),
      lit("tool").as("role"),
      payloadCol(col("doc_id")).as("text"),
      lit(null).cast("string").as("tool"))

  /** DuckDB twin: the EXPECTED `Extract` output (text, span list,
    * confidence, status, block counts) recomputed arithmetically from
    * the same `documents` table. Span starts are cumulative sums of the
    * fixed-width line prefixes (left 12 = `G 40 yyy 12 `, right 13) plus
    * variable token lengths; class-1 file layout interleaves (left_i,
    * right_i) while reading order is column-major — the XY-cut contract.
    */
  val oracle: String = {
    // per-line byte cost in the file = prefix + token + '\n'
    val leftCost = "13 + length(lt)"
    val rightCost = "14 + length(rt)"
    s"""WITH d AS (
         SELECT doc_id, CAST(2 + doc_id % 3 AS INT) AS k,
                CAST(doc_id % 4 AS INT) AS cls
         FROM documents),
       tok AS (
         SELECT d.doc_id, d.k, d.cls, CAST(g.i AS INT) AS i,
           'w' || CAST((d.doc_id*7 + g.i) % 1000 AS VARCHAR) AS lt,
           'v' || CAST((d.doc_id*11 + g.i) % 1000 AS VARCHAR) AS rt
         FROM d, generate_series(0, 3) g(i) WHERE g.i < d.k),
       off AS (
         SELECT *,
           9 + COALESCE(SUM($leftCost) OVER w, 0) + 12 AS st_single,
           9 + COALESCE(SUM($leftCost + $rightCost) OVER w, 0) AS row_start,
           length(lt) AS ll, length(rt) AS rl
         FROM tok
         WINDOW w AS (PARTITION BY doc_id ORDER BY i
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
       spans AS (
         SELECT doc_id, k, cls, i, lt, rt,
           st_single AS st0,
           st_single + CASE WHEN i >= 1 THEN 10 ELSE 0 END AS st2,
           row_start + 12 AS stl,
           row_start + 13 + ll + 13 AS str_,
           ll, rl
         FROM off),
       agg AS (
         SELECT doc_id, any_value(k) AS k, any_value(cls) AS cls,
           string_agg(lt, chr(10) ORDER BY i) AS ltext,
           string_agg(rt, chr(10) ORDER BY i) AS rtext,
           string_agg(st0 || ':' || (st0 + ll), ',' ORDER BY i) AS sp0,
           string_agg(st2 || ':' || (st2 + ll), ',' ORDER BY i) AS sp2,
           string_agg(stl || ':' || (stl + ll), ',' ORDER BY i) AS spl,
           string_agg(str_ || ':' || (str_ + rl), ',' ORDER BY i) AS spr
         FROM spans GROUP BY doc_id)
       SELECT d.doc_id, 'pdf' AS path,
         CASE d.cls
           WHEN 0 THEN a.ltext
           WHEN 1 THEN a.ltext || chr(10) || a.rtext
           WHEN 2 THEN a.ltext
           ELSE '%PDF-SIM tail ' || CAST(d.doc_id AS VARCHAR) END AS text,
         CASE d.cls
           WHEN 0 THEN a.sp0
           WHEN 1 THEN a.spl || ',' || a.spr
           WHEN 2 THEN a.sp2
           ELSE '0:' || CAST(14 + length(CAST(d.doc_id AS VARCHAR)) AS VARCHAR)
           END AS span_str,
         CASE d.cls
           WHEN 2 THEN round(d.k / (d.k + 1.0), 6)
           WHEN 3 THEN 0.3
           ELSE 1.0 END AS confidence,
         CASE WHEN d.cls IN (2, 3) THEN 'fallback'
           ELSE 'success' END AS status,
         CAST(CASE d.cls WHEN 1 THEN 2*d.k WHEN 3 THEN 0
           ELSE d.k END AS INT) AS blocks_total,
         CAST(CASE d.cls WHEN 1 THEN 2*d.k WHEN 3 THEN 0
           ELSE d.k END AS INT) AS blocks_kept,
         FALSE AS truncated
       FROM d JOIN agg a USING (doc_id)
       ORDER BY doc_id"""
  }
}
