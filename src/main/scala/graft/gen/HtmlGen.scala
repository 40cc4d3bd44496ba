package graft.gen

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Closed-form HTML-payload synthesis for the extract-core value oracle
  * (x20): every payload is derived arithmetically from `doc_id`, so the
  * FULL `Extract` output over the HTML path — streaming tag tokenize,
  * entity decode, whitespace collapse, boiler drop, link-density
  * classification, Readability container rescue, raw-char block spans,
  * top-k geometric-mean confidence and the τ-ladder aggressive/plain
  * fallbacks — has a closed form a DuckDB oracle can recompute without
  * running the tokenizer. The pdf twin is [[PdfGen]] (x19); the
  * reference's analog is the detection→classification→routing path
  * (`pytorch_mobile/ocr_pipeline.py:447-533`, `pipeline.py:1984-2065`)
  * graded by its fixture tests.
  *
  * Payload classes by `doc_id % 5` (k = 2 + doc_id % 3 paragraphs):
  *   0: clean article — k `<p>`s of 9 plain words      → conf 1.0, success
  *   1: `<nav>` boiler + per-odd-paragraph leading `<a>` word (link
  *      density 1/9 → score 80/81) + a trailing all-anchor `<p>`
  *      (dropped: 3·link_words > words)                → geo-mean conf,
  *      blocks_total = k+2, kept = k, success
  *   2: container rescue — `<div>` of k+3 short 4-word `<p>`s (each
  *      below MinWords; subtree ≥ 2·MinWords rescues them), one 2-char
  *      whitespace run inside each paragraph           → conf 1.0, success
  *   3: single 5-word `<p>` with one anchor word and a `&amp;` entity —
  *      below MinWords, no rescue → kept empty; τ-ladder picks the
  *      aggressive re-parse (conf (1−1/25)·0.5 = 0.48) → fallback
  *   4: `<nav>`-only payload — kept and aggressive both empty → plain
  *      normalization alternative (conf 0.3)           → fallback
  *
  * Word (i,j) = 'w'‖((doc_id·7 + i·13 + j) mod 1000) (class 2: 'u'),
  * lengths 2–4 chars, so block span offsets exercise variable-width
  * cumulative arithmetic; fixed tokens use 'm'/'g'/'n'/'e' ‖
  * (doc_id·{3,5,7,11} mod 1000).
  */
object HtmlGen {

  private def w(id: Column, i: Column, j: Column, letter: String): Column =
    concat(lit(letter), pmod(id * 7 + i * 13 + j, lit(1000)).cast("string"))

  private def tok(letter: String, id: Column, mult: Int): Column =
    concat(lit(letter), pmod(id * mult, lit(1000)).cast("string"))

  /** docs(doc_id, …) → (conv_id, turn_idx, role, text, tool) transcript
    * frame whose `text` is the closed-form html payload for the doc.
    */
  def withHtmlPayload(docs: DataFrame): DataFrame = {
    val id = col("doc_id")
    val cls = pmod(id, lit(5))
    val k = (lit(2) + pmod(id, lit(3))).cast("int")
    val idxs = sequence(lit(0), k - 1)
    val js = sequence(lit(0), lit(8))

    def para0(i: Column): Column = concat(lit("<p>"),
      array_join(transform(js, j => w(id, i, j, "w")), " "), lit("</p>"))

    val p0 = concat(lit("<html><body>"),
      array_join(transform(idxs, i => para0(i)), ""), lit("</body></html>"))

    def paraOdd(i: Column): Column = concat(lit("<p><a>"),
      w(id, i, lit(0), "w"), lit("</a> "),
      array_join(transform(sequence(lit(1), lit(8)), j => w(id, i, j, "w")),
        " "),
      lit("</p>"))

    val nav = concat(lit("<nav>"), tok("m", id, 3), lit(" "),
      tok("m", id, 5), lit("</nav>"))
    val p1 = concat(lit("<html><body>"), nav,
      array_join(transform(idxs, i =>
        when(pmod(i, lit(2)) === 0, para0(i)).otherwise(paraOdd(i))), ""),
      lit("<p><a>k1 k2 k3</a></p></body></html>"))

    val idx2 = sequence(lit(0), k + 2)
    def para2(i: Column): Column = concat(lit("<p>"),
      w(id, i, lit(0), "u"), lit(" "), w(id, i, lit(1), "u"), lit("\n "),
      w(id, i, lit(2), "u"), lit(" "), w(id, i, lit(3), "u"), lit("</p>"))
    val p2 = concat(lit("<html><body><div>"),
      array_join(transform(idx2, i => para2(i)), ""),
      lit("</div></body></html>"))

    val p3 = concat(lit("<div><p><a>"), tok("g", id, 3), lit("</a> "),
      tok("g", id, 5), lit(" "), tok("g", id, 7), lit(" p&amp;q "),
      tok("e", id, 11), lit("</p></div>"))

    val p4 = concat(lit("<nav>"), tok("n", id, 3), lit(" "),
      tok("n", id, 5), lit("</nav>"))

    val payload = when(cls === 0, p0).when(cls === 1, p1)
      .when(cls === 2, p2).when(cls === 3, p3).otherwise(p4)

    docs.select(
      id.as("conv_id"),
      lit(0).as("turn_idx"),
      lit("user").as("role"),
      payload.as("text"),
      lit(null).cast("string").as("tool"))
  }

  /** DuckDB twin: the EXPECTED `Extract` output recomputed arithmetically
    * from the same `documents` table. Block-span starts are cumulative
    * sums of per-paragraph raw lengths (fixed markup + variable token
    * widths); class-1 confidence is the geometric mean over per-block
    * (1 − link_density²) scores; classes 3/4 follow the τ-ladder's
    * aggressive (·0.5) and plain (0.3) alternatives.
    */
  val oracle: String =
    """WITH d AS (
         SELECT doc_id, CAST(2 + doc_id % 3 AS INT) AS k,
                CAST(doc_id % 5 AS INT) AS cls
         FROM documents),
       t01 AS (
         SELECT d.doc_id, d.k, d.cls, CAST(gi.i AS INT) AS i,
                CAST(gj.j AS INT) AS j,
           'w' || CAST((d.doc_id*7 + gi.i*13 + gj.j) % 1000 AS VARCHAR) AS w
         FROM d, generate_series(0, 3) gi(i), generate_series(0, 8) gj(j)
         WHERE d.cls IN (0, 1) AND gi.i < d.k),
       p01 AS (
         SELECT doc_id, k, cls, i,
           string_agg(w, ' ' ORDER BY j) AS wtext,
           SUM(length(w)) AS wl
         FROM t01 GROUP BY doc_id, k, cls, i),
       o01 AS (
         SELECT *,
           CASE WHEN cls = 1 AND i % 2 = 1 THEN wl + 22 ELSE wl + 15
             END AS plen,
           CASE WHEN cls = 1 AND i % 2 = 1 THEN 6 ELSE 3 END AS innoff,
           CASE WHEN cls = 1 AND i % 2 = 1 THEN wl + 12 ELSE wl + 8
             END AS slen,
           CASE WHEN cls = 1
             THEN 26 + length(CAST(doc_id*3 % 1000 AS VARCHAR))
                     + length(CAST(doc_id*5 % 1000 AS VARCHAR))
             ELSE 12 END AS prefix
         FROM p01),
       s01 AS (
         SELECT *,
           prefix + COALESCE(SUM(plen) OVER (PARTITION BY doc_id ORDER BY i
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             + innoff AS st
         FROM o01),
       a01 AS (
         SELECT doc_id, any_value(k) AS k, any_value(cls) AS cls,
           string_agg(wtext, chr(10) ORDER BY i) AS text,
           string_agg(st || ':' || (st + slen), ',' ORDER BY i) AS span_str,
           round(exp(SUM(CASE WHEN cls = 1 AND i % 2 = 1
             THEN ln(1 - (1.0/9)*(1.0/9)) ELSE 0 END)
             / any_value(k)), 6) AS confidence
         FROM s01 GROUP BY doc_id),
       t2 AS (
         SELECT d.doc_id, d.k, CAST(gi.i AS INT) AS i, CAST(gj.j AS INT) AS j,
           'u' || CAST((d.doc_id*7 + gi.i*13 + gj.j) % 1000 AS VARCHAR) AS w
         FROM d, generate_series(0, 6) gi(i), generate_series(0, 3) gj(j)
         WHERE d.cls = 2 AND gi.i < d.k + 3),
       p2 AS (
         SELECT doc_id, k, i, string_agg(w, ' ' ORDER BY j) AS wtext,
           SUM(length(w)) AS wl
         FROM t2 GROUP BY doc_id, k, i),
       s2 AS (
         SELECT *,
           20 + COALESCE(SUM(wl + 11) OVER (PARTITION BY doc_id ORDER BY i
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS st
         FROM p2),
       a2 AS (
         SELECT doc_id, any_value(k) + 3 AS m,
           string_agg(wtext, chr(10) ORDER BY i) AS text,
           string_agg(st || ':' || (st + wl + 4), ',' ORDER BY i) AS span_str
         FROM s2 GROUP BY doc_id),
       a34 AS (
         SELECT doc_id, cls,
           'g' || CAST(doc_id*3 % 1000 AS VARCHAR) AS ga,
           'g' || CAST(doc_id*5 % 1000 AS VARCHAR) AS gb,
           'g' || CAST(doc_id*7 % 1000 AS VARCHAR) AS gc,
           'e' || CAST(doc_id*11 % 1000 AS VARCHAR) AS ed,
           'n' || CAST(doc_id*3 % 1000 AS VARCHAR) AS na,
           'n' || CAST(doc_id*5 % 1000 AS VARCHAR) AS nb
         FROM d WHERE cls IN (3, 4))
       SELECT doc_id, 'html' AS path, a.text AS text, a.span_str,
         a.confidence,
         'success' AS status,
         CAST(CASE WHEN a.cls = 1 THEN a.k + 2 ELSE a.k END AS INT)
           AS blocks_total,
         CAST(a.k AS INT) AS blocks_kept, FALSE AS truncated
       FROM a01 a
       UNION ALL
       SELECT doc_id, 'html', a.text, a.span_str, 1.0, 'success',
         CAST(a.m AS INT), CAST(a.m AS INT), FALSE
       FROM a2 a
       UNION ALL
       SELECT doc_id, 'html',
         ga || ' ' || gb || ' ' || gc || ' p&q ' || ed,
         '11:' || CAST(26 + length(ga) + length(gb) + length(gc)
           + length(ed) AS VARCHAR),
         0.48, 'fallback', 1, 1, FALSE
       FROM a34 WHERE cls = 3
       UNION ALL
       SELECT doc_id, 'html',
         '<nav>' || na || ' ' || nb || '</nav>',
         '0:' || CAST(12 + length(na) + length(nb) AS VARCHAR),
         0.3, 'fallback', 1, 0, FALSE
       FROM a34 WHERE cls = 4
       ORDER BY doc_id"""
}
