package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.operators.Extract

/** Hand-computed pins for the closed-form payload generators behind the
  * x19/x20 extract-core value oracles ([[graft.gen.PdfGen]],
  * [[graft.gen.HtmlGen]]). The driver's DuckDB compare proves
  * generator+engine against the SQL twin; these literals are an
  * INDEPENDENT third derivation (by hand, from the documented payload
  * grammar), so an accidental edit to a generator between driver runs
  * cannot silently move both sides of the oracle at once.
  */
class GenSpec extends SparkSpecBase {

  import spark.implicits._

  private def extractOn(gen: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame,
      ids: Seq[Long]): Map[Long, Row] =
    Extract(gen(ids.toDF("doc_id")))
      .select(col("conv_id").cast("long"), col("path"), col("text"),
        transform(col("spans"), sp => concat(
          sp.getField("start").cast("string"), lit(":"),
          sp.getField("end").cast("string"))).as("spans"),
        round(col("confidence"), 6), col("status"),
        col("blocks_total"), col("blocks_kept"))
      .collect().map(r => r.getLong(0) -> r).toMap

  test("HtmlGen classes extract to the hand-computed closed form") {
    val rows = extractOn(graft.gen.HtmlGen.withHtmlPayload, Seq(0L, 3L, 4L))

    // doc 0 — class 0 (clean article), k=2: words w((13i+j)%1000)
    val r0 = rows(0L)
    assert(r0.getString(2) ===
      "w0 w1 w2 w3 w4 w5 w6 w7 w8\nw13 w14 w15 w16 w17 w18 w19 w20 w21")
    assert(r0.getSeq[String](3) === Seq("15:41", "48:83"))
    assert(r0.getDouble(4) === 1.0 && r0.getString(5) === "success")
    assert(r0.getInt(6) === 2 && r0.getInt(7) === 2)

    // doc 3 — class 3 (aggressive fallback): one 5-word sub-floor block
    // with an anchor word and an entity; conf = (1 - 1/25) * 0.5
    val r3 = rows(3L)
    assert(r3.getString(2) === "g9 g15 g21 p&q e33")
    assert(r3.getSeq[String](3) === Seq("11:37"))
    assert(r3.getDouble(4) === 0.48 && r3.getString(5) === "fallback")
    assert(r3.getInt(6) === 1 && r3.getInt(7) === 1)

    // doc 4 — class 4 (nav-only → plain alternative at 0.3)
    val r4 = rows(4L)
    assert(r4.getString(2) === "<nav>n12 n20</nav>")
    assert(r4.getSeq[String](3) === Seq("0:18"))
    assert(r4.getDouble(4) === 0.3 && r4.getString(5) === "fallback")
    assert(r4.getInt(6) === 1 && r4.getInt(7) === 0)
  }

  test("PdfGen class 0 extracts to the hand-computed closed form") {
    val rows = extractOn(graft.gen.PdfGen.withPdfPayload, Seq(0L))
    val r0 = rows(0L) // k=2 runs: 'G 40 100 12 w0\nG 40 120 12 w1'
    assert(r0.getString(1) === "pdf")
    assert(r0.getString(2) === "w0\nw1")
    assert(r0.getSeq[String](3) === Seq("21:23", "36:38"))
    assert(r0.getDouble(4) === 1.0 && r0.getString(5) === "success")
  }
}
