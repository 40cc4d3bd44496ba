package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.expressions.{HtmlBlocks, PdfGlyphRuns}
import graft.operators.Extract

/** Truncation-lineage semantics of the extraction core (round-4 verdict
  * #5/#6): chunked mega-payload processing — full text survives past the
  * single-window MaxRuns cap, `truncated` means the CHUNK bound fired —
  * and cursor-based HTML cap detection — a cap-full parse that consumed
  * the whole document does not flag.
  */
class TruncationSpec extends SparkSpecBase {
  import spark.implicits._

  private val R = PdfGlyphRuns.MaxRuns
  private val C = PdfGlyphRuns.MaxChunks
  private val B = HtmlBlocks.MaxBlocks

  private def frame(rows: (Int, String)*): DataFrame =
    rows.toSeq.toDF("turn_idx", "text")
      .select(lit(1L).as("conv_id"), col("turn_idx"), lit("user").as("role"),
        col("text"), lit(null).cast("string").as("tool"))

  private def pdf(n: Int): String =
    "%PDF-SIM\n" + (0 until n).map(i => s"G 40 ${100 + i * 20} 12 w$i\n").mkString

  test("over-cap pdf is chunk-processed: full text survives, no flag") {
    val n = R + 37
    val out = Extract(frame(0 -> pdf(n))).collect().head
    assert(out.getAs[String]("path") === "pdf")
    assert(!out.getAs[Boolean]("truncated"))
    assert(out.getAs[String]("status") === "success")
    assert(out.getAs[Double]("confidence") === 1.0)
    val text = out.getAs[String]("text")
    assert(text.split("\n").toSeq === (0 until n).map(i => s"w$i"))
  }

  test("beyond the chunk bound the flag fires and lineage sees it") {
    val n = C * R + 11
    val out = Extract(frame(0 -> pdf(n))).collect().head
    assert(out.getAs[Boolean]("truncated"))
    assert(out.getAs[String]("status") === "fallback")
    // exactly the chunk bound survived, in order
    val text = out.getAs[String]("text")
    assert(text.split("\n").toSeq === (0 until C * R).map(i => s"w$i"))
    assert(out.getAs[Double]("confidence") === (C * R).toDouble / n)
  }

  test("html cap with dropped content flags; fully-consumed cap does not") {
    val dropped = "<html><body>" +
      (0 until B + 3).map(i => s"<p>block number $i words</p>").mkString +
      "</body></html>"
    // cap lands exactly on the final block of a fully-consumed document
    // (unclosed last <p> so the end-of-input flush emits block MaxBlocks)
    val consumed = "<html><body>" +
      (0 until B - 1).map(i => s"<p>block number $i words</p>").mkString +
      "<p>final words here"
    val out = Extract(frame(0 -> dropped, 1 -> consumed))
      .orderBy("turn_idx").collect()
    assert(out(0).getAs[Boolean]("truncated"))
    assert(!out(1).getAs[Boolean]("truncated"))
    assert(out(1).getAs[Int]("blocks_total") === B)
  }
}
