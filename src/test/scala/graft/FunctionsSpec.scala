package graft

import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions
import graft.functions.TextFunctions._

/** Unit tests for the pure-Catalyst column functions (sniffer, char
  * correction, normalization, confidence aggregate) — mirrors the
  * reference's table-driven char-correction cases
  * (`pytorch_mobile/test_pipeline.py:110-126`).
  */
class FunctionsSpec extends SparkSpecBase {
  import spark.implicits._

  private def sniffOne(text: String, tool: String = null): String =
    Seq((text, tool)).toDF("text", "tool")
      .select(sniff(col("text"), col("tool"))).head.getString(0)

  test("sniffer routes blank/pdf/html/tooljson/plain") {
    assert(sniffOne(null) === "blank")
    assert(sniffOne("") === "blank")
    assert(sniffOne(" \t\n ") === "blank")
    assert(sniffOne("\u0000\u0001") === "blank")
    assert(sniffOne("%PDF-SIM\nG 1 2 3 x") === "pdf")
    assert(sniffOne("  %PDF-x") === "pdf")
    assert(sniffOne("<!doctype html><p>x</p>") === "html")
    assert(sniffOne("<div>x</div>") === "html")
    assert(sniffOne("<p >x") === "html")
    assert(sniffOne("<!-- c --><p>x") === "html")
    assert(sniffOne("{\"a\":1}", tool = "search") === "tooljson")
    assert(sniffOne("{\"a\":1}") === "plain") // json without tool = plain
    assert(sniffOne("<3 plain") === "plain")
    assert(sniffOne("just words") === "plain")
  }

  test("char correction: reference table cases") {
    // mirrors pytorch_mobile/test_pipeline.py:115-121
    val cases = Seq(
      "l23" -> "123", "O5" -> "05", "Z99" -> "299", "l2O" -> "120",
      "Hello" -> "Hello", // not numeric-gated
      "2|4" -> "214", "B0b" -> "808", "g1" -> "91",
      "bog" -> "bog", // all confusable chars but NO digit => untouched
      "12,5" -> "12,5") // punctuation breaks the gate (word-level gate)
    val df = cases.map(_._1).toDF("w")
      .select(correctToken(col("w")).as("got"))
    assert(df.as[String].collect().toSeq === cases.map(_._2))
  }

  test("plainNormalize collapses whitespace and corrects in context") {
    val got = Seq("  the l23 quick  \t brown\nZ99  ")
      .toDF("t").select(plainNormalize(col("t"))).head.getString(0)
    assert(got === "the 123 quick brown 299")
  }

  test("native plainNormalize equals the declarative spec twin") {
    // hand edges: blank classes, Java \\s whitespace variants, unicode,
    // all-confusable-no-digit, windows newlines, empty string
    val edges = Seq("", "   ", "\t\n\f\r", "ab", "ab  c",
      " l23  O5 ", "bog BOG", "m\u00fcnchen  Z99", "x\r\ny", "|||", "1|l",
      " l23 ", "a  b   c", "l23 O5", "01", "a\u0001b  c", "\u0001")
    // ScalaCheck property: arbitrary strings over the alphabets that
    // exercise the gate and the whitespace machinery — confusables,
    // digits, plain letters, every Java \s char, controls, unicode
    import org.scalacheck.{Gen, rng}
    val alpha = Gen.oneOf(
      Gen.oneOf("lI|OoZzSsGgBb".toSeq).map(_.toString),
      Gen.numChar.map(_.toString),
      Gen.alphaChar.map(_.toString),
      Gen.oneOf(" ", "\t", "\n", "\u000b", "\f", "\r"),
      Gen.oneOf("\u0001", "\u001f", "\u00fc", "\u4e2d"))
    val anyStr = Gen.listOf(alpha).map(_.mkString)
    val prop = (0 until 400).flatMap(i =>
      anyStr(Gen.Parameters.default.withSize(30), rng.Seed(1000L + i)))
    val df = (edges ++ prop).toDF("t").select(
      plainNormalize(col("t")).as("nat"),
      plainNormalizeDeclarative(col("t")).as("dec"))
    val bad = df.filter(not(col("nat") <=> col("dec"))).collect()
    assert(bad.isEmpty, s"native/declarative diverge: ${bad.take(3).mkString}")
  }

  test("wholeSpan covers trimmed region; empty for blank") {
    val df = Seq("  abc  ", "x", "   ", "").toDF("t")
      .select(wholeSpan(col("t")).as("s"))
    val rows = df.collect()
    assert(rows(0).getSeq[org.apache.spark.sql.Row](0).head.toSeq === Seq(2, 5))
    assert(rows(1).getSeq[org.apache.spark.sql.Row](0).head.toSeq === Seq(0, 1))
    assert(rows(2).getSeq[org.apache.spark.sql.Row](0).isEmpty)
    assert(rows(3).getSeq[org.apache.spark.sql.Row](0).isEmpty)
  }

  test("geoMeanTopK matches the reference aggregate semantics") {
    def gm(scores: Seq[Double]): Double =
      Seq(scores).toDF("s").select(geoMeanTopK(col("s"))).head.getDouble(0)

    // n<=20: plain geometric mean with 1e-3 floor
    assert(math.abs(gm(Seq(0.5, 0.5)) - 0.5) < 1e-12)
    assert(math.abs(gm(Seq(1.0, 0.25)) - 0.5) < 1e-12)
    assert(gm(Seq()) === 0.0)
    // floor at 1e-3 (reference pipeline.py:403)
    assert(math.abs(gm(Seq(0.0, 1.0)) - math.sqrt(1e-3)) < 1e-12)
    // n>20: top 80% kept (reference pipeline.py:407-410)
    val scores = Seq.fill(20)(1.0) ++ Seq.fill(5)(1e-3)
    val k = math.ceil(25 * 0.8).toInt // 20
    val expected = 1.0 // top 20 of 25 are all 1.0
    assert(math.abs(gm(scores) - expected) < 1e-9)
    assert(k === 20)
  }

  test("geoMeanAgg cross-row aggregate") {
    val got = Seq(0.5, 0.5, 0.5).toDF("c")
      .agg(geoMeanAgg(col("c"))).head.getDouble(0)
    assert(math.abs(got - 0.5) < 1e-12)
  }

  test("SQL registration: custom expressions usable from SQL") {
    GraftFunctions.register(spark)
    val n = spark.sql(
      "SELECT size(html_blocks('<p>three little words</p>')) b, " +
        "size(pdf_glyph_runs('%PDF-S\nG 1 2 3 t\n')) r, " +
        "simhash64('a b c') h, kie_best('Electricity 299 kWh').ke ke")
      .head
    assert(n.getInt(0) === 1 && n.getInt(1) === 1)
    assert(n.getLong(2) !== 0L)
    assert(n.getInt(3) === 299)
  }

  test("collapseRuns: CTC-decode analog (G8)") {
    val got = Seq("aab  ba", "xxx", "ab").toDF("s")
      .select(collapseRuns(col("s")).as("v"))
      .collect().map(_.getString(0)).toSeq
    assert(got === Seq("ab ba", "x", "ab"))
  }

  test("fieldConfidence: match-region token alignment (J2)") {
    import org.apache.spark.sql.functions.{array, struct, lit}
    val toks = array(
      struct(lit("299").as("text"), lit(0.9).as("conf")),
      struct(lit("kWh").as("text"), lit(0.4).as("conf")),
      struct(lit("zzz").as("text"), lit(0.1).as("conf")))
    val got = Seq("x").toDF("s")
      .select(fieldConfidence(lit("299 kWh"), toks).as("v"))
      .head.getDouble(0)
    // geometric mean of 0.9 and 0.4 (zzz not in region)
    assert(math.abs(got - math.sqrt(0.9 * 0.4)) < 1e-9)
    val none = Seq("x").toDF("s")
      .select(fieldConfidence(lit("nothing"), toks).as("v"))
      .head
    assert(none.isNullAt(0)) // no aligned token -> null (caller default)
  }
}
