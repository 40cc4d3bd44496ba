package graft

import org.apache.spark.sql.functions._

import graft.gen.TranscriptGen
import graft.operators.Extract

/** The north-rule invariant: per-turn text equality against analytically
  * generated goldens (re-expression of the reference's exact-equality field
  * accuracy, `run_comprehensive_tests.py:53-70`).
  */
class GoldenEqualitySpec extends SparkSpecBase {

  private val N = 3000L

  lazy val out = Extract(TranscriptGen.inputDf(spark, N)).cache()
  lazy val golden = TranscriptGen.goldenDf(spark, N)

  test("staged projection: each tokenizer plans EXACTLY once") {
    // The staging invariant (Extract Scaladoc): html_blocks /
    // pdf_glyph_runs / the Jackson JSON parse are materialized once per
    // row as gated intermediate columns; a refactor that lets
    // CollapseProject re-inline them into the assembled CASE multiplies
    // per-row cost ~10×. Parquet-backed input — local relations
    // constant-fold and show no real plan.
    val dir = java.nio.file.Files.createTempDirectory("graft-plan").toString
    TranscriptGen.inputDf(spark, 200L).write.mode("overwrite").parquet(dir)
    val plan = Extract(spark.read.parquet(dir))
      .queryExecution.executedPlan.toString
    for (fn <- Seq("html_blocks", "pdf_glyph_runs", "get_json_object")) {
      val count = fn.r.findAllMatchIn(plan).size
      // pdf_glyph_runs additionally appears ONCE as the chunk-window
      // parse inside the lazily-gated over-cap CASE branch (G9 chunked
      // processing) — a lambda-driven occurrence, never the primary
      val lambdaDriven =
        s"$fn\\([^()]*, lambda".r.findAllMatchIn(plan).size
      assert(count - lambdaDriven === 1,
        s"$fn appears $count times ($lambdaDriven chunk-lambda) in the plan:\n$plan")
      if (fn == "pdf_glyph_runs")
        assert(lambdaDriven === 1,
          s"expected one gated chunk-window parse:\n$plan")
      else assert(lambdaDriven === 0)
    }
  }

  test("row count matches golden count") {
    assert(out.count() === N)
  }

  test("per-turn extracted text is byte-for-byte equal to golden") {
    val joined = out.join(golden, Seq("conv_id", "turn_idx"))
    assert(joined.count() === N) // (conv_id, turn_idx) unique + complete
    val bad = joined.filter(
      !(col("text") <=> col("expected_text")) ||
        !(col("path") <=> col("expected_path")) ||
        !(col("status") <=> col("expected_status")))
    val sample = bad
      .select("conv_id", "turn_idx", "path", "expected_path", "status",
        "expected_status", "text", "expected_text")
      .take(5)
    assert(bad.count() === 0,
      s"\nfirst mismatches:\n${sample.mkString("\n")}")
  }

  test("spans match golden spans exactly") {
    val joined = out.join(golden, Seq("conv_id", "turn_idx"))
    val bad = joined.filter(!(col("spans") <=> col("expected_spans")))
    val sample = bad
      .select("conv_id", "turn_idx", "path", "spans", "expected_spans")
      .take(5)
    assert(bad.count() === 0,
      s"\nfirst span mismatches:\n${sample.mkString("\n")}")
  }

  test("every payload class is exercised by the generator") {
    val paths = out.groupBy("path").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    for (p <- Seq("plain", "html", "pdf", "tooljson", "blank"))
      assert(paths.getOrElse(p, 0L) > 0, s"path $p not generated")
  }

  test("fallback status is exercised (malformed tooljson)") {
    assert(out.filter(col("status") === "fallback").count() > 0)
  }

  test("τ-ladder keep-better is exercised: low-confidence html AND pdf parses " +
    "return the plain alternative at PlainAltConf") {
    // the generator's lowconf class parses on its sniffed path but below
    // the plain alternative's confidence — the ladder must have swapped in
    // the plain normalization (conf exactly PlainAltConf, zero blocks kept)
    for (p <- Seq("html", "pdf")) {
      val ladder = out.filter(col("path") === p &&
        col("status") === "fallback" &&
        col("confidence") === Extract.PlainAltConf)
      assert(ladder.count() > 0, s"no ladder-fallback rows for path $p")
      assert(ladder.filter(col("blocks_kept") =!= 0).count() === 0)
    }
  }
}
