package graft

import org.apache.spark.sql.functions._

import graft.operators.AdaptiveRoute

/** Tier→strategy routing (reference `_select_processing_strategy`,
  * `adaptive_ocr_pipeline.py:349-407`) and the full
  * classify→route→extract→annotate shape over bills.
  */
class AdaptiveRouteSpec extends SparkSpecBase {
  import spark.implicits._

  test("strategy table mirrors the reference tier mapping") {
    val tiers = Seq("high", "medium", "low", "very_low").toDF("tier")
    val got = tiers.select(col("tier"),
        AdaptiveRoute.engineFor(col("tier")).as("engine"),
        AdaptiveRoute.preprocessingFor(col("tier")).as("pre"))
      .collect().map(r => r.getString(0) -> ((r.getString(1), r.getString(2))))
      .toMap
    assert(got("high") === (("chain-simple", "")))
    assert(got("medium") === (("chain-simple", "whitespace_collapse")))
    assert(got("low") === (("kie", "whitespace_collapse,char_correction")))
    assert(got("very_low") ===
      (("kie", "whitespace_collapse,char_correction,run_collapse")))
  }

  test("routed text applies exactly the annotated preprocessing chain") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    val out = AdaptiveRoute.route(docs)
    // self-consistency per row: routed_text == the formula for ITS tier
    val bad = out.filter(!(col("routed_text") <=>
      AdaptiveRoute.routedText(col("tier"), col("text"))))
    assert(bad.count() === 0)
    // every strategy column is non-null and the engine set is exact
    assert(out.filter(col("engine").isNull || col("preprocessing").isNull ||
      col("reason").isNull).count() === 0)
    assert(out.select("engine").distinct().collect().map(_.getString(0)).toSet
      .subsetOf(Set("chain-simple", "kie")))
  }

  test("classify→route→extract recovers an OCR-degraded bill via routing") {
    // degraded numerics ('2gg kWh') + noisy enough text to stay below the
    // high tier: the routed char-correction repairs the token BEFORE the
    // field chains run
    val noisy = ("ref :: 77 !! ## " * 3) +
      "Electricity 2gg kWh this period " + ("%% !! @@ ~~ ^^ " * 4)
    val df = Seq((1L, noisy)).toDF("doc_id", "bill")
    val routed = AdaptiveRoute.route(df, "bill")
    val tier = routed.select("tier").head().getString(0)
    assert(tier !== "high", s"fixture unexpectedly scored high: $tier")
    val out = AdaptiveRoute.routeAndExtract(df)
    assert(out.select("electricity_kwh").head().getAs[Any](0) === 299)
  }
}
