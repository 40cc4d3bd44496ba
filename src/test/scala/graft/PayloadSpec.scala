package graft

import org.apache.spark.sql.functions._

import graft.gen.BillGen
import graft.operators.FieldExtract

/** X19 calibrated fusion + the nested utility-bill payload projection
  * (reference `pytorch_mobile/ocr_pipeline.py:1142-1286`; golden shape
  * `DEWA_Utility_Bill_Extracted.json:1-63`).
  */
class PayloadSpec extends SparkSpecBase {

  private lazy val fused = FieldExtract.withFusedConfidence(
    FieldExtract.withFields(BillGen.withBill(
      spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text"))))

  test("fused confidence follows the 0.4/0.35/0.25 formula on a clean bill") {
    // doc_id=5 → BillGen variant 0 (clean): simple patterns extract both
    // numerics at elec_conf 0.9; account/date/readings/water all present
    val r = fused.filter(col("doc_id") === 5)
      .select("raw_conf", "field_accuracy", "completeness", "fused_conf",
        "needs_review").head()
    assert(r.getAs[Double]("raw_conf") === 0.9)
    assert(r.getAs[Double]("field_accuracy") === 1.0)
    assert(r.getAs[Double]("completeness") === 1.0)
    assert(math.abs(r.getAs[Double]("fused_conf") -
      (0.9 * 0.4 + 1.0 * 0.35 + 1.0 * 0.25)) < 1e-9)
    assert(!r.getAs[Boolean]("needs_review"))
  }

  test("fused confidence stays in [0,1] and needs_review tracks the 0.7 bar") {
    val rows = fused.select("fused_conf", "needs_review").collect()
    rows.foreach { r =>
      val f = r.getAs[Double]("fused_conf")
      assert(f >= 0.0 && f <= 1.0)
      assert(r.getAs[Boolean]("needs_review") === (f < 0.7))
    }
  }

  test("payload JSON follows the documented utility-bill schema shape") {
    val row = fused
      .select(col("doc_id"), col("electricity_kwh"), col("carbon_kgco2e"),
        col("fused_conf"), FieldExtract.payloadCol(col("bill")).as("payload"))
      .filter(col("doc_id") === 5).head()
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.readTree(row.getAs[String]("payload"))

    assert(root.path("documentType").asText === "utility_bill")
    val bill = root.path("extractedData").path("billInfo")
    assert(bill.path("billingPeriod").path("periodicity").asText === "Monthly")
    assert(bill.path("accountNumber").asText.nonEmpty)

    val elec = root.path("extractedData").path("consumptionData").path("electricity")
    assert(elec.path("value").asDouble ===
      row.getAs[Int]("electricity_kwh").toDouble)
    assert(elec.path("unit").asText === "kWh")
    assert(elec.path("dataQuality").asText === "measured")
    assert(elec.path("meterReading").path("readingType").asText === "actual")

    val co2 = root.path("extractedData").path("emissionsData")
      .path("scope2").path("totalCO2e")
    assert(co2.path("value").asDouble ===
      row.getAs[Int]("carbon_kgco2e").toDouble)
    assert(co2.path("unit").asText === "kgCO2e")

    val v = root.path("validation")
    assert(math.abs(v.path("confidence").asDouble -
      row.getAs[Double]("fused_conf")) < 1e-9)
    assert(v.path("manualVerificationRequired").isBoolean)
    assert(root.path("metadata").path("sha256").asText.length === 64)
  }

  test("conditional payload sections drop when their gating field is absent") {
    // a bill text with no extractable fields at all
    import spark.implicits._
    val empty = Seq((1L, "no numbers here at all just words"))
      .toDF("doc_id", "bill")
    val f = FieldExtract.withFusedConfidence(FieldExtract.withFields(empty))
    val json = f.select(FieldExtract.payloadCol(col("bill")).as("p"))
      .head().getAs[String]("p")
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.readTree(json)
    assert(!root.path("extractedData").path("consumptionData").has("electricity"))
    assert(!root.path("extractedData").has("emissionsData"))
    assert(root.path("validation").path("manualVerificationRequired").asBoolean)
  }
}
