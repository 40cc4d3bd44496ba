package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.expressions.HtmlBlocks
import graft.gen.TranscriptGen
import graft.operators.Extract

/** Property tests (FIXTURES.md §5): normalization idempotence, span
  * validity, and partitioning invariance. Uses raw ScalaCheck generators
  * with a fixed seed (the scalatest-scalacheck bridge is not in the
  * offline dependency cache).
  */
class PropertySpec extends SparkSpecBase {
  import spark.implicits._

  /** deterministic samples from a generator */
  private def samples[T](gen: Gen[T], n: Int): List[T] =
    (0 until n).flatMap(i =>
      gen(Gen.Parameters.default.withSize(40), Seed(42L + i))).toList

  private val anyText: Gen[String] = Gen.oneOf(
    Gen.asciiPrintableStr,
    Gen.listOf(Gen.oneOf(Gen.alphaNumStr, Gen.const(" "), Gen.const("\t"),
      Gen.const("\n"), Gen.const("<p>"), Gen.const("</p>"), Gen.const("&amp;"),
      Gen.const("<a href='x'>"), Gen.const("</a>"), Gen.const("l23")))
      .map(_.mkString))

  test("plainNormalize is idempotent") {
    import graft.functions.TextFunctions.plainNormalize
    val texts = samples(anyText, 200)
    val df = texts.toDF("t")
      .select(plainNormalize(col("t")).as("once"))
      .select(col("once"), plainNormalize(col("once")).as("twice"))
    assert(df.filter(col("once") =!= col("twice")).count() === 0)
  }

  test("html tokenizer spans are valid, sorted and disjoint") {
    samples(anyText, 400).foreach { s =>
      val bs = HtmlBlocks.tokenize(s)
      bs.foreach { b =>
        assert(0 <= b.start && b.start < b.end && b.end <= s.length,
          s"bad span (${b.start},${b.end}) for input ${s.take(80)}")
        assert(b.words > 0 && b.linkWords >= 0 && b.linkWords <= b.words)
      }
      bs.sliding(2).foreach {
        case Vector(a, b) => assert(a.end <= b.start, "overlapping blocks")
        case _ =>
      }
    }
  }

  test("extraction output spans always index into the raw payload") {
    val in = TranscriptGen.genDs(spark, 1500L)
    val out = Extract(in.select("conv_id", "turn_idx", "role", "text", "tool", "ts"))
      .join(in.select(col("conv_id"), col("turn_idx"),
        col("text").as("raw")), Seq("conv_id", "turn_idx"))
    val bad = out.filter(
      exists(col("spans"), sp =>
        sp.getField("start") < 0 ||
          sp.getField("start") >= sp.getField("end") ||
          sp.getField("end") > length(coalesce(col("raw"), lit("")))))
    assert(bad.count() === 0)
  }

  test("same output regardless of input partitioning") {
    val a = Extract(TranscriptGen.inputDf(spark, 1200L).repartition(2))
    val b = Extract(TranscriptGen.inputDf(spark, 1200L).repartition(17))
    assert(a.exceptAll(b).count() === 0)
    assert(b.exceptAll(a).count() === 0)
  }
}
