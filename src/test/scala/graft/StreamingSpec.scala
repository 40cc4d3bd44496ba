package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.gen.TranscriptGen
import graft.model.Turn
import graft.operators.Extract
import graft.streaming.StreamingExtract

class StreamingSpec extends SparkSpecBase {
  import spark.implicits._

  private def sampleTurns(n: Long): Seq[Turn] =
    TranscriptGen.inputDf(spark, n).as[Turn].collect().toSeq

  test("streaming extraction matches batch extraction row-for-row") {
    implicit val sqlCtx = spark.sqlContext
    val turns = sampleTurns(300L)

    val mem = MemoryStream[Turn]
    val q = StreamingExtract(mem.toDF())
      .writeStream.format("memory").queryName("stream_out")
      .outputMode("append").start()
    try {
      mem.addData(turns)
      q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.table("stream_out")
      .orderBy("conv_id", "turn_idx").collect()
    val batch = Extract(turns.toDF())
      .orderBy("conv_id", "turn_idx").collect()
    assert(streamed.length === turns.length)
    assert(streamed.map(_.toString).toSeq === batch.map(_.toString).toSeq)
  }

  test("windowed path metrics stream aggregates with watermark") {
    implicit val sqlCtx = spark.sqlContext
    val turns = sampleTurns(200L)

    val mem = MemoryStream[Turn]
    val q = StreamingExtract.pathMetrics(mem.toDF())
      .writeStream.format("memory").queryName("metrics_out")
      .outputMode("append").start()
    try {
      mem.addData(turns)
      q.processAllAvailable()
      // advance the watermark far past the data so windows finalize
      mem.addData(Seq(Turn("zzz", 0, "user", "tail", null,
        new Timestamp(1700000000000L + 86400000L))))
      q.processAllAvailable()
    } finally q.stop()

    val out = spark.table("metrics_out").collect()
    assert(out.nonEmpty)
    val totalTurns = out.map(_.getAs[Long]("turns")).sum
    assert(totalTurns === 200L) // every original turn lands in one window
    out.foreach { r =>
      assert(Set("plain", "html", "pdf", "tooljson", "blank")
        .contains(r.getAs[String]("path")))
    }
  }
}
