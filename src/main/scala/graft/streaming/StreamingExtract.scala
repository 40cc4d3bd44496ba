package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Extract

/** Structured Streaming variant of the extraction pipeline.
  *
  * The reference has no streaming surface (SURVEY §2.10) and the batch job
  * is the north-rule deliverable; this wrapper exists because every
  * extraction expression is per-row and stateless, which makes the same
  * plan streaming-safe for free — `readStream` on the transcript table
  * (or a Kafka-shaped source), the identical `Extract` projection, and an
  * append-mode sink. No watermark is required (no event-time aggregation);
  * the optional per-conversation windowed metrics stream below shows the
  * watermarked form. The production sink shape — parquet file sink +
  * checkpointLocation + AvailableNow trigger — is exercised end-to-end
  * by the x21 battery query (an earlier untested convenience `writer`
  * here had drifted from it and was removed).
  */
object StreamingExtract {

  /** streaming transcript frame → streaming extracted frame (append-safe,
    * identical semantics to the batch Extract — covered by spec).
    */
  def apply(stream: DataFrame): DataFrame = Extract(stream)

  /** Windowed per-path metrics over the extracted stream: 1-minute
    * tumbling windows on event time `ts` with a 2-minute watermark —
    * the streaming analog of the batch manifest metrics (A7 shape).
    * Late turns beyond the watermark are dropped deterministically.
    */
  def pathMetrics(stream: DataFrame): DataFrame =
    Extract(stream.withWatermark("ts", "2 minutes"), passThrough = Seq("ts"))
      .groupBy(window(col("ts"), "1 minute"), col("path"))
      .agg(
        count(lit(1)).as("turns"),
        sum(when(col("status") === "fallback", 1).otherwise(0))
          .as("parser_fallbacks"),
        round(avg(col("confidence")), 6).as("avg_confidence"))

}
