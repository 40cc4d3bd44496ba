package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.gen.TranscriptGen
import graft.operators.Extract

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query: the full transcript-extraction pipeline (sniff → route
    * → per-format extraction → spans/confidence/status) over the seeded
    * synthetic transcript table. Driver smoke-checks rows>0.
    */
  def entry(spark: SparkSession): DataFrame =
    Extract(TranscriptGen.inputDf(spark, 2000L))

  /** One entry per implemented operator from SURVEY.md §2.
    * Keys with a matching `oracleSql` entry are DuckDB-verified at sf0.01;
    * the rest get the driver's rows-only check.
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- extraction engine (transcript table is repo-generated; not SQL-
    // expressible in DuckDB -> rows-only check)
    "x01_extract_transcripts" -> ((s, _) => Extract(TranscriptGen.inputDf(s, 5000L))),

    // ---- relational battery over the harness tables (DuckDB-verified)
    "q01_agg" -> ((s, dir) => {
      s.read.parquet(s"$dir/lineitem.parquet")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity").cast("decimal(18,2)")).as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).as("sum_base_price"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    })
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q01_agg" ->
      """SELECT l_returnflag, l_linestatus,
         sum(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty,
         sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS sum_base_price,
         count(*) AS count_order
         FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".replaceAll("\\s+", " ")
  )
}
