package graft.gen

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic utility-bill text synthesized from `documents(doc_id,
  * text)` — the KIE fixture. Field values are doc_id arithmetic; five
  * corruption variants (doc_id % 5) exercise the extraction phases:
  *
  *   0  clean "Electricity E kWh" + "C kg CO2e"      → simple regex
  *   1  elec digits '1'→'l'                          → KIE + preprocess
  *   2  carbon context "Kg coze C"                   → KIE word fix (coze→CO2e)
  *   3  "Consumption: E" (no kWh unit)               → simple pattern #4
  *   4  comma-grouped "Total 1,234 kWh"              → comma normalization
  *
  * Every numeric field is separated by a >30-char x-pad so the KIE scan's
  * greedy ±30 context windows (which CONSUME text, mirroring Python
  * findall) see each number as its own candidate. The trailing filler
  * derives from the document text with all letters mapped to 'x' —
  * digit-free and keyword-free by construction, so it can never hijack a
  * first-match-wins chain.
  *
  * The same construction is emitted twice from this object — as a Spark
  * Column and as a DuckDB SQL expression — so the x05 oracle runs over
  * byte-identical bills. Mirrors the reference's generate-with-expected-
  * outcome fixture pattern (`synthetic_degradation.py:457-506`) and its
  * golden bills (`run_comprehensive_tests.py:33-36`).
  */
object BillGen {

  val Pad = "xxxxxx xxxxx xxxxxxx xxxxx xxxxxxx" // 34 chars > KIE window
  private val az = "abcdefghijklmnopqrstuvwxyz"
  private val xs = "x" * 26

  // ------------------------------------------------------------- Spark

  def withBill(docs: DataFrame): DataFrame =
    docs.withColumn("bill", billCol(col("doc_id"), col("text")))

  def billCol(docId: Column, text: Column): Column = {
    val e = (pmod(docId * 37, lit(9000)) + 50).cast("int")
    val c = (pmod(docId * 13, lit(1900)) + 10).cast("int")
    val acct = (docId + 10000000L).cast("long")
    val dd = (pmod(docId, lit(28)) + 1).cast("int")
    val mm = (pmod(docId, lit(12)) + 1).cast("int")
    val cur = (docId * 3 + 100000L).cast("long")
    val prev = cur - e
    val peak = (pmod(docId, lit(40)) + 1).cast("int")
    val water = (pmod(docId, lit(400)) + 5).cast("int")
    val v = pmod(docId, lit(5))

    val es = e.cast("string")
    val cs = c.cast("string")
    val elecS = when(v === 1, translate(es, "1", "l"))
      .when(v === 4 && e >= 1000,
        concat(substring(es, 1, 1), lit(","), substring(es, 2, 3)))
      .otherwise(es)
    val elecPart = when(v === 3, concat(lit("Consumption: "), es))
      .when(v === 4, concat(lit("Total "), elecS, lit(" kWh")))
      .otherwise(concat(lit("Electricity "), elecS, lit(" kWh")))
    val carbPart = when(v === 2, concat(lit("Kg coze "), cs))
      .otherwise(concat(cs, lit(" kg CO2e")))
    val filler = translate(
      regexp_replace(lower(substring(text, 1, 80)), "[^a-z ]", ""), az, xs)

    concat(
      lit("Account No: "), acct, lit(" " + Pad + " Bill Date: "),
      dd, lit("/"), mm, lit("/2024 " + Pad + " From: 01/"),
      mm, lit("/2024 To: 28/"), mm, lit("/2024 " + Pad + " "),
      elecPart, lit(" " + Pad + " "), carbPart,
      lit(" " + Pad + " Current Reading: "), cur,
      lit(" " + Pad + " Previous Reading: "), prev,
      lit(" " + Pad + " Peak Demand: "), peak, lit(" kW " + Pad + " Water: "),
      water, lit(" m3 "), filler)
  }

  // ------------------------------------------------------------- DuckDB

  /** same bill as a DuckDB SQL expression over (doc_id, text) */
  val billSql: String = {
    def lit(s: String) = "'" + s.replace("'", "''") + "'"
    val e = "(doc_id * 37) % 9000 + 50"
    val c = "(doc_id * 13) % 1900 + 10"
    val es = s"CAST($e AS VARCHAR)"
    val cs = s"CAST($c AS VARCHAR)"
    val mm = "CAST(doc_id % 12 + 1 AS VARCHAR)"
    val dd = "CAST(doc_id % 28 + 1 AS VARCHAR)"
    val elecS =
      s"""CASE WHEN doc_id % 5 = 1 THEN translate($es, '1', 'l')
              WHEN doc_id % 5 = 4 AND $e >= 1000
                THEN substr($es, 1, 1) || ',' || substr($es, 2, 3)
              ELSE $es END"""
    val elecPart =
      s"""CASE WHEN doc_id % 5 = 3 THEN 'Consumption: ' || $es
              WHEN doc_id % 5 = 4 THEN 'Total ' || $elecS || ' kWh'
              ELSE 'Electricity ' || $elecS || ' kWh' END"""
    val carbPart =
      s"""CASE WHEN doc_id % 5 = 2 THEN 'Kg coze ' || $cs
              ELSE $cs || ' kg CO2e' END"""
    val filler =
      s"translate(regexp_replace(lower(substr(text, 1, 80)), '[^a-z ]', '', 'g'), ${lit(az)}, ${lit(xs)})"
    s"""'Account No: ' || CAST(doc_id + 10000000 AS VARCHAR)
       || ${lit(" " + Pad + " Bill Date: ")} || $dd || '/' || $mm
       || ${lit("/2024 " + Pad + " From: 01/")} || $mm
       || '/2024 To: 28/' || $mm || ${lit("/2024 " + Pad + " ")}
       || $elecPart || ${lit(" " + Pad + " ")} || $carbPart
       || ${lit(" " + Pad + " Current Reading: ")}
       || CAST(doc_id * 3 + 100000 AS VARCHAR)
       || ${lit(" " + Pad + " Previous Reading: ")}
       || CAST(doc_id * 3 + 100000 - ($e) AS VARCHAR)
       || ${lit(" " + Pad + " Peak Demand: ")}
       || CAST(doc_id % 40 + 1 AS VARCHAR) || ${lit(" kW " + Pad + " Water: ")}
       || CAST(doc_id % 400 + 5 AS VARCHAR) || ' m3 ' || $filler"""
  }
}
