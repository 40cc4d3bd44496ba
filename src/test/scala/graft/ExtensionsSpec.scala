package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class ExtensionsSpec extends AnyFunSuite {

  test("GraftExtensions injects SQL functions via the builder") {
    val shared = TestSpark.spark // keep the shared SparkContext alive
    // getOrCreate returns the active session (without extensions), so
    // detach it first; the new session reuses the same SparkContext
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s = SparkSession.builder()
        .master("local[4]")
        .config("spark.ui.enabled", "false")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val out = s.sql(
        """SELECT size(html_blocks('<p>one two three</p>')) AS nb,
                  size(pdf_glyph_runs('%PDF-1\nG 1 2 10 hello')) AS nr,
                  vec_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d,
                  token_spans(' a bb ') AS ts""")
        .head()
      assert(out.getAs[Int]("nb") === 1)
      assert(out.getAs[Int]("nr") === 1)
      assert(out.getAs[Double]("d") === 11.0)
      val ts = out.getSeq[org.apache.spark.sql.Row](out.fieldIndex("ts"))
        .map(r => (r.getString(0), r.getInt(1), r.getInt(2)))
      assert(ts === Seq(("a", 0, 1), ("bb", 2, 4)))
      // catalog-visible (not just a temp function)
      assert(s.catalog.functionExists("vec_dot"))
    } finally {
      SparkSession.setDefaultSession(shared)
      SparkSession.setActiveSession(shared)
    }
  }
}
