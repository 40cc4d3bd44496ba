package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ClassicConversions._
import org.apache.spark.sql.classic.ColumnConversions._

/** Spark 4.x made `Column` a ColumnNode wrapper with a `private[sql]`
  * companion; the supported way to lift a raw Catalyst `Expression` into a
  * `Column` (and back) is via `org.apache.spark.sql.classic` conversions,
  * which are only nameable from inside the `org.apache.spark.sql` package
  * tree — hence this two-line bridge (standard pattern in public Spark
  * extension libraries).
  */
object ColumnBridge {
  def column(e: Expression): Column = Column(e)
  def expr(c: Column): Expression = expression(c)
}
