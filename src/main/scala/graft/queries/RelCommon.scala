package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared oracle-determinism helpers of the relational family files
  * (split from Relational.scala, round 18). */
private[queries] object RelCommon {

  /** Exact decimal view of a double column: double→DECIMAL(18,4) is
    * unambiguous for data with ≤4 true decimal digits, and decimal sums
    * are order-independent — the whole oracle-determinism strategy. */
  def dec(c: Column): Column = c.cast("decimal(18,4)")
  def dround(c: Column): Column = round(c.cast("double"), 4)
  def fmtD(c: Column): Column = date_format(c, "yyyy-MM-dd")
  def fmtTs(c: Column): Column = date_format(c, "yyyy-MM-dd HH:mm:ss.SSSSSS")

  /** Oracle-side equivalent of [[dround]] (DuckDB dialect). */
  val OD = "round(CAST(%s AS DOUBLE), 4)"
}
