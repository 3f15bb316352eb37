package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** One operator/capability from SURVEY.md §2, exposed to the driver gate:
  * a Spark implementation plus (when SQL-expressible) an equivalent DuckDB
  * oracle query over the same parquet tables.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    /** headline queries are the ones Bench times at sf0.1 */
    headline: Boolean = false)

/** Shared helpers for oracle-deterministic results.
  *
  * Double SUM/AVG is merge-order dependent in a parallel engine, so any
  * aggregated money/quantity column is summed as DECIMAL (exact, associative)
  * and only cast to DOUBLE at the very end. The same expression shape is used
  * in the DuckDB oracle, so values match bit-for-bit.
  */
object Det {
  /** exact decimal sum rendered as double: deterministic under any merge order */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(18, 2))).cast("double")

  /** deterministic average: exact decimal sum, one final double division */
  def davg(c: Column): Column =
    sum(c.cast(DecimalType(18, 2))).cast("double") / count(c)

  /** SQL fragment equivalents for the DuckDB oracle */
  def sqlSum(col: String): String =
    s"CAST(SUM(CAST($col AS DECIMAL(18,2))) AS DOUBLE)"
  def sqlAvg(col: String): String =
    s"CAST(SUM(CAST($col AS DECIMAL(18,2))) AS DOUBLE) / COUNT($col)"
}
