package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Prometheus extrapolation math shared by the PromQL rate family and
  * LogQL's rate_counter (reference
  * internal/logql/logqlmetric/prom_math.go:31-104 extrapolatedRate).
  *
  * Both the Column form and the SQL-string form express the SAME IEEE
  * operation shape, so Spark and the DuckDB oracle agree bit-for-bit.
  * Inputs are per-(series, step) stats over epoch-µs Longs: n,
  * first_ts_us, last_ts_us, bucket_us (step start), and the
  * counter-corrected resultValue.
  */
object PromMath {

  val DayUs = 86400000000L

  def extrapolation(
      firstTsUs: Column, lastTsUs: Column, bucketUs: Column,
      n: Column, resultValue: Column, firstV: Column,
      counterZeroClamp: Boolean, rangeUs: Long = DayUs,
      tickPerSec: Double = 1e6): Column = {
    val sampled = (lastTsUs - firstTsUs).cast("double") / tickPerSec
    val avg = sampled / (n - 1).cast("double")
    val toStartRaw = (firstTsUs - bucketUs).cast("double") / tickPerSec
    val toEnd = ((bucketUs + rangeUs) - lastTsUs).cast("double") / tickPerSec
    val toStart = if (counterZeroClamp) {
      val toZero = sampled * (firstV / resultValue)
      when(resultValue > 0 && firstV >= 0 && toZero < toStartRaw, toZero)
        .otherwise(toStartRaw)
    } else toStartRaw
    val threshold = avg * 1.1
    val extended = sampled +
      when(toStart < threshold, toStart).otherwise(avg / 2) +
      when(toEnd < threshold, toEnd).otherwise(avg / 2)
    extended / sampled
  }

  /** SQL mirror over columns named n, first_ts_us, last_ts_us, bucket_us
    * and the caller-supplied resultValue SQL fragment (used in the
    * counter zero-crossing clamp).
    */
  def oracleExtrapolation(
      counterZeroClamp: Boolean, resultSql: String, rangeUs: Long = DayUs,
      tickPerSec: String = "1e6"): String = {
    val sampled = s"(CAST(last_ts_us - first_ts_us AS DOUBLE) / $tickPerSec)"
    val avg = s"($sampled / CAST(n - 1 AS DOUBLE))"
    val toStartRaw = s"(CAST(first_ts_us - bucket_us AS DOUBLE) / $tickPerSec)"
    val toEnd = s"(CAST((bucket_us + $rangeUs) - last_ts_us AS DOUBLE) / $tickPerSec)"
    val toStart =
      if (counterZeroClamp)
        s"""(CASE WHEN $resultSql > 0 AND first_v >= 0
           |  AND ($sampled * (first_v / $resultSql)) < $toStartRaw
           |  THEN ($sampled * (first_v / $resultSql))
           |  ELSE $toStartRaw END)""".stripMargin.replace("\n", " ")
      else toStartRaw
    val threshold = s"($avg * 1.1)"
    s"""(($sampled
       |  + (CASE WHEN $toStart < $threshold THEN $toStart ELSE $avg / 2 END)
       |  + (CASE WHEN $toEnd < $threshold THEN $toEnd ELSE $avg / 2 END))
       | / $sampled)""".stripMargin.replace("\n", " ")
  }
}
