package graft.api

import org.apache.spark.sql.DataFrame

/** Typed result-size guard rails for the query envelopes — the
  * reference bounds sample queries with a server-side LIMIT n+1 whose
  * overflow surfaces as a TYPED error, and a result-byte cap enforced
  * while draining (chstorage/querier_logs_query.go:31-37, 95-151:
  * ErrLogsTooManySamples via `query.Limit(limit+1)` + post-drain
  * check, ErrLogsResultTooLarge via MaxResultBytes). Re-expressed
  * Spark-first: the row probe is a `LIMIT n+1` plan (CollectLimit — it
  * stops pulling past n+1 rows), the byte cap meters the per-series
  * JSON as the envelope assembles.
  */
object Limits {

  /** Row and byte caps for one API server instance. Zero or negative
    * disables the corresponding cap (reference config semantics).
    */
  final case class ResultLimits(
      maxSampleRows: Long = 1000000L,
      maxResultBytes: Long = 64L << 20)

  sealed abstract class LimitExceeded(msg: String)
      extends RuntimeException(msg)

  /** More result rows than the sample cap allows (limit+1 detected). */
  final class TooManySamples(rows: Long, limit: Long)
      extends LimitExceeded(
        s"too many samples: query produced more than $limit rows " +
          s"(saw $rows); narrow the selector or time range")

  /** The rendered result exceeded the byte cap mid-assembly. */
  final class ResultTooLarge(bytes: Long, limit: Long)
      extends LimitExceeded(
        s"result too large: $bytes bytes exceeds the $limit byte limit")

  /** limit+1 detection on the RESULT frame: bound a probe plan at
    * n+1 rows — reaching the bound proves the result exceeds the cap,
    * without materializing anything past it. The probe never collects
    * rows to the driver (count() over CollectLimit).
    */
  def guardRows(df: DataFrame, limit: Long): DataFrame = {
    if (limit > 0) {
      val n = df.limit((limit + 1).toInt).count()
      if (n > limit) throw new TooManySamples(n, limit)
    }
    df
  }

  /** Byte metering for envelope assembly: feed each rendered series
    * through; throws as soon as the running total crosses the cap.
    */
  final class ByteMeter(limit: Long) {
    private var total = 0L
    def add(chunk: String): String = {
      total += chunk.length.toLong
      if (limit > 0 && total > limit) throw new ResultTooLarge(total, limit)
      chunk
    }
  }
}
