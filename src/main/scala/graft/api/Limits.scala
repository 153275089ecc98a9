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

  /** Row/byte/time/concurrency caps for one API server instance. Zero
    * or negative disables the corresponding cap (reference config
    * semantics).
    *
    *   - `maxExecutionMs`: per-query execution-time cap, reference
    *     default 30 s (chstorage/querier.go:119-120 MaxExecutionTime;
    *     config cmd/oteldb/config.go:92) — enforced by cancelling the
    *     request's Spark job group at the deadline
    *   - `maxConcurrentQueries` + `queueDepth` + `queueWaitMs`: the
    *     bounded-executor shape — at most `maxConcurrentQueries`
    *     requests execute Spark jobs at once, at most `queueDepth`
    *     more wait up to `queueWaitMs`; anything beyond SHEDS with a
    *     typed 503 instead of queueing unboundedly (the scale-safe
    *     twin of the reference's bounded ClickHouse connection pool)
    */
  final case class ResultLimits(
      maxSampleRows: Long = 1000000L,
      maxResultBytes: Long = 64L << 20,
      maxExecutionMs: Long = 30000L,
      maxConcurrentQueries: Int = 16,
      queueDepth: Int = 32,
      queueWaitMs: Long = 10000L)

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
    *
    * NOTE: the serving path no longer calls this — it pays a SECOND
    * full plan execution per cold request (the probe job plus the
    * envelope collect). The envelopes now count samples inside the ONE
    * collect ([[ApiEncoders]] sums per-series sample counts post-drain
    * and calls [[checkRows]]), the reference's own single-pass shape
    * (chstorage/querier_logs_query.go:95-151 fetches limit+1 rows in
    * the one query and checks while draining). Kept for plans whose
    * result never assembles an envelope.
    */
  def guardRows(df: DataFrame, limit: Long): DataFrame = {
    if (limit > 0) {
      val n = df.limit((limit + 1).toInt).count()
      if (n > limit) throw new TooManySamples(n, limit)
    }
    df
  }

  /** Post-drain sample-count check (the single-pass guard's throw). */
  def checkRows(rows: Long, limit: Long): Unit =
    if (limit > 0 && rows > limit) throw new TooManySamples(rows, limit)

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
