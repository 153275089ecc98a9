package graft.api

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

  /** Post-drain sample-count check — the single-pass guard's throw.
    * The serving envelopes bound materialization with a `limit(n+1)`
    * on the sample frame and sum per-series counts inside the ONE
    * collect ([[ApiEncoders.matrixSeries]]), the reference's own
    * fetch-limit+1-and-check-while-draining shape
    * (chstorage/querier_logs_query.go:95-151); the r14-era standalone
    * probe (`guardRows`, a second full plan execution per request) is
    * gone.
    */
  def checkRows(rows: Long, limit: Long): Unit =
    if (limit > 0 && rows > limit) throw new TooManySamples(rows, limit)

  /** Byte metering for envelope assembly: feed each rendered series
    * through; throws as soon as the running total crosses the cap.
    * Counts UTF-8 WIRE bytes (what the cap is for), not UTF-16 chars —
    * a CJK log envelope is ~3 bytes per char and would otherwise
    * under-enforce the cap ~3×. Allocation-free scan.
    */
  final class ByteMeter(limit: Long) {
    private var total = 0L
    def add(chunk: String): String = {
      total += utf8Length(chunk)
      if (limit > 0 && total > limit) throw new ResultTooLarge(total, limit)
      chunk
    }
    private def utf8Length(s: String): Long = {
      var i = 0
      var n = 0L
      while (i < s.length) {
        val c = s.charAt(i)
        if (c < 0x80) n += 1
        else if (c < 0x800) n += 2
        else if (Character.isHighSurrogate(c) && i + 1 < s.length &&
            Character.isLowSurrogate(s.charAt(i + 1))) { n += 4; i += 1 }
        else n += 3
        i += 1
      }
      n
    }
  }
}
