package graft.sources

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ingest admission control — the reference's per-tenant operational
  * limits (cmd/oteldb/storage_policy.go:82-101 `LimitsConfig`):
  * lossless shedding of over-budget writes so an overload DEGRADES
  * (client sees OTLP partial success / gRPC RESOURCE_EXHAUSTED and can
  * retry) instead of buffering until the process OOMs.
  *
  *   - `ingestBytesPerSecond`: a token bucket bursting to one second
  *     of budget, applied to decompressed payload bytes at the edge.
  *   - `maxInFlightBytes`: bytes enqueued into the streaming sources
  *     but not yet committed by a sink micro-batch; accounting is
  *     exact — each payload's size is recorded against its source
  *     offset and released when a batch's progress event covers it.
  *   - `maxSeries` / `maxSeriesSoft`: active-series cardinality
  *     ceiling for metrics, enforced per micro-batch in the point
  *     inserter ([[SeriesBudget]]): past the soft budget a NEW series'
  *     samples route to a synthetic per-metric overflow series; past
  *     the hard ceiling they are shed. Existing series are unaffected.
  *   - `maxBodyBytes`: per-request/message edge cap (the
  *     maxInboundMessageSize every production gRPC server enforces),
  *     applied to both the wire bytes and the decompressed size.
  *
  * Zero values mean "no limit" (reference config semantics).
  */
object Admission {

  final case class LimitsConfig(
      ingestBytesPerSecond: Long = 0L,
      maxInFlightBytes: Long = 0L,
      maxSeries: Long = 0L,
      maxSeriesSoft: Long = 0L,
      maxBodyBytes: Long = 0L) {
    require(maxSeriesSoft <= 0 || maxSeries <= 0 || maxSeriesSoft <= maxSeries,
      s"limits: max_series_soft ($maxSeriesSoft) must not exceed max_series ($maxSeries)")
  }

  /** Typed shed signal: the edge maps it to OTLP partial success over
    * HTTP and grpc-status 8 (RESOURCE_EXHAUSTED) over gRPC.
    */
  final class ResourceExhausted(msg: String) extends RuntimeException(msg)

  /** Token bucket over bytes: capacity = one second of budget (the
    * reference's burst bound). Injectable clock for deterministic
    * tests. `bytesPerSecond <= 0` = unlimited.
    */
  final class TokenBucket(bytesPerSecond: Long,
      nowNs: () => Long = () => System.nanoTime()) {
    private var tokens = bytesPerSecond.toDouble
    private var last = nowNs()
    def tryAcquire(n: Long): Boolean = synchronized {
      if (bytesPerSecond <= 0) true
      else {
        val now = nowNs()
        tokens = math.min(bytesPerSecond.toDouble,
          tokens + (now - last) / 1e9 * bytesPerSecond)
        last = now
        if (n <= tokens) { tokens -= n; true } else false
      }
    }
    /** Return tokens consumed for a payload that was NOT admitted
      * downstream (e.g. the in-flight ledger shed it) — otherwise a
      * stalled sink also drains the rate budget and a retrying client
      * is double-penalized.
      */
    def refund(n: Long): Unit = synchronized {
      if (bytesPerSecond > 0)
        tokens = math.min(bytesPerSecond.toDouble, tokens + n)
    }
  }

  /** Unflushed-bytes ledger for ONE streaming source: `enqueue`
    * records a payload's size under the source offset it landed at
    * (MemoryStream ordinals are dense: one per addData call);
    * `releaseUpTo` frees everything a completed micro-batch consumed
    * (driven by the sink's progress event). `total` is shared across
    * the trackers of one receiver so the cap is global, as in the
    * reference (one in-flight budget per tenant, not per signal).
    */
  final class InFlightTracker(max: Long, total: AtomicLong) {
    private val pending = new java.util.ArrayDeque[(Long, Long)]() // (offset, bytes)
    def tryEnqueue(bytes: Long, offset: => Long): Boolean = synchronized {
      if (max > 0 && total.get() + bytes > max) false
      else {
        val off = offset // addData runs under the lock: offsets stay ordered
        pending.addLast((off, bytes))
        total.addAndGet(bytes)
        true
      }
    }
    def releaseUpTo(offset: Long): Unit = synchronized {
      while (!pending.isEmpty && pending.peekFirst()._1 <= offset)
        total.addAndGet(-pending.removeFirst()._2): Unit
    }
    def inFlight: Long = total.get()
  }

  /** Running counters for the admin/storage view and specs. */
  final class Stats {
    val shedRequests = new AtomicLong
    val shedSamples = new AtomicLong
    val overflowSeries = new AtomicLong
    val activeSeries = new AtomicLong
  }

  /** Active-series cardinality ceiling, enforced in the metric-point
    * inserter per micro-batch — the Spark seam of the reference's
    * in-memory active-series map. Driver state is one Long hash per
    * active series (the same memory shape the reference holds); on
    * restart rebuild it from the stored layout with [[rebuildFrom]].
    *
    * Decisions are deterministic within a batch (new series processed
    * in (name, key) order), so an exactly-once replay of a batch
    * against the same starting set re-derives the same admissions.
    */
  final class SeriesBudget(maxSeries: Long, maxSeriesSoft: Long,
      val stats: Stats = new Stats) {
    private val known = new java.util.HashSet[java.lang.Long]()

    /** name + canonically-rendered labels → 64-bit series key; the
      * same column works on stored frames for [[rebuildFrom]]. The
      * rendering is the repo's collision-free JSON idiom
      * (VectorMatching.streamKey) — a plain `k=v` join is ambiguous
      * when a label VALUE contains the separators ({a:"1,b=2"} vs
      * {a:"1", b:"2"}) and would conflate distinct series here.
      */
    private def seriesKey = xxhash64(col("name"),
      to_json(array_sort(map_entries(col("labels")))))

    private def overflowKey(name: String): Long =
      // synthetic per-metric overflow series identity (stable hash of
      // the name under a marker salt)
      scala.util.hashing.MurmurHash3.stringHash("__series_overflow__" + name).toLong

    def rebuildFrom(points: DataFrame): Unit = synchronized {
      points.select(seriesKey.as("k")).distinct().collect()
        .foreach(r => known.add(r.getLong(0)): Unit)
      stats.activeSeries.set(known.size.toLong)
    }

    /** Admit a micro-batch: known series pass; new series admit while
      * under the soft budget, route to the per-metric overflow series
      * between soft and hard, shed past hard. Returns the rewritten
      * batch (shed rows removed, overflow rows' labels replaced).
      */
    def admit(batch: DataFrame): DataFrame = {
      if (maxSeries <= 0 && maxSeriesSoft <= 0) return batch
      val ss = batch.sparkSession
      val withKey = batch.withColumn("__skey", seriesKey)
      // vocabulary-sized per batch: distinct series, not samples; the
      // per-series sample count rides the same aggregate (map-side
      // combined) so shed totals need no second pass over the batch
      val batchSeries = withKey.groupBy(col("name"), col("__skey"))
        .agg(count(lit(1)).as("__n")).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .sortBy(t => (t._1, t._2))
      var shedSamples = 0L
      val decisions = synchronized {
        val hard = if (maxSeries > 0) maxSeries else Long.MaxValue
        val soft = if (maxSeriesSoft > 0) maxSeriesSoft else hard
        batchSeries.flatMap { case (name, key, n) =>
          if (known.contains(key)) None
          else if (known.size < soft) { known.add(key); None } // admit
          else {
            val ok = overflowKey(name)
            if (known.contains(ok)) Some(key -> 1)
            else if (known.size < hard) {
              known.add(ok)
              stats.overflowSeries.incrementAndGet()
              Some(key -> 1) // overflow
            } else { shedSamples += n; Some(key -> 2) } // shed
          }
        }.toMap
      }
      stats.activeSeries.set(known.size.toLong)
      if (shedSamples > 0) stats.shedSamples.addAndGet(shedSamples): Unit
      if (decisions.isEmpty) return batch
      import ss.implicits._
      val decDf = decisions.toSeq.toDF("__skey", "__dec")
      withKey
        .join(broadcast(decDf), Seq("__skey"), "left")
        .filter(col("__dec").isNull || col("__dec") =!= 2)
        .withColumn("labels", when(col("__dec") === 1,
          map(lit("__series_overflow__"), lit("true"))).otherwise(col("labels")))
        .drop("__skey", "__dec")
    }
  }

  // ---- OTLP partial-success envelopes (public OTLP proto: every
  // Export*ServiceResponse has `partial_success = 1` whose message is
  // `{ int64 rejected_<items> = 1; string error_message = 2; }`) ----

  /** Serialized Export*ServiceResponse carrying a partial_success with
    * every item rejected — the lossless-shed report (storage_policy.go
    * LimitsConfig doc; envelope fields from the public OTLP proto).
    * r17: on the shared [[graft.util.ProtoW]] writer.
    */
  def partialSuccess(rejected: Long, message: String): Array[Byte] =
    new graft.util.ProtoW().msg(1, new graft.util.ProtoW()
      .vint(1, rejected).str(2, message)).toByteArray

  // ---- bounded decompression (edge size caps) ----

  /** gunzip with a decompressed-size cap: reads at most `cap` bytes
    * and fails typed if the stream holds more — a tiny gzip body can
    * otherwise inflate to GBs at the edge.
    */
  def gunzipBounded(raw: Array[Byte], cap: Long): Array[Byte] = {
    val in = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(raw))
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    var n = in.read(buf)
    while (n >= 0) {
      if (cap > 0 && out.size().toLong + n > cap)
        throw new ResourceExhausted(
          s"decompressed body exceeds $cap byte limit")
      out.write(buf, 0, n)
      n = in.read(buf)
    }
    out.toByteArray
  }

  /** Snappy-block decode with the declared-length checked against the
    * cap BEFORE allocating (the header varint is attacker-controlled).
    */
  def snappyBounded(raw: Array[Byte], cap: Long): Array[Byte] = {
    if (cap > 0) {
      var v = 0L; var shift = 0; var i = 0; var more = true
      while (more && i < raw.length && shift < 64) {
        val b = raw(i) & 0xff
        v |= (b & 0x7fL) << shift
        shift += 7; i += 1; more = (b & 0x80) != 0
      }
      if (v > cap)
        throw new ResourceExhausted(
          s"snappy declared length $v exceeds $cap byte limit")
    }
    Snappy.decode(raw)
  }
}
