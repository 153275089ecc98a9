package graft.util

import java.util.concurrent.{CompletableFuture, ConcurrentHashMap}
import java.util.concurrent.atomic.AtomicLong

/** Matcher-keyed series-resolution cache (reference
  * internal/metricscache cache semantics + the xxh3-keyed singleflight
  * of querier_metrics_timeseries.go:43-147): the key is the canonical
  * xxh3-128 of the SORTED matcher set plus the query window, an LRU
  * bounds the materialized results, and singleflight coalesces
  * concurrent identical lookups into ONE computation — a dashboard
  * refresh fanning out N panels over the same selector runs the
  * series-resolution scan once, every later refresh not at all.
  *
  * Values are the MATERIALIZED resolution result (an encoded envelope
  * or a collected series set), never a lazy DataFrame — the point is
  * skipping the scan, not caching a plan.
  */
final class SeriesCache[V](maxEntries: Int = 256,
    onEvict: V => Unit = (_: V) => (),
    // admission predicate: a computed value that fails it is RETURNED
    // but never stored (e.g. oversized envelopes that would let 64
    // entries pin gigabytes)
    admit: V => Boolean = (_: V) => true) {

  /** xxh3-128 of the canonical key rendering: matchers sorted by
    * (op, label, value) — hash equality is order-insensitive, like
    * hashPrometheusMatchers — plus the window bounds.
    */
  def keyOf(matchers: Seq[(String, String, String)],
      startNs: Long, endNs: Long): String = {
    val canon = matchers.map { case (op, l, v) => s"$op\u0000$l\u0000$v" }
      .sorted.mkString("\u0001") + s"\u0002$startNs\u0002$endNs"
    val h = graft.functions.JKernels.xxh3_128(
      canon.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    h.map("%02x".format(_)).mkString
  }

  private val lru = java.util.Collections.synchronizedMap(
    new java.util.LinkedHashMap[String, V](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, V]): Boolean = {
        val evict = this.size() > maxEntries
        // release side-band resources (e.g. unpersist a materialized
        // resolution frame) when LRU pressure drops an entry
        if (evict) onEvict(e.getValue)
        evict
      }
    })
  private val inflight = new ConcurrentHashMap[String, CompletableFuture[V]]()

  val hits = new AtomicLong
  val misses = new AtomicLong
  val coalesced = new AtomicLong

  /** The cached value for `key`, computing it once on miss. Concurrent
    * callers with the same key wait on the in-flight computation
    * instead of starting their own; a failed computation propagates to
    * every waiter and caches nothing. `waitMs > 0` bounds a WAITER's
    * wait (java.util.concurrent.TimeoutException past it) — a caller
    * under its own execution-time cap must not block unboundedly on a
    * leader it cannot cancel.
    */
  def get(key: String, waitMs: Long = 0L)(compute: => V): V = {
    val cached = lru.get(key)
    if (cached != null) { hits.incrementAndGet(); return cached }
    val fut = new CompletableFuture[V]()
    val prior = inflight.putIfAbsent(key, fut)
    if (prior != null) {
      coalesced.incrementAndGet()
      // unwrap the future's wrapper so a waiter sees the SAME typed
      // exception the leader threw (a TooManySamples wrapped in
      // ExecutionException would miss every typed catch upstream)
      try return if (waitMs > 0)
        prior.get(waitMs, java.util.concurrent.TimeUnit.MILLISECONDS)
      else prior.join()
      catch {
        case e: java.util.concurrent.ExecutionException
            if e.getCause != null => throw e.getCause
        case e: java.util.concurrent.CompletionException
            if e.getCause != null => throw e.getCause
      }
    }
    try {
      misses.incrementAndGet()
      val v = compute
      if (admit(v)) lru.put(key, v)
      fut.complete(v)
      v
    } catch {
      case e: Throwable => fut.completeExceptionally(e); throw e
    } finally {
      inflight.remove(key): Unit
    }
  }

  def size: Int = lru.size()
}
