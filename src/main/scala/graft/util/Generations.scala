package graft.util

import java.util.concurrent.atomic.AtomicLong

/** The live composition root's layout-freshness seam (graft.Serve):
  * PER-SIGNAL generation counters + a shared maintenance counter, and
  * the generation-memoized accessor the serving views sit behind.
  *
  * Why per-signal: a committed points micro-batch must not force the
  * logs view (whose re-open pays a distributed mergeSchema footer job)
  * or any other untouched layout to re-list — under steady
  * single-signal ingest a single global counter would defeat the
  * memoization for every layout. Maintenance/out-of-band changes (TTL,
  * compaction, flush) touch multiple layouts and bump the shared
  * maintenance counter, which every per-signal view also observes.
  *
  * Two invariants the result caches and serving views build on
  * (property-tested in GenerationsPropertySpec):
  *   1. `total` moves on EVERY layout change — each bump/refresh
  *      strictly increases it (each counter is monotone, so the sum
  *      is), which is what lets the HttpApi envelope/resolution caches
  *      key on the total: a changed layout can never hit a stale entry.
  *   2. a [[Live]] view re-opens (re-lists) iff ITS generation
  *      (signal + maintenance) moved since its last open — freshness
  *      without cross-signal re-list churn.
  */
final class Generations(signals: Seq[String]) {
  private val sigGens: Map[String, AtomicLong] =
    signals.map(_ -> new AtomicLong(0L)).toMap
  private val maintGen = new AtomicLong(0L)

  /** Monotone total across every counter — the result-cache key. */
  def total: Long = sigGens.valuesIterator.map(_.get).sum + maintGen.get

  /** A committed micro-batch changed ONE signal's layout. */
  def bump(signal: String): Unit = { sigGens(signal).incrementAndGet(); () }

  /** An out-of-band change (TTL, compaction, flush) may have touched
    * any layout: every view must re-open.
    */
  def refresh(): Unit = { maintGen.incrementAndGet(); () }

  /** The generation ONE signal's view observes. */
  def of(signal: String): () => Long = {
    val g = sigGens(signal)
    () => g.get + maintGen.get
  }
}

object Generations {
  /** Generation-memoized accessor: re-opens only when `gen()` moved
    * since the last open. A benign race — two concurrent first
    * requests both open — publishes one of two equally valid values.
    */
  final class Live[T](gen: () => Long, open: () => T) {
    @volatile private var state: (Long, T) = null
    def get(): T = {
      val g = gen()
      val s = state
      if (s != null && s._1 == g) s._2
      else { val v = open(); state = (g, v); v }
    }
  }
}
