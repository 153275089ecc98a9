package graft

import java.util.concurrent.{CountDownLatch, TimeUnit}
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

import graft.util.SeriesCache

/** Series-resolution cache semantics (reference internal/metricscache
  * + querier_metrics_timeseries.go singleflight): scan-skipping on
  * repeat, coalescing under concurrency, LRU bounds, canonical keys.
  */
class SeriesCacheSpec extends SparkTestBase {
  import spark.implicits._

  test("repeated matcher lookup skips the scan entirely") {
    val execs = new AtomicInteger
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution,
          durationNs: Long): Unit = { execs.incrementAndGet(): Unit }
      override def onFailure(funcName: String, qe: QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val df = Seq(("cpu", Map("job" -> "api")), ("mem", Map("job" -> "db")))
        .toDF("name", "labels")
      val cache = new SeriesCache[Long]()
      val key = cache.keyOf(Seq(("=", "job", "api")), 0L, 1000L)
      def resolve(): Long = cache.get(key)(df.filter($"name" === "cpu").count())

      assert(resolve() == 1L)
      // the miss ran a real Spark execution; wait for the async
      // listener to observe it
      val deadline = System.nanoTime() + 10_000_000_000L
      while (execs.get() == 0 && System.nanoTime() < deadline)
        Thread.sleep(50)
      assert(execs.get() >= 1)

      val before = execs.get()
      assert(resolve() == 1L) // hit: served from cache
      Thread.sleep(500) // listener is async; give a straggler time
      assert(execs.get() == before,
        "cache hit must not launch a query execution")
      assert(cache.hits.get() == 1 && cache.misses.get() == 1)
    } finally spark.listenerManager.unregister(listener)
  }

  test("concurrent identical lookups coalesce into one computation") {
    val cache = new SeriesCache[Int]()
    val key = cache.keyOf(Seq(("=", "job", "api")), 0L, 1L)
    val calls = new AtomicInteger
    val release = new CountDownLatch(1)
    val threads = (1 to 8).map { _ =>
      new Thread(() => {
        val v = cache.get(key) {
          calls.incrementAndGet()
          release.await(10, TimeUnit.SECONDS)
          42
        }
        assert(v == 42)
      })
    }
    threads.foreach(_.start())
    Thread.sleep(300) // let the stragglers queue on the in-flight future
    release.countDown()
    threads.foreach(_.join(10000))
    assert(calls.get() == 1, "exactly one computation for 8 callers")
    assert(cache.coalesced.get() >= 1)
  }

  test("LRU evicts the eldest entry beyond capacity") {
    val cache = new SeriesCache[Int](maxEntries = 2)
    val ks = (1 to 3).map(i => cache.keyOf(Seq(("=", "k", i.toString)), 0L, 1L))
    val computes = new AtomicInteger
    def load(k: String): Int = cache.get(k) { computes.incrementAndGet() }
    ks.foreach(load)
    assert(cache.size == 2)
    load(ks(2)) // still cached
    assert(computes.get() == 3)
    load(ks(0)) // evicted -> recompute
    assert(computes.get() == 4)
  }

  test("key canonicalization: matcher order-insensitive, window-sensitive") {
    val cache = new SeriesCache[Int]()
    val a = Seq(("=", "job", "api"), ("!=", "env", "dev"))
    assert(cache.keyOf(a, 0L, 1L) == cache.keyOf(a.reverse, 0L, 1L))
    assert(cache.keyOf(a, 0L, 1L) != cache.keyOf(a, 0L, 2L))
    assert(cache.keyOf(a, 0L, 1L) != cache.keyOf(a.take(1), 0L, 1L))
  }

  test("query path: two identical range queries plan ONE resolution scan") {
    import org.apache.spark.sql.functions._
    // parquet-backed points so the resolution is a REAL file scan
    val dir = java.nio.file.Files.createTempDirectory("graftrescache").toString
    Seq(
      (1000000L, "cpu", Map("host" -> "a"), 1.0),
      (61000000L, "cpu", Map("host" -> "a"), 3.0),
      (1000000L, "mem", Map("host" -> "b"), 5.0)
    ).toDF("ts_us", "name", "labels", "value")
      .write.mode("overwrite").parquet(dir)
    val points = spark.read.parquet(dir)

    val plans = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution,
          durationNs: Long): Unit = { plans.add(qe.executedPlan.toString): Unit }
      override def onFailure(funcName: String, qe: QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    val api = new graft.api.HttpApi(
      Seq.empty[(Long, String, Map[String, String])].toDF("ts_ns", "body", "labels"),
      points,
      Seq.empty[(Long, Long, Option[Long], String, Long, Long, Map[String, String])]
        .toDF("trace_id", "span_id", "parent_span_id", "name", "start_ns",
          "duration_ns", "attrs"))
    val port = api.start()
    def run(): Unit = {
      val conn = java.net.URI.create(
        s"http://127.0.0.1:$port/api/v1/query_range?query=cpu&step=60")
        .toURL.openConnection().asInstanceOf[java.net.HttpURLConnection]
      assert(conn.getResponseCode == 200)
      conn.getInputStream.readAllBytes(): Unit
    }
    try {
      run()
      val deadline = System.nanoTime() + 10_000_000_000L
      while (plans.size() < 2 && System.nanoTime() < deadline) Thread.sleep(50)
      assert(api.resolutionCache.misses.get() == 1)
      plans.clear()

      run() // identical query: resolution must come from the cache
      assert(api.resolutionCache.hits.get() == 1,
        "second identical query must hit the resolution cache")
      val d2 = System.nanoTime() + 10_000_000_000L
      while (plans.isEmpty && System.nanoTime() < d2) Thread.sleep(50)
      Thread.sleep(500) // let stragglers land
      val second = plans.toArray(Array.empty[String]).mkString("\n")
      // listener proof: the second query's executions serve the points
      // from the in-memory columnar cache. (The InMemoryRelation
      // rendering textually embeds its original FileScan, so the
      // proof is the substitution node + the miss counter staying at
      // one — the resolution computation never re-ran.)
      assert(second.contains("InMemoryTableScan"),
        s"expected the cached resolution in the plan:\n$second")
      assert(api.resolutionCache.misses.get() == 1,
        "second identical query must not recompute the resolution")
    } finally {
      api.stop()
      spark.listenerManager.unregister(listener)
    }
  }
}
