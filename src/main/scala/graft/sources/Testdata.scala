package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver's deterministic testdata (TESTDATA.md).
  *
  * Tables: region nation customer supplier part orders lineitem events
  * documents embeddings — one parquet file each under `dir`.
  *
  * `events.ts` is parquet TIMESTAMP(NANOS); with
  * `spark.sql.legacy.parquet.nanosAsLong=true` it surfaces as a Long of
  * epoch-nanoseconds (see GraftSession). All time arithmetic over events
  * is therefore exact integer ns math — the same fidelity decision the
  * reference makes (ns uint64, internal/otelstorage/timestamp.go:11-15).
  */
final case class Testdata(spark: SparkSession, dir: String) {
  // Defensive: callers that did not build their session via GraftSession
  // (e.g. a bare spark-shell) still need the ns-as-long read path.
  spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

  private def table(name: String): DataFrame =
    Testdata.cached(spark, s"$dir/$name.parquet")

  def region: DataFrame     = table("region")
  def nation: DataFrame     = table("nation")
  def customer: DataFrame   = table("customer")
  def supplier: DataFrame   = table("supplier")
  def part: DataFrame       = table("part")
  def orders: DataFrame     = table("orders")
  def lineitem: DataFrame   = table("lineitem")
  def events: DataFrame     = table("events")
  def documents: DataFrame  = table("documents")
  def embeddings: DataFrame = table("embeddings")
}

object Testdata {
  // Reuse resolved relations across the many queries of a Verify/Bench
  // run: keeps one FileIndex per file instead of re-listing per query.
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  private def cached(spark: SparkSession, path: String): DataFrame =
    cache.computeIfAbsent((spark, path), { case (s, p) => s.read.parquet(p) })
}
