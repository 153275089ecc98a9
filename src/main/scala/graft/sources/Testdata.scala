package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit, unix_micros}

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
  // (e.g. a bare spark-shell) still need the ns-as-long read path and
  // the UTC wall-clock the µs→ns normalization below relies on.
  spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
  spark.conf.set("spark.sql.session.timeZone", "UTC")

  private def table(name: String): DataFrame =
    Testdata.cached(spark, s"$dir/$name.parquet")

  def region: DataFrame     = table("region")
  def nation: DataFrame     = table("nation")
  def customer: DataFrame   = table("customer")
  def supplier: DataFrame   = table("supplier")
  def part: DataFrame       = table("part")
  def orders: DataFrame     = table("orders")
  def lineitem: DataFrame   = table("lineitem")
  /** `events` with `ts` ALWAYS an epoch-nanosecond Long, whatever unit
    * the generator wrote. Older corpora store parquet TIMESTAMP(NANOS)
    * (surfaced as Long via `nanosAsLong`); the current generator writes
    * TIMESTAMP(MICROS), which Spark surfaces as a timestamp — normalize
    * it back to the engine's ns representation (UTC session, exact
    * µs×1000 integer math, no precision games).
    */
  def events: DataFrame = {
    val df = table("events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => df
      case _ => df.withColumn("ts", unix_micros(col("ts").cast("timestamp")) * lit(1000L))
    }
  }
  def documents: DataFrame  = table("documents")
  def embeddings: DataFrame = table("embeddings")
}

object Testdata {
  // Reuse resolved relations across the many queries of a Verify/Bench
  // run: keeps one FileIndex per file instead of re-listing per query.
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  private def cached(spark: SparkSession, path: String): DataFrame =
    cache.computeIfAbsent((spark, path), { case (s, p) => materialized(s, p) })

  // r19b: fact tables re-materialize byte-derived with a CORES/4 floor
  // and a CORES cap. The r18 formula (4..32 at ~256 KB, 1 MB floor)
  // left documents/embeddings at ONE row group, serializing every
  // scan-fused kernel (pipe_bpe_encode 1.33 s single-task); the first
  // r19 attempt (flat CORE-count fan-out for every table) fixed those
  // but taxed ~50 tiny floor-dominated queries with 32 scan tasks per
  // stage (bench total 149 → 170 s, measured and REVERTED in
  // OPTIMIZATION_r19.md). One file is one row group is one task, so
  // the part count must balance kernel parallelism against the
  // local per-task dispatch floor. Bump invalidates older layouts.
  private val TableCacheVersion = "r19b"

  /** Parquet splits are at ROW-GROUP granularity, and the driver's
    * testdata is one row group per table — a scan (and every parser
    * stage fused into it) would run single-threaded no matter the
    * partition-bytes setting. Fact tables (≥ ~0.5 MB) are therefore
    * re-materialized once into a core-count file layout
    * (defaultParallelism — SPARK_GRAFT_CPUS under the bench contract,
    * the executor fan-out on a cluster), which is exactly the
    * part-sizing discipline a real inserter applies (the reference's
    * MergeTree parts; SURVEY §4.2) — queries read the stored layout,
    * ingest runs once. Small dims stay single-file (broadcast-sized).
    * File count: byte-derived (~256 KB parts) with a floor of a
    * QUARTER of the cores and a cap of the core count — the heavy
    * per-row kernels (BPE/CDC/hash featurizers) are compute-bound per
    * byte and must never serialize onto one task, but every extra
    * scan task also costs the local scheduler's per-task dispatch
    * (r19 measured both failure modes: 1-file documents ran
    * pipe_bpe_encode 1.33 s single-task; a flat 32-file fan-out for
    * every table added +20 s across ~50 tiny queries).
    */
  private def materialized(s: SparkSession, p: String): DataFrame = {
    val src = new java.io.File(p)
    if (!src.isFile || src.length() < 500000) return s.read.parquet(p)
    val root = new java.io.File(System.getProperty("java.io.tmpdir"), "graft_tables")
    val key = s"g_${p}_$TableCacheVersion".replaceAll("[^A-Za-z0-9._-]", "_")
    val target = new java.io.File(root, key)
    this.synchronized {
      if (!new java.io.File(target, "_SUCCESS").exists()) {
        root.mkdirs()
        // purge stale generations
        Option(root.listFiles()).foreach(_.foreach { f =>
          if (f.getName.startsWith("g_") &&
              !f.getName.contains(s"_$TableCacheVersion") &&
              !f.getName.contains(".tmp.")) deleteRec(f)
        })
        val tmp = new java.io.File(root,
          s"$key.tmp.${ProcessHandle.current().pid()}")
        // scan parallelism follows file count exactly (one ~4
        // MB-charged split per file under the default openCostInBytes
        // packing), so this IS the task count per scan stage:
        // byte-derived (~256 KB parts) between cores/4 and cores —
        // the floor keeps compute-bound kernels off a single task,
        // the cap keeps tiny queries from paying a full-machine task
        // dispatch per scan (both failure modes measured, r19)
        val cores = s.sparkContext.defaultParallelism
        val parts = math.min(math.max(4, cores),
          math.max(math.max(4, cores / 4), (src.length() / 262144).toInt))
        s.read.parquet(p).repartition(parts)
          .write.mode("overwrite").parquet(tmp.getPath)
        // cross-process race: losing the rename means a complete copy
        // already landed — discard ours
        if (!tmp.renameTo(target)) deleteRec(tmp)
      }
    }
    s.read.parquet(target.getPath)
  }

  private def deleteRec(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(deleteRec))
    f.delete(): Unit
  }
}
