package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical table layout — the Spark mapping of the reference's
  * MergeTree storage design (SURVEY.md §1.2/§4.2; golden DDL
  * internal/chstorage/_golden/schema.*.sql):
  *
  *   - PARTITION BY toYYYYMMDD(timestamp)  → parquet `date=` partitions
  *     (partition pruning = MergeTree partition pruning)
  *   - ORDER BY (severity, service, ts)    → sortWithinPartitions
  *     (row-group min/max stats prune like primary-key ranges)
  *   - bloom_filter index on trace_id      → parquet bloom filters
  *
  * At 100 TB this layout is what makes instant lookups and narrow
  * selectors IO-bound on a few row groups instead of a full scan.
  */
object Layout {

  /** logs: daily partitions, reference ORDER BY (severity_number,
    * service_name, ts_ns), bloom on trace_id when present
    * (reference columns_logs.go:98-126).
    */
  // NB: the partition column leads every sortWithinPartitions below —
  // the dynamic-partition writer requires rows clustered by partition
  // columns and would otherwise inject its own re-sort, destroying the
  // ORDER BY layout.
  def writeLogs(logs: DataFrame, path: String, mode: String = "overwrite"): Unit = {
    val withDate = logs.withColumn("date",
      date_format(timestamp_micros(expr("ts_ns div 1000")), "yyyyMMdd"))
    val hasTraceId = logs.columns.contains("trace_id")
    val base = withDate
      .repartition(col("date"))
      .sortWithinPartitions(col("date"), col("severity_number"), col("service_name"), col("ts_ns"))
      .write.mode(mode)
      .partitionBy("date")
    val withBloom =
      if (hasTraceId)
        base.option("parquet.bloom.filter.enabled#trace_id", "true")
          .option("parquet.bloom.filter.expected.ndv#trace_id", "1000000")
      else base
    withBloom.parquet(path)
  }

  /** metric points: daily partitions, ORDER BY (hash, ts) — the
    * (hash, timestamp) primary key of metrics_points
    * (reference columns_metrics.go:144-148).
    */
  def writePoints(points: DataFrame, path: String,
      mode: String = "overwrite"): Unit =
    points
      .withColumn("date",
        date_format(timestamp_micros(expr("ts_us")), "yyyyMMdd"))
      .repartition(col("date"))
      .sortWithinPartitions(col("date"), col("name"), col("ts_us"))
      .write.mode(mode)
      .partitionBy("date")
      .parquet(path)

  /** spans: service-major sort like traces_spans ORDER BY
    * (service, start); bucketing-ready on trace_id for shuffle-free
    * structural joins (reference _golden/schema.traces_spans.sql).
    */
  /** Spans bucketed on trace_id: every structural TraceQL op is a
    * self-join keyed on trace_id, and bucketing makes those joins
    * SHUFFLE-FREE — HashPartitioning(trace_id) satisfies the join's
    * clustered distribution even when the equi-keys are a superset
    * (trace_id + parent/span ids). The 100 TB deployment writes spans
    * this way once; LayoutSpec asserts the exchange-free plan.
    */
  def writeSpansBucketed(spans: DataFrame, table: String, path: String,
      buckets: Int = 32): Unit =
    spans.write.mode("overwrite")
      .bucketBy(buckets, "trace_id")
      .sortBy("trace_id", "span_id")
      .option("path", path)
      .saveAsTable(table)

  /** Ingest-materialized ancestry: adds `parent_path Array[Int]` — the
    * root-ward ancestor chain of every span, derived once here (one
    * groupByKey(trace_id) shuffle) so `>>`/`<<` queries explode a
    * stored column instead of re-walking parent pointers per query
    * (the reference keeps the same parent map in memory per trace,
    * traceqlengine/spanset_op.go:156-193; SURVEY §7 commits to the
    * ingest-time column for 100 TB).
    */
  def withParentPath(spans: DataFrame): DataFrame =
    if (spans.columns.contains("parent_path")) spans
    else if (!spans.columns.contains("parent_span_id") ||
             !spans.columns.contains("span_id") ||
             !spans.columns.contains("trace_id"))
      // frames without ancestry columns (e.g. streaming enrich fixtures)
      // can't carry a path — structural ops aren't expressible on them
      spans
    else
      spans.join(
        graft.traceql.TraceQL.parentPaths(spans),
        Seq("trace_id", "span_id"), "left")

  def writeSpans(spans: DataFrame, path: String,
      mode: String = "overwrite"): Unit =
    withParentPath(spans)
      .withColumn("date",
        date_format(timestamp_micros(expr("start_ns div 1000")), "yyyyMMdd"))
      .repartition(col("date"))
      .sortWithinPartitions(col("date"), col("name"), col("start_ns"))
      .write.mode(mode)
      .partitionBy("date")
      .option("parquet.bloom.filter.enabled#trace_id", "true")
      .parquet(path)

  /** compare() attr-count rollup sidecar: the per-batch PARTIAL counts
    * [[graft.traceql.TraceQL.compareAttrCounts]] emits, date-partitioned
    * on the grain bucket like every other layout. Counts are additive,
    * so streaming appends partial rows and readers merge with a
    * sum(n) groupBy (the AggregatingMergeTree discipline) — no upsert
    * machinery at 100 TB, and compaction can pre-merge a day at will
    * via [[compactPartition]] with a sum transform.
    */
  def writeAttrCube(cube: DataFrame, path: String,
      mode: String = "overwrite"): Unit =
    cube
      .withColumn("date",
        date_format(timestamp_micros(expr("bucket_ns div 1000")), "yyyyMMdd"))
      .repartition(col("date"))
      .sortWithinPartitions(col("date"), col("attr"), col("attr_value"),
        col("bucket_ns"))
      .write.mode(mode)
      .partitionBy("date")
      .parquet(path)

  /** exemplars: daily partitions, ORDER BY (name, ts) — small next to
    * the points table (a few exemplars per series per scrape), read by
    * the query_exemplars endpoint's selector + time window.
    */
  def writeExemplars(exemplars: DataFrame, path: String,
      mode: String = "overwrite"): Unit =
    exemplars
      .withColumn("date",
        date_format(timestamp_micros(col("ts_us")), "yyyyMMdd"))
      .repartition(col("date"))
      .sortWithinPartitions(col("date"), col("name"), col("ts_us"))
      .write.mode(mode)
      .partitionBy("date")
      .parquet(path)

  private[graft] def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete(): Unit
  }

  /** Whether a layout root holds any date partition — the shared
    * "does this layout exist yet" probe (tier loaders, the Serve
    * empty-frame fallbacks, and specs all need the same answer; five
    * independent copies of layout-structure knowledge would drift).
    */
  def hasDatePartitions(root: String): Boolean =
    Option(new java.io.File(root).listFiles())
      .exists(_.exists(_.getName.startsWith("date=")))

  /** Swap epoch per layout root: bumped (under the root lock) by every
    * mutation that can make a concurrent reader's file LISTING
    * incomplete — the compaction swap, the aside-settle's late-file
    * moves, and crash-recovery restores. Batch commits only ADD files,
    * so they don't bump (a pre-commit listing is merely less fresh,
    * not wrong).
    */
  private val swapEpochs =
    new java.util.concurrent.ConcurrentHashMap[String,
      java.util.concurrent.atomic.AtomicLong]()
  private def epochOf(root: String) =
    swapEpochs.computeIfAbsent(
      new java.io.File(root).getAbsolutePath,
      _ => new java.util.concurrent.atomic.AtomicLong())
  def swapEpoch(root: String): Long = epochOf(root).get()

  /** Opens a layout (typically `spark.read.parquet`, whose eager file
    * LISTING must not observe a mid-swap layout where a partition is
    * briefly ABSENT) with a lock-free swap-epoch double-check: if a
    * swap ran during the open, re-open. Deliberately NOT a lock around
    * the open — a large layout's listing takes seconds and would stall
    * every ingest commit behind each query re-open; the epoch retry
    * costs a second listing only in the actual race window. Exhausted
    * retries THROW (a FileNotFoundException, which the query server's
    * stale-listing retry recognizes) rather than return the last
    * possibly-mid-swap listing — a live deployment would otherwise
    * memoize an incomplete frame under the current generation and keep
    * serving it until the next bump.
    */
  def openConsistent[T](root: String)(open: => T): T = {
    var attempts = 0
    while (true) {
      val e0 = swapEpoch(root)
      val v = open
      if (swapEpoch(root) == e0) return v
      attempts += 1
      if (attempts > 3)
        throw new java.io.FileNotFoundException(
          s"layout $root kept swapping during open ($attempts attempts); " +
            "retry the read")
    }
    throw new IllegalStateException("unreachable")
  }

  /** Per-layout-root mutex serializing [[commitBatch]]'s move phase
    * against [[compactPartition]]'s directory swap. Without it, a
    * batch committing COLD-DATED rows (backfill) can interleave with a
    * concurrent maintenance swap of the same partition and lose the
    * batch's files silently (the swap destroys the superseded dir
    * wholesale). The deployment contract is one writer JVM per layout
    * (the receiver) with maintenance in the same driver (admin action
    * or the Serve scheduler), so a JVM lock is the correct scope. Both
    * critical sections are rename-only — the slow work (the batch's
    * parquet write, the compaction merge job) stays outside.
    */
  private val rootLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private def lockFor(root: String): Object =
    rootLocks.computeIfAbsent(
      new java.io.File(root).getAbsolutePath, _ => new Object)

  /** EXACTLY-ONCE micro-batch commit for the append-mode foreachBatch
    * sinks. `foreachBatch` is at-least-once: after a crash between the
    * parquet append and the checkpoint commit, Structured Streaming
    * replays the batch and a plain `mode("append")` would duplicate
    * every row. This wraps the write in an idempotent commit protocol:
    *
    *   1. a `_committed_<batchId>` marker short-circuits a replay of a
    *      fully committed batch;
    *   2. the batch writes to a private `.staging_<batchId>` dir
    *      (deleted first — a replay after a partial write starts clean);
    *   3. staged files move into the live `date=` partitions under
    *      batch-tagged names (`b<batchId>-…`), after deleting any
    *      partial move of the SAME batch (crash between move and
    *      marker);
    *   4. the marker lands last.
    *
    * Every crash window therefore replays to the same final state —
    * the analogue of the reference's ClickHouse insert dedup
    * (replicated dedup window); Spark readers ignore the `_`/`.`
    * prefixed bookkeeping files. One writer per layout dir (the
    * receiver unions all streams of a signal into one sink), so batch
    * ids never collide. At 100 TB the markers are one empty file per
    * micro-batch and are PERMANENT — [[nextBatchId]] derives the
    * cross-restart id sequence from them, so sweeping one would let a
    * restarted sink reuse its id and silently swallow the first
    * post-restart batches.
    */
  def commitBatch(root: String, batchId: Long)(write: String => Unit): Unit = {
    val rootDir = new java.io.File(root)
    rootDir.mkdirs()
    val marker = new java.io.File(rootDir, s"_committed_$batchId")
    if (marker.exists()) return
    val staging = new java.io.File(rootDir, s".staging_$batchId")
    deleteRecursively(staging)
    write(staging.getPath)
    val tag = s"b$batchId-"
    // the move phase serializes against a concurrent compaction swap
    // of the same layout (see lockFor) — renames only, microseconds
    lockFor(root).synchronized {
      // crash between a previous move and its marker: drop the partial move
      Option(rootDir.listFiles()).foreach(_.foreach { d =>
        if (d.isDirectory && d.getName.startsWith("date="))
          Option(d.listFiles()).foreach(_.foreach { f =>
            if (f.getName.startsWith(tag)) { f.delete(): Unit }
          })
      })
      Option(staging.listFiles()).foreach(_.foreach { d =>
        if (d.isDirectory && d.getName.startsWith("date=")) {
          val target = new java.io.File(rootDir, d.getName)
          target.mkdirs()
          Option(d.listFiles()).foreach(_.foreach { f =>
            if (f.getName.endsWith(".parquet"))
              require(f.renameTo(new java.io.File(target, tag + f.getName)),
                s"commitBatch: cannot move ${f.getPath}")
          })
        }
      })
    }
    deleteRecursively(staging)
    marker.createNewFile(): Unit
  }

  /** The batch id of a `b<id>-`-tagged batch file name — the ONE
    * parser for the tag format [[commitBatch]] writes (the settled()
    * probe and the snapshot-time include predicate must agree on it,
    * or the merge-away data-loss guard silently splits).
    */
  def batchIdOf(name: String): Option[Long] =
    if (name.startsWith("b") && name.contains("-"))
      name.substring(1, name.indexOf('-')).toLongOption
    else None

  /** Batch ids with a `_committed_` marker in this layout root. */
  def committedIds(root: String): Set[Long] =
    Option(new java.io.File(root).listFiles()).getOrElse(Array.empty)
      .flatMap { f =>
        val n = f.getName
        if (n.startsWith("_committed_"))
          n.stripPrefix("_committed_").toLongOption
        else None
      }.toSet

  /** 1 + the largest committed batch id across `roots` — the restart
    * continuation point for a sink whose SOURCE cannot resume a
    * checkpoint (the receiver's in-memory streams die with the
    * process): a fresh checkpoint restarts foreachBatch ids at 0, and
    * without the base the old `_committed_0` marker would
    * short-circuit the first post-restart batch into silence. Max over
    * the raw layout AND its sidecar — a crash window can leave them
    * one id apart.
    */
  def nextBatchId(roots: Seq[String]): Long =
    roots.flatMap(committedIds).maxOption.map(_ + 1L).getOrElse(0L)

  /** Rows of ONE committed micro-batch, read back from its
    * batch-tagged files ([[commitBatch]] names them `b<id>-…`). None
    * when the batch committed zero rows (marker without files). Used
    * by sidecar maintenance to replay a crash window from the STORED
    * truth instead of a re-derived batch (see pointsSink).
    */
  def readBatch(spark: SparkSession, root: String,
      batchId: Long): Option[DataFrame] = {
    val files = Option(new java.io.File(root).listFiles())
      .getOrElse(Array.empty[java.io.File])
      .filter(d => d.isDirectory && d.getName.startsWith("date="))
      .flatMap(d => Option(d.listFiles()).getOrElse(Array.empty[java.io.File]))
      .filter(_.getName.startsWith(s"b$batchId-"))
      .map(_.getPath)
    if (files.isEmpty) None
    else Some(spark.read.parquet(files.toIndexedSeq: _*))
  }

  /** Compaction — the MergeTree background-merge analogue (the
    * reference gets this from ClickHouse for free; a parquet layout
    * has to run it as a maintenance job). Streaming ingest appends one
    * file set per micro-batch, so a day partition accumulates many
    * small files: scan parallelism degrades to file-open overhead and
    * row-group min/max pruning loses power because each tiny file
    * spans the whole key range. Compact rewrites ONE date partition
    * into ceil(bytes/target) files, range-partitioned and re-sorted on
    * the table's ORDER BY — so row-group stats become tight key ranges
    * again — then atomically swaps the directory. Run per partition
    * (days are independent) off the write path, exactly like MergeTree
    * merges.
    */
  def compactPartition(spark: SparkSession, root: String, date: String,
      sortCols: Seq[String], targetFileBytes: Long = 128L * 1024 * 1024,
      transform: DataFrame => DataFrame = identity,
      writeOptions: Map[String, String] = Map.empty,
      include: String => Boolean = _ => true): Int = {
    val dir = new java.io.File(root, s"date=$date")
    require(dir.isDirectory, s"no partition at $dir")
    // EXPLICIT input snapshot: the merge reads exactly these files, so
    // the swap below can tell a concurrently committed batch file (not
    // in the snapshot — carried over) from a superseded one (deleted).
    // `include` evaluates settledness AT SNAPSHOT TIME — a caller-side
    // check-then-act (maintainStorage's settled() probe, then this
    // listing) would let a batch committed IN BETWEEN be merged away
    // while its sidecar commit is still pending; excluded files stay
    // out of the merge and the swap carries them over untouched.
    val srcFiles = Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.endsWith(".parquet") && include(f.getName))
    if (srcFiles.isEmpty) return 0
    val snapshot = srcFiles.map(_.getName).toSet
    val bytes = srcFiles.map(_.length()).sum
    val n = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
    val src = spark.read.parquet(srcFiles.map(_.getPath).toIndexedSeq: _*)
    val merged = transform(src)
    // SCHEMA-PRESERVING by construction: a pre-merge transform can
    // silently widen types (sum over decimal(28,4) yields decimal(38,4))
    // and a widened compacted file would then clash with the next batch
    // appended into the same partition (parquet readers refuse
    // mixed-precision decimal across files). Cast every column back to
    // the stored type — lossless here: merged stats stay within the
    // sidecar's declared precision.
    val df = merged.select(src.schema.fields.map(f =>
      col(f.name).cast(f.dataType).as(f.name)).toIndexedSeq: _*)
    val tmp = new java.io.File(root, s".compact.date=$date")
    val keys = sortCols.map(col)
    df.repartitionByRange(n, keys: _*)
      .sortWithinPartitions(keys: _*)
      .write.mode("overwrite").options(writeOptions).parquet(tmp.getPath)
    // the merged-input MANIFEST travels with the compacted output
    // (readers ignore the _-prefixed file): after the swap it tells
    // the carry-over — and, after a crash mid-carry-over, the
    // recovery sweep — which files in the superseded dir were merged
    // inputs (safe to destroy) vs late-committed batches (must move
    // into the new partition, or their data dies while their
    // exactly-once marker survives)
    java.nio.file.Files.write(
      new java.io.File(tmp, SnapshotManifest).toPath,
      snapshot.toSeq.sorted.mkString("\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // Crash-safe swap order: move the LIVE dir aside first, then move
    // the compacted tmp into place, and only then destroy the old
    // data. Each rename is verified before the previous state is
    // touched — a crash or rename failure at any point leaves either
    // the old or the new partition fully present, never neither (the
    // brief live-dir-absent window between the renames is rolled back
    // by [[recoverCompactionLeftovers]]).
    // The swap holds the layout lock (renames only): a concurrent
    // commitBatch move can land fully before it (the batch's files are
    // then in `old`, NOT in the merge snapshot — carried into the new
    // partition by settleAside) or fully after (they land in the new
    // dir), but never interleave into the superseded dir's destruction.
    lockFor(root).synchronized {
      val old = new java.io.File(root, s".old.date=$date")
      // leftover from a prior crash: resolve it manifest-aware, never
      // blind-delete (it may hold late-committed batches)
      if (old.exists()) settleAside(root, old)
      require(dir.renameTo(old), s"compaction: cannot move live $dir aside")
      if (!tmp.renameTo(dir)) {
        // roll back: restore the live partition before failing
        require(old.renameTo(dir), s"compaction rollback failed for $dir")
        epochOf(root).incrementAndGet()
        throw new IllegalStateException(s"compaction swap failed for $dir")
      }
      settleAside(root, old)
      // readers double-checking via openConsistent re-list if their
      // open overlapped this swap
      epochOf(root).incrementAndGet()
    }
    n
  }

  private val SnapshotManifest = "_merged_inputs"

  /** Finishes a completed swap: carries every parquet file in the
    * superseded `aside` dir that was NOT a merged input (per the live
    * partition's [[SnapshotManifest]]) into the live partition, then
    * destroys the aside copy and the manifest. Idempotent — a crash at
    * any point replays here (via [[recoverCompactionLeftovers]]) to
    * the same final state. Caller holds the root lock.
    */
  private def settleAside(root: String, aside: java.io.File): Unit = {
    val live = new java.io.File(root, aside.getName.stripPrefix(".old."))
    val manifestFile = new java.io.File(live, SnapshotManifest)
    // no manifest next to a completed swap is unreachable under this
    // protocol (the manifest is deleted only after the aside dir);
    // treat it as "everything was merged" — the pre-manifest behavior
    val merged: Set[String] =
      if (manifestFile.isFile)
        new String(java.nio.file.Files.readAllBytes(manifestFile.toPath),
          java.nio.charset.StandardCharsets.UTF_8)
          .split("\n").filter(_.nonEmpty).toSet
      else Set.empty
    Option(aside.listFiles()).foreach(_.foreach { f =>
      val late = f.getName.endsWith(".parquet") &&
        manifestFile.isFile && !merged.contains(f.getName)
      if (late && !new java.io.File(live, f.getName).exists())
        require(f.renameTo(new java.io.File(live, f.getName)),
          s"compaction: cannot carry late-committed ${f.getPath}")
    })
    deleteRecursively(aside)
    manifestFile.delete(): Unit
  }

  /** Policy-applying compaction of ONE metric-points date partition —
    * the reference's age-tiered storage policy applied at merge
    * (cmd/oteldb/storage_policy.go:21-68): partitions older than a
    * downsample tier's threshold rewrite to one representative per
    * (series, interval bucket); older-than-precision-tier values keep
    * only the tier's mantissa bits; fully-cold partitions recompress
    * with high-level Zstandard. The same crash-safe swap as plain
    * compaction; query code reads the rewritten partition with no
    * changes (schema is preserved). Run per partition off the write
    * path — days age independently, so each day crosses each tier
    * threshold exactly once and is rewritten at most once per tier.
    */
  def compactPointsPartition(spark: SparkSession, root: String,
      date: String, nowDate: String, policy: StoragePolicy.Policy,
      targetFileBytes: Long = 128L * 1024 * 1024,
      include: String => Boolean = _ => true): Int = {
    val age = StoragePolicy.ageDays(date, nowDate)
    compactPartition(spark, root, date, Seq("name", "ts_us"),
      targetFileBytes,
      transform = StoragePolicy.pointsTransform(policy, age),
      writeOptions = StoragePolicy.writeOptions(policy, age),
      include = include)
  }

  /** Policy-applying compaction of ONE logs date partition: the
    * reference's storage policy recompresses/retains ALL signals but
    * downsamples only metrics (cmd/oteldb/storage_policy.go:21-68) —
    * so a cold log partition gets the high-level zstd rewrite and the
    * ORDER-BY restore, nothing lossy. Bloom filters on trace_id are
    * re-declared so the rewrite keeps the TraceByID lookup path.
    */
  def compactLogsPartition(spark: SparkSession, root: String,
      date: String, nowDate: String, policy: StoragePolicy.Policy,
      targetFileBytes: Long = 128L * 1024 * 1024,
      include: String => Boolean = _ => true): Int = {
    val age = StoragePolicy.ageDays(date, nowDate)
    compactPartition(spark, root, date,
      Seq("severity_number", "service_name", "ts_ns"), targetFileBytes,
      writeOptions = StoragePolicy.writeOptions(policy, age) +
        ("parquet.bloom.filter.enabled#trace_id" -> "true"),
      include = include)
  }

  /** Policy-applying compaction of ONE spans date partition — same
    * recompress-only shape as [[compactLogsPartition]] (the stored
    * `parent_path` ancestry column survives untouched).
    */
  def compactSpansPartition(spark: SparkSession, root: String,
      date: String, nowDate: String, policy: StoragePolicy.Policy,
      targetFileBytes: Long = 128L * 1024 * 1024,
      include: String => Boolean = _ => true): Int = {
    val age = StoragePolicy.ageDays(date, nowDate)
    compactPartition(spark, root, date, Seq("name", "start_ns"),
      targetFileBytes,
      writeOptions = StoragePolicy.writeOptions(policy, age) +
        ("parquet.bloom.filter.enabled#trace_id" -> "true"),
      include = include)
  }

  /** Pre-merging compaction of ONE AttrCube date partition: streaming
    * ingest appends one additive partial row-set per micro-batch
    * (spansSink), so a cold day holds batches × vocabulary rows and
    * compare()'s read-time sum(n) merge grows with BATCH COUNT, not
    * vocabulary. Compacting groups the partials down to one row per
    * (bucket × dims × attr × value) — counts are additive, so the
    * merged row set is READ-EQUIVALENT to the partials by construction
    * (the reader's own sum(n) is the same fold) — and restores the
    * ORDER-BY layout. Same crash-safe swap, same per-partition
    * independence as the raw layouts; run on COLD partitions only (the
    * live writer appends batch-tagged files the swap would race).
    */
  def compactCubePartition(spark: SparkSession, root: String, date: String,
      targetFileBytes: Long = 128L * 1024 * 1024,
      include: String => Boolean = _ => true): Int =
    compactPartition(spark, root, date,
      Seq("attr", "attr_value", "bucket_ns"), targetFileBytes,
      include = include,
      transform = { df =>
        val keys = df.columns.filterNot(_ == "n")
        df.groupBy(keys.map(col).toIndexedSeq: _*)
          .agg(sum(col("n")).as("n"))
          .select(df.columns.map(col).toIndexedSeq: _*)
      })

  /** Pre-merging compaction of ONE rollup-sidecar date partition —
    * the same batches×vocabulary growth as the cube, merged with the
    * tier stats' own lossless fold ([[RollupTiers.mergeAggs]]: counts
    * and decimal-exact sums add, min/max combine), so a tier read off
    * the compacted partition is bit-equal to one off the partials. One
    * row per (series, hour) afterwards; labels rebuild exactly from
    * the canonical series_key (no map-typed aggregate, so the merge
    * stays hash-aggregable).
    */
  def compactRollupPartition(spark: SparkSession, root: String,
      date: String, targetFileBytes: Long = 128L * 1024 * 1024,
      include: String => Boolean = _ => true): Int =
    compactPartition(spark, root, date,
      Seq("name", "series_key", "hour_start"), targetFileBytes,
      include = include,
      transform = { df =>
        val aggs = RollupTiers.mergeAggs
        df.groupBy(col("hour_start"), col("name"), col("series_key"))
          .agg(aggs.head, aggs.tail: _*)
          .withColumn("sum_v", col("sum_dec").cast("double"))
          .withColumn("labels", graft.logql.VectorMatching
            .labelsOfStreamKey(col("series_key")))
          .select(df.columns.map(col).toIndexedSeq: _*)
      })

  /** One-time repair of NaN-POISONED rollup partials in ONE date
    * partition (ADVICE r14 #4 residue, r16 verdict #3): partials
    * written BEFORE the sidecar writer's stale-NaN filter
    * (Streams.hourlyStatPartials) carry NaN through min_v/max_v/sum_v
    * (and an over-counted n), and NaN propagates through every later
    * merge — compaction cannot heal them. This sweep detects exactly
    * those (hour, series) buckets and REBUILDS them from the raw
    * points layout with the current (filtering) partial computation;
    * clean buckets are carried through the merge untouched, so a
    * tier read off the repaired partition is bit-equal to one off
    * clean-from-birth partials.
    *
    * Returns 0 without touching the partition when it holds no poison
    * (the detection scan is one bounded aggregate over the
    * vocabulary×hours-scale sidecar) — the idempotence contract: a
    * second run is a metadata-only no-op.
    *
    * Rebuild source is what raw CURRENTLY holds: a bucket whose raw
    * points were TTL-dropped rebuilds to nothing (the poisoned row is
    * dropped — correct: tier readers then cover the window from raw,
    * which is also gone) and a downsampled bucket rebuilds from the
    * downsampled samples (the same answers raw-path queries give).
    * Scale note: this is an OPT-IN maintenance action — the raw read
    * is bounded by a ts_us pushdown to the poisoned hour span, not a
    * full-layout scan.
    */
  def repairRollupNaNPartition(spark: SparkSession, root: String,
      pointsRoot: String, date: String,
      include: String => Boolean = _ => true): Int = {
    val dir = new java.io.File(root, s"date=$date")
    if (!dir.isDirectory) return 0
    // NULL sum_dec is poison too: the pre-fix decimal cast of an
    // all-NaN bucket yields NULL under non-ANSI accumulation
    val poison = isnan(col("sum_v")) || isnan(col("min_v")) ||
      isnan(col("max_v")) || col("sum_dec").isNull
    // the probe reads the SAME include-filtered file set the rewrite
    // merges — probing the whole partition would report poison in an
    // unsettled/orphan file as "repaired" while the carry-over keeps
    // serving it, and every later run would re-detect it and rewrite
    // the partition again (breaking the idempotence contract)
    val probeFiles = Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.endsWith(".parquet") && include(f.getName))
    if (probeFiles.isEmpty) return 0
    val probe = spark.read
      .parquet(probeFiles.map(_.getPath).toIndexedSeq: _*).filter(poison)
      .select(unix_micros(col("hour_start")).as("h"))
      .agg(min(col("h")), max(col("h"))).head()
    if (probe.isNullAt(0)) return 0 // no poison: metadata-only re-run
    val HourUs = 3600000000L
    val (loUs, hiUs) = (probe.getLong(0), probe.getLong(1) + HourUs)
    compactPartition(spark, root, date,
      Seq("name", "series_key", "hour_start"),
      include = include,
      transform = { df =>
        // merge partials to one row per bucket first: poison in ANY
        // partial of a bucket poisons the merged row, so detection
        // must run on the merged view (same fold as compaction)
        val aggs = RollupTiers.mergeAggs
        val merged = df
          .groupBy(col("hour_start"), col("name"), col("series_key"))
          .agg(aggs.head, aggs.tail: _*)
          .withColumn("sum_v", col("sum_dec").cast("double"))
          .withColumn("labels", graft.logql.VectorMatching
            .labelsOfStreamKey(col("series_key")))
        val badKeys = merged.filter(poison)
          .select(col("hour_start"), col("name"), col("series_key"))
        // left-open (s, s+1h] buckets: the raw span is (lo, hi] — the
        // filter lands on the parquet scan as a pushed predicate. A
        // raw layout dropped whole (TTL horizon past the sidecar's)
        // rebuilds every poisoned bucket to nothing.
        val rebuilt =
          if (!hasDatePartitions(pointsRoot)) merged.limit(0)
          else graft.streaming.Streams.hourlyStatPartials(
            spark.read.parquet(pointsRoot)
              .filter(col("ts_us") > loUs && col("ts_us") <= hiUs)
              .select(col("ts_us"), col("name"), col("labels"),
                col("value")))
            .join(badKeys, Seq("hour_start", "name", "series_key"),
              "left_semi")
        merged.filter(!poison)
          .unionByName(rebuilt)
          .select(df.columns.map(col).toIndexedSeq: _*)
      })
  }

  /** Pre-merging compaction of ONE log-volume-sidecar date partition —
    * same shape as [[compactRollupPartition]] over the (stream, hour)
    * integral count/bytes stats.
    */
  def compactLogVolumePartition(spark: SparkSession, root: String,
      date: String, targetFileBytes: Long = 128L * 1024 * 1024,
      include: String => Boolean = _ => true): Int =
    compactPartition(spark, root, date,
      Seq("series_key", "hour_start"), targetFileBytes,
      include = include,
      transform = { df =>
        df.groupBy(col("hour_start"), col("series_key"))
          .agg(sum(col("n")).as("n"), sum(col("bytes")).as("bytes"))
          .withColumn("labels", graft.logql.VectorMatching
            .labelsOfStreamKey(col("series_key")))
          .select(df.columns.map(col).toIndexedSeq: _*)
      })

  /** Crash-recovery sweep for INTERRUPTED compactions. The swap order
    * in [[compactPartition]] is crash-safe for data (every state keeps
    * one complete copy) but a crash between "live dir moved aside" and
    * "tmp moved in" leaves the partition ABSENT from the layout — the
    * rows sit intact under `.old.date=X`, which nothing else ever
    * restores (maintenance lists only `date=` dirs). Roll BACK to the
    * pre-compaction state (the tmp may be half-written; compaction
    * simply re-runs on a later pass) and sweep stale tmp dirs.
    * Idempotent; [[graft.sources.OtlpReceiver.maintainStorage]] runs it
    * at the top of every pass.
    */
  def recoverCompactionLeftovers(root: String): Seq[String] = {
    val rootDir = new java.io.File(root)
    val entries = Option(rootDir.listFiles()).getOrElse(Array.empty)
    val msgs = Seq.newBuilder[String]
    entries.filter(f => f.isDirectory && f.getName.startsWith(".old.date="))
      .foreach { old =>
        val live = new java.io.File(root, old.getName.stripPrefix(".old."))
        lockFor(root).synchronized {
          if (live.exists()) {
            // the swap completed before the crash, but the carry-over
            // may not have: settle manifest-aware — late-committed
            // batch files move into the live partition, merged inputs
            // are destroyed (a blind delete here would silently lose a
            // backfill batch whose exactly-once marker survives)
            settleAside(root, old)
            epochOf(root).incrementAndGet()
            msgs += s"settled superseded ${old.getName}"
          } else {
            require(old.renameTo(live),
              s"recovery: cannot restore ${old.getPath}")
            epochOf(root).incrementAndGet()
            msgs += s"restored ${live.getName} from interrupted compaction"
          }
        }
      }
    entries.filter(f => f.isDirectory && f.getName.startsWith(".compact.date="))
      .foreach { tmp =>
        deleteRecursively(tmp)
        msgs += s"swept stale ${tmp.getName}"
      }
    // a crash between the aside-dir destruction and the manifest delete
    // leaves a manifest with nothing to settle: sweep it
    entries.filter(f => f.isDirectory && f.getName.startsWith("date="))
      .foreach { d =>
        val m = new java.io.File(d, SnapshotManifest)
        if (m.isFile &&
            !new java.io.File(root, s".old.${d.getName}").exists()) {
          m.delete(): Unit
          msgs += s"swept stale manifest in ${d.getName}"
        }
      }
    msgs.result()
  }

  /** TTL expiry — the `TTL timestamp + INTERVAL n DAY` clause of the
    * reference DDL (chstorage golden schema), expressed as partition
    * drops: a date partition strictly older than the horizon is
    * removed whole, never row-by-row — O(partitions) metadata work
    * regardless of data size. Returns the dropped partition names.
    */
  def enforceTtl(root: String, keepDays: Int, nowDate: String): Seq[String] = {
    val fmt = java.time.format.DateTimeFormatter.ofPattern("yyyyMMdd")
    val horizon = java.time.LocalDate.parse(nowDate, fmt).minusDays(keepDays.toLong)
    val dirs = Option(new java.io.File(root).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("date="))
    dirs.toSeq.flatMap { d =>
      val date = d.getName.stripPrefix("date=")
      val parsed =
        try Some(java.time.LocalDate.parse(date, fmt)) catch { case _: Exception => None }
      // the drop holds the same per-root lock as the compaction swap
      // and commitBatch's move phase: a cold backfill commit racing a
      // TTL drop could otherwise fail its rename mid-delete or leave a
      // half-deleted partition dir until the next pass
      parsed.filter(_.isBefore(horizon)).map { _ =>
        lockFor(root).synchronized {
          deleteRecursively(d); epochOf(root).incrementAndGet()
        }
        d.getName
      }
    }.sorted
  }
}
