package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.util.LongAccumulator

/** Excess-log safety handling — the reference's log-flood processor
  * (internal/odbsafety/config.go:10-25, handler.go:105-232,
  * sampler.go:10-23; collector wiring otelcolmod/odbsafetyprocessor/
  * processor.go:58-148): once a stream's rate exceeds a soft (then
  * hard) per-second limit, excess records are handled by a mode —
  * consume / drop / sample (first-N then 1-in-M) / compact
  * (repeated-record collapse with synthetic "N collapsed" records) /
  * truncate (drop all, one synthetic "N suppressed" record per
  * window).
  *
  * This is the deterministic, event-time re-expression of that
  * single-threaded wall-clock handler, so the SAME semantics run as a
  * distributed batch transform (window functions over (key, second))
  * and as a streaming stateful gate ([[Streams.safetyGate]], state
  * keyed by (key, compact-window slot)). Deliberate re-interpretations
  * for determinism + bounded distributed state, each anchored to the
  * reference line it replaces:
  *   - the 1-second rate window counts records by EVENT-TIME second in
  *     (ts, body) order, not wall-clock arrival (processor.go:127-148's
  *     `now().Truncate(time.Second)`);
  *   - the sampler ordinal is the record's position within its flood
  *     window (pos − limit), not a process-lifetime atomic counter
  *     (sampler.go:13-22) — restarts and parallelism can't skew it;
  *   - compact's bucket cap admits the FIRST `maxBuckets` keys per
  *     window (by first-seen time) and applies the sample rule to
  *     records of later keys, instead of LRU eviction + global-counter
  *     sampling (handler.go:161-174) — same bound, order-independent;
  *   - truncate-window metadata attrs carry epoch-ns strings, not
  *     RFC3339Nano (excess.go:60-61).
  *
  * When `keyFields` is empty the rate window is GLOBAL and compact
  * buckets key by body — exactly the reference. Setting `keyFields`
  * scopes BOTH to that key (the distributed deployment shape: one
  * chatty service can't spend another's budget).
  */
object LogSafety {

  /** Attribute keys (reference config.go:24, excess.go:54-67). */
  val PassthroughAttr = "oteldb.passthrough"
  val CollapsedAttr = "oteldb.collapsed_count"
  val TruncatedAttr = "oteldb.truncated_count"
  val WindowStartAttr = "oteldb.window_start"
  val WindowEndAttr = "oteldb.window_end"
  val TruncatedBody = "<output is truncated>"
  val Redacted = "<redacted>"

  /** Reference Config (config.go:28-83) with the same defaults; rates
    * are per event-time second, windows/ts in ns.
    */
  final case class Config(
      softMaxRatePerSecond: Int = 0,
      hardMaxRatePerSecond: Int = 0,
      onExcess: String = "consume",
      hardOnExcess: String = "drop",
      sampleFirst: Int = 100,
      sampleThereafter: Int = 100,
      compactWindowNs: Long = 30000000000L,
      compactThreshold: Int = 100,
      compactMaxBuckets: Int = 10000,
      keyFields: Seq[String] = Nil,
      truncateThreshold: Int = 0,
      redactFields: Seq[String] = Nil) {

    def mode: String = if (onExcess.isEmpty) "consume" else onExcess
    def hardMode: String = if (hardOnExcess.isEmpty) "drop" else hardOnExcess

    /** Mirrors config.go:86-137. */
    def validate(): Unit = {
      require(softMaxRatePerSecond >= 0, s"soft_max_rate_per_second must be non-negative, got $softMaxRatePerSecond")
      require(hardMaxRatePerSecond >= 0, s"hard_max_rate_per_second must be non-negative, got $hardMaxRatePerSecond")
      val valid = Set("consume", "drop", "sample", "compact", "truncate", "")
      require(valid(onExcess), s"on_excess must be one of consume, drop, sample, compact, truncate, got '$onExcess'")
      require(valid(hardOnExcess), s"hard_on_excess must be one of consume, drop, sample, compact, truncate, got '$hardOnExcess'")
      require(sampleFirst >= 0, s"sample_first must be non-negative, got $sampleFirst")
      require(sampleThereafter >= 0, s"sample_thereafter must be non-negative, got $sampleThereafter")
      val m = mode; val h = hardMode
      if (m == "compact" || m == "truncate" || h == "compact" || h == "truncate")
        require(compactWindowNs > 0, s"compact_window must be positive, got $compactWindowNs")
      if (m == "compact" || h == "compact") {
        require(compactThreshold > 0, s"compact_threshold must be positive, got $compactThreshold")
        require(compactMaxBuckets > 0, s"compact_max_buckets must be positive, got $compactMaxBuckets")
        require(truncateThreshold >= 0, s"truncate_threshold must be non-negative, got $truncateThreshold")
      }
    }
  }

  private val SecNs = 1000000000L

  /** Safety records (our own synthetics) bypass handling AND the rate
    * count (processor.go:107-116).
    */
  private def isSafety: Column =
    map_contains_key(col("attrs"), CollapsedAttr) ||
      map_contains_key(col("attrs"), TruncatedAttr)

  /** recordKey (excess.go:80-97): `field=value\n` per field, the
    * literal field name `body` reading the body; empty fields → body.
    */
  private def compactKey(cfg: Config): Column =
    if (cfg.keyFields.isEmpty) col("body")
    else concat(cfg.keyFields.map { f =>
      val v = if (f == "body") col("body")
      else coalesce(element_at(col("attrs"), f), lit(""))
      concat(lit(f + "="), v, lit("\n"))
    }: _*)

  /** Rate-window key: global ("") unless keyFields scope it. */
  private def rateKey(cfg: Config): Column =
    if (cfg.keyFields.isEmpty) lit("") else compactKey(cfg)

  /** RedactFields → "<redacted>" before excess handling
    * (processor.go:118-125).
    */
  private def redact(logs: DataFrame, cfg: Config): DataFrame =
    if (cfg.redactFields.isEmpty) logs
    else logs.withColumn("attrs", transform_values(col("attrs"),
      (k, v) => when(k.isin(cfg.redactFields: _*), lit(Redacted)).otherwise(v)))

  /** The sampler keep rule (sampler.go:13-22) on a 1-based ordinal. */
  private def sampleKeep(o: Column, cfg: Config): Column = {
    val first =
      if (cfg.sampleFirst > 0) o <= cfg.sampleFirst else lit(false)
    val thereafter =
      if (cfg.sampleThereafter > 0) o % cfg.sampleThereafter === 0
      else lit(false)
    first || thereafter
  }

  /** Regime selection over the rate ordinal `__pos` — hard first, then
    * soft (processor.go:139-147). SHARED by [[decide]] and
    * [[decideFused]] so the two batch paths cannot diverge.
    */
  private def regimeMode(cfg: Config): Column = {
    val pos = col("__pos")
    when(lit(cfg.hardMaxRatePerSecond > 0) && pos > cfg.hardMaxRatePerSecond,
      cfg.hardMode)
      .when(lit(cfg.softMaxRatePerSecond > 0) && pos > cfg.softMaxRatePerSecond,
        cfg.mode)
      .otherwise("consume")
  }

  /** The regime's rate threshold (for the 1-based excess ordinal). */
  private def regimeThr(cfg: Config): Column =
    when(lit(cfg.hardMaxRatePerSecond > 0) &&
        col("__pos") > cfg.hardMaxRatePerSecond,
      lit(cfg.hardMaxRatePerSecond))
      .otherwise(lit(cfg.softMaxRatePerSecond))

  /** The per-record decision chain over the routing columns — SHARED
    * by both batch paths (the fused path prepends its safety-record
    * arm; its constant `__krank` = 1 makes the cap arm a no-op there).
    */
  private def decisionExpr(cfg: Config): Column = {
    val co = col("__co")
    when(col("__mode") === "consume", "kept")
      .when(col("__mode") === "drop", "dropped_rate_limit")
      .when(col("__mode") === "sample",
        when(sampleKeep(col("__o"), cfg), "sampled").otherwise("dropped_sample"))
      .when(col("__mode") === "truncate",
        if (cfg.compactWindowNs > 0) lit("dropped_truncate")
        else lit("dropped_rate_limit")) // windowless truncate = drop (handler.go:136-139)
      // compact (handler.go:157-196): over-cap keys take the sample
      // rule on the rate-excess ordinal (the only per-record ordinal
      // that needs no per-key state — the streaming gate matches);
      // under-threshold records pass; past truncateThreshold
      // escalate to the truncate window; the rest collapse
      .otherwise(
        when(col("__krank") > cfg.compactMaxBuckets,
          when(sampleKeep(col("__o"), cfg), "sampled").otherwise("dropped_sample"))
          .when(co < cfg.compactThreshold, "kept")
          .when(lit(cfg.truncateThreshold > 0) && co > cfg.truncateThreshold,
            "dropped_truncate")
          .otherwise("collapsed"))
  }

  /** Per-record decisions: the input records (minus synthetics-to-be)
    * tagged with `__decision` ∈ kept / sampled / dropped_rate_limit /
    * dropped_sample / dropped_truncate / collapsed, plus the routing
    * columns (`__ckey`, `__slot`, `__co`) the synthetic builders need.
    */
  private def decide(rest: DataFrame, cfg: Config): DataFrame = {
    val ordered = Seq(col("ts_ns"), col("body"))
    val wPos = Window.partitionBy(col("__rkey"), col("__sec")).orderBy(ordered: _*)
    // passthrough records count toward the rate but are never shed
    // (handler.go:107)
    val passthrough =
      element_at(col("attrs"), PassthroughAttr) === "true"
    val base = rest
      .withColumn("__rkey", rateKey(cfg))
      .withColumn("__sec", expr("ts_ns div 1000000000"))
      .withColumn("__pos", row_number().over(wPos))
      .withColumn("__mode", when(passthrough, "consume").otherwise(regimeMode(cfg)))
      .withColumn("__o", col("__pos") - regimeThr(cfg)) // 1-based excess ordinal
      .withColumn("__ckey", compactKey(cfg))
      .withColumn("__slot", col("ts_ns") - pmod(col("ts_ns"), lit(cfg.compactWindowNs)))

    // compact routing needs per-(key, slot) ordinals and the per-slot
    // key rank for the bucket cap — windows over the compact subset
    // only, merged back by marking everything else rank/co = null.
    // The whole subtree is SKIPPED statically when no configured mode
    // can ever emit a compact decision (the sample/drop configs were
    // paying its empty stages for nothing).
    val canCompact = cfg.mode == "compact" || cfg.hardMode == "compact"
    val nulled = base
      .withColumn("__co", lit(null).cast("int"))
      .withColumn("__bn", lit(null).cast("long"))
      .withColumn("__krank", lit(null).cast("int"))
    val all = if (!canCompact) nulled else {
      // the bucket cap ranks BODY-keyed buckets within a rate scope
      // (reference shape: global rate window + CompactKeyFields
      // buckets); with keyFields set, rate key == compact key, so
      // every scope holds exactly one bucket — the cap cannot bind and
      // the rank windows are skipped (krank ≡ 1), leaving ONE
      // (key, slot) exchange for the compact subset — matching the
      // streaming gate, whose state is keyed by (rate key, slot)
      val bucket = Seq(
        if (cfg.keyFields.isEmpty) col("__ckey") else col("__rkey"),
        col("__slot"))
      val wCo = Window.partitionBy(bucket: _*).orderBy(ordered: _*)
      val wB = Window.partitionBy(bucket: _*)
      val compacts0 = base.filter(col("__mode") === "compact")
        .withColumn("__co", row_number().over(wCo))
        // bucket size: collapsed ordinals are dense, so the synthetic
        // builders derive their counts from this — no groupBy, no join
        .withColumn("__bn", count(lit(1)).over(wB))
      val compacts =
        if (cfg.keyFields.nonEmpty) compacts0.withColumn("__krank", lit(1))
        else {
          val wKeyFirst = Window.partitionBy(col("__ckey"), col("__slot"))
          val wKeyRank = Window.partitionBy(col("__rkey"), col("__slot"))
            .orderBy(col("__kfirst"), col("__ckey"))
          compacts0
            .withColumn("__kfirst", min(col("ts_ns")).over(wKeyFirst))
            .withColumn("__krank", dense_rank().over(wKeyRank))
            .drop("__kfirst")
        }
      nulled.filter(col("__mode") =!= "compact").unionByName(compacts)
    }
    all.withColumn("__decision", decisionExpr(cfg))
  }

  private def aux = Seq("__safety", "__rkey", "__sec", "__pos", "__mode",
    "__o", "__ckey", "__slot", "__co", "__bn", "__krank", "__decision")

  /** The KEYED fast path: one pipeline over ALL records (safety rows
    * included), no subset/union splits. Ordinals that must count only
    * a subset (rate position skips safety records; compact ordinals
    * count compact-mode rows) become conditional running counts over
    * the same two window partitions — scan once, exchange on
    * (key, second), exchange on (key, slot), done. Only valid with
    * keyFields set (rate key == compact key, so the bucket cap cannot
    * bind and bucket ranking disappears); the global configuration
    * keeps [[decide]]'s subset windows, whose body-keyed bucket rank
    * has no conditional form.
    */
  private def decideFused(logs: DataFrame, cfg: Config): DataFrame = {
    require(cfg.keyFields.nonEmpty, "fused path requires keyFields")
    val ordered = Seq(col("ts_ns"), col("body"))
    // ROWS frames: (ts, body) ties must get distinct ordinals like
    // row_number, not shared peer values from the default RANGE frame
    val wPos = Window.partitionBy(col("__rkey"), col("__sec"))
      .orderBy(ordered: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wCo = Window.partitionBy(col("__rkey"), col("__slot"))
      .orderBy(ordered: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wB = Window.partitionBy(col("__rkey"), col("__slot"))
    val passthrough = element_at(col("attrs"), PassthroughAttr) === "true"
    val redacted =
      if (cfg.redactFields.isEmpty) col("attrs")
      else when(col("__safety"), col("attrs"))
        .otherwise(transform_values(col("attrs"),
          (k, v) => when(k.isin(cfg.redactFields: _*), lit(Redacted))
            .otherwise(v)))
    val base = logs
      .withColumn("__safety", isSafety)
      .withColumn("attrs", redacted)
      .withColumn("__rkey", rateKey(cfg))
      .withColumn("__sec", expr("ts_ns div 1000000000"))
      // safety records bypass the rate count (processor.go:107-116)
      .withColumn("__pos",
        sum(when(!col("__safety"), 1L).otherwise(0L)).over(wPos))
      .withColumn("__mode",
        when(col("__safety") || passthrough, "consume")
          .otherwise(regimeMode(cfg)))
      .withColumn("__o", col("__pos") - regimeThr(cfg))
      .withColumn("__ckey", compactKey(cfg))
      .withColumn("__slot",
        col("ts_ns") - pmod(col("ts_ns"), lit(cfg.compactWindowNs)))
      // keyed scope ⇒ one bucket per scope; the cap never binds
      .withColumn("__krank", lit(1))
    // the compact ordinal windows run only when a configured mode can
    // emit compact decisions — same static skip as decide()'s subtree
    val withCo =
      if (cfg.mode == "compact" || cfg.hardMode == "compact") {
        val compactRow = when(col("__mode") === "compact", 1L).otherwise(0L)
        base
          .withColumn("__co", sum(compactRow).over(wCo))
          .withColumn("__bn", sum(compactRow).over(wB))
      } else base
        .withColumn("__co", lit(null).cast("long"))
        .withColumn("__bn", lit(null).cast("long"))
    withCo.withColumn("__decision",
      when(col("__safety"), "kept").otherwise(decisionExpr(cfg)))
  }

  /** Synthetic "N collapsed" records: one per compact bucket that
    * dropped anything, cloning the bucket's FIRST record
    * (handler.go:219-224, excess.go:64-68). Collapsed ordinals are
    * dense in [threshold, min(bn, truncateThreshold)] within a bucket,
    * so the count derives from the bucket SIZE already windowed in at
    * decision time — a pure filter+projection over the checkpointed
    * decision frame, no re-aggregation, no join.
    */
  private def compactSynthetics(decided: DataFrame, cfg: Config): DataFrame = {
    val capped =
      if (cfg.truncateThreshold > 0)
        least(col("__bn"), lit(cfg.truncateThreshold.toLong))
      else col("__bn")
    decided
      .filter(col("__mode") === "compact" && col("__co") === 1 &&
        col("__krank") <= cfg.compactMaxBuckets)
      .withColumn("__n", capped - (cfg.compactThreshold - 1))
      .filter(col("__n") > 0)
      .withColumn("attrs", map_concat(col("attrs"),
        map(lit(CollapsedAttr), col("__n").cast("string"))))
      .drop("__n").drop(aux: _*)
  }

  /** Synthetic truncation records: one per truncate window slot,
    * cloning the slot's first record with the body replaced and the
    * window bounds attached (handler.go:199-211, excess.go:54-62).
    */
  private def truncateSynthetics(decided: DataFrame, cfg: Config): DataFrame = {
    // statically impossible truncation (no truncate mode, no compact
    // escalation threshold) → a provably-empty arm the optimizer
    // prunes from the union, instead of live window stages over an
    // always-empty subset
    val canTruncate = cfg.mode == "truncate" || cfg.hardMode == "truncate" ||
      cfg.truncateThreshold > 0
    if (cfg.compactWindowNs <= 0 || !canTruncate)
      return decided.filter(lit(false)).drop(aux: _*)
    // one synthetic per (rate key, slot) — keyed configs scope the
    // truncation window like everything else (and like the streaming
    // gate's state key); the global key makes this per-slot
    val truncs = decided.filter(col("__decision") === "dropped_truncate")
    val wSlot = Window.partitionBy(col("__rkey"), col("__slot"))
      .orderBy(col("ts_ns"), col("body"))
    truncs
      .withColumn("__n", count(lit(1))
        .over(Window.partitionBy(col("__rkey"), col("__slot"))))
      .withColumn("__rn", row_number().over(wSlot))
      .filter(col("__rn") === 1)
      .withColumn("body", lit(TruncatedBody))
      // a record carrying ONLY window_start/_end attrs is not a safety
      // record (no count key) and would collide in map_concat — the
      // synthetic's values win, as in the reference's PutStr overwrite
      .withColumn("attrs", map_concat(
        map_filter(col("attrs"),
          (k, _) => !k.isin(TruncatedAttr, WindowStartAttr, WindowEndAttr)),
        map(
          lit(TruncatedAttr), col("__n").cast("string"),
          lit(WindowStartAttr), col("__slot").cast("string"),
          lit(WindowEndAttr), (col("__slot") + cfg.compactWindowNs).cast("string"))))
      .drop("__n", "__rn").drop(aux: _*)
  }

  /** The batch transform: input log records (`ts_ns`, `body`, `attrs`
    * + any extra columns, preserved) → surviving records + synthetic
    * compact/truncate records. The ONE required shuffle is the
    * (key, second) rate ranking; compact/truncate add windows keyed by
    * (key, window slot) over the already-shed excess subset only.
    */
  /** Decision frame for any config: the fused single-pipeline path
    * when keyFields scope the windows, the subset/union path for the
    * global configuration (whose body-keyed bucket rank has no
    * conditional form). Safety records ride the fused frame with
    * decision "kept"; on the global path they are split off by the
    * caller.
    */
  private def decideAny(logs: DataFrame, cfg: Config): DataFrame =
    if (cfg.keyFields.nonEmpty) decideFused(logs, cfg)
    else decide(redact(logs.filter(!isSafety), cfg), cfg)

  def apply(logs: DataFrame, cfg: Config): DataFrame = {
    cfg.validate()
    // processor.go:59-61: nothing configured → pass through untouched
    if (cfg.redactFields.isEmpty && cfg.softMaxRatePerSecond <= 0 &&
      cfg.hardMaxRatePerSecond <= 0) return logs
    if (cfg.softMaxRatePerSecond <= 0 && cfg.hardMaxRatePerSecond <= 0)
      return logs.filter(isSafety)
        .unionByName(redact(logs.filter(!isSafety), cfg))
    // one micro-batch-sized materialization point: the kept rows and
    // BOTH synthetic builders read the decision frame, and without it
    // each branch re-runs the scan + rank windows (3× the stages for
    // zero extra information — the reference's handler holds the batch
    // in memory at exactly this point)
    val decided = decideAny(logs, cfg).localCheckpoint(false)
    val kept = decided
      .filter(col("__decision").isin("kept", "sampled"))
      .drop(aux: _*)
    val base =
      if (cfg.keyFields.nonEmpty) kept // safety rows already inside
      else logs.filter(isSafety).unionByName(kept)
    base
      .unionByName(compactSynthetics(decided, cfg))
      .unionByName(truncateSynthetics(decided, cfg))
  }

  /** Decision counts — the reference's Metrics interface
    * (handler.go:10-15: Dropped(reason)/Sampled/Compacted/Collapsed)
    * as a one-aggregate frame: (decision, n).
    */
  def decisions(logs: DataFrame, cfg: Config): DataFrame = {
    cfg.validate()
    val decided = decideAny(logs, cfg).localCheckpoint(false)
    val perRecord = decided.filter(col("__decision") =!= "kept")
      .groupBy(col("__decision").as("decision"))
      .agg(count(lit(1)).as("n"))
    val compacted = compactSynthetics(decided, cfg)
      .agg(count(lit(1)).as("n"))
      .select(lit("compacted").as("decision"), col("n"))
      .filter(col("n") > 0)
    perRecord.unionByName(compacted)
  }

  /** Accumulator-backed counters for the streaming gate — the
    * distributed stand-in for the reference's in-process Metrics
    * (otelcolmod/odbsafetyprocessor/metrics.go): state functions add
    * on executors, the driver (admin API) reads totals.
    */
  final class Metrics(sc: org.apache.spark.SparkContext) extends Serializable {
    val droppedRateLimit: LongAccumulator = sc.longAccumulator("graft.safety.dropped_rate_limit")
    val droppedSample: LongAccumulator = sc.longAccumulator("graft.safety.dropped_sample")
    val droppedTruncate: LongAccumulator = sc.longAccumulator("graft.safety.dropped_truncate")
    val droppedLate: LongAccumulator = sc.longAccumulator("graft.safety.dropped_late")
    val sampled: LongAccumulator = sc.longAccumulator("graft.safety.sampled")
    val collapsed: LongAccumulator = sc.longAccumulator("graft.safety.collapsed")
    val compacted: LongAccumulator = sc.longAccumulator("graft.safety.compacted")
    def snapshot: Map[String, Long] = Map(
      "dropped_rate_limit" -> droppedRateLimit.value,
      "dropped_sample" -> droppedSample.value,
      "dropped_truncate" -> droppedTruncate.value,
      "dropped_late" -> droppedLate.value,
      "sampled" -> sampled.value,
      "collapsed" -> collapsed.value,
      "compacted" -> compacted.value)
  }
}
