package graft.logql

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Log pattern detection — the `/loki/api/v1/patterns` surface the
  * reference stubs to an empty series set (lokihandler.go:605-610);
  * implemented for real here (parity-plus).
  *
  * Loki mines templates with the Drain clustering tree, a driver-side
  * mutable structure. At 100 TB that shape doesn't distribute — the
  * Spark-first equivalent is a deterministic token-masking PROJECTION
  * (variable tokens — timestamps, IPs, hex ids, durations, numbers —
  * become the `<_>` placeholder) followed by ONE (pattern, bucket)
  * aggregation. Masking is codegen'd regexp work fused into the scan,
  * so the corpus moves exactly once: through the pattern-keyed shuffle
  * whose cardinality is the (small) template set, with map-side
  * partial aggregation doing the heavy counting before the exchange.
  * Determinism also makes the operator value-checkable by the DuckDB
  * oracle — something Drain's insertion-order-sensitive tree can't be.
  */
object PatternMine {

  /** Masking rules, applied in order (composite shapes before the bare
    * number rule that would shred them). Patterns are RE2-safe (the
    * oracle runs them in DuckDB) and Java-regex-safe (Spark codegen).
    */
  val Masks: Seq[String] = Seq(
    // ISO-ish timestamps: 2026-08-14T07:16:09.123Z / 2026-08-14 07:16:09
    "[0-9]{4}-[0-9]{2}-[0-9]{2}[T ][0-9]{2}:[0-9]{2}:[0-9]{2}(\\.[0-9]+)?Z?",
    // IPv4 (with optional :port)
    "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}(:[0-9]+)?\\b",
    // long hex runs: trace/span ids, digests (8+ chars avoids words)
    "\\b[0-9a-f]{8,}\\b",
    // durations: 12ms / 3.5s / 250us
    "\\b[0-9]+(\\.[0-9]+)?(ns|us|ms|s|m|h)\\b",
    // bare numbers last (ints, floats; also digits embedded in tokens
    // like svc-1 — Drain masks those too)
    "[0-9]+(\\.[0-9]+)?"
  )

  private val Placeholder = "<_>"

  /** The template of a log line: every variable token masked. A pure
    * codegen'd expression — fuses into whole-stage codegen on the scan.
    */
  def template(body: Column): Column =
    Masks.foldLeft(body)((c, m) => regexp_replace(c, m, Placeholder))

  /** DuckDB fragment computing the identical template of `expr`
    * (oracle twin of [[template]]; DuckDB needs the explicit 'g').
    */
  def oracleTemplate(expr: String): String =
    Masks.foldLeft(expr)((e, m) =>
      s"regexp_replace($e, '$m', '$Placeholder', 'g')")

  /** Loki's per-pattern detected level: the first recognizable severity
    * token in the line, else "unknown" (pattern ingester behavior).
    */
  def level(body: Column): Column = {
    val lowered = lower(body)
    when(lowered.rlike("\\b(error|err|fatal|panic)\\b"), "error")
      .when(lowered.rlike("\\b(warn|warning)\\b"), "warn")
      .when(lowered.rlike("\\bdebug\\b"), "debug")
      .when(lowered.rlike("\\b(info|information)\\b"), "info")
      .otherwise("unknown")
  }

  /** Mine patterns over a logs frame (`ts_ns`, `body`): per-step
    * occurrence counts for every template, newest-biggest first.
    * One shuffle, keyed (pattern, level, bucket) — template-set-sized,
    * not corpus-sized.
    */
  def mine(logs: DataFrame, stepNs: Long): DataFrame =
    logs
      .select(
        template(col("body")).as("pattern"),
        level(col("body")).as("level"),
        (col("ts_ns") - col("ts_ns") % lit(stepNs)).as("bucket_ns"))
      .groupBy(col("pattern"), col("level"), col("bucket_ns"))
      .agg(count(lit(1)).as("n"))
}
