package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable rollup-stat tiers — ONE maintenance path shared by the
  * streaming hourly sidecar
  * ([[graft.streaming.Streams.hourlyStatPartials]], appended per
  * micro-batch by `pointsSink(rollupPath=)`)
  * and coarser batch tiers chained at the compaction seam next to the
  * [[StoragePolicy]] downsample bands (reference embedded-backend
  * aggregate sidecar, docs/storage-integration.md:30-47; age-tier
  * semantics storage_policy.go:49-59).
  *
  * Every tier row carries the same four LOSSLESS mergeable stats
  * (count, decimal-exact sum, min, max), so a coarser tier
  * re-aggregates EXACTLY from a finer one — raw → 1h → 6h → 1d is one
  * chain of [[reRollup]] calls, never a second scan of raw samples —
  * and any `count/sum/min/max/avg_over_time` window that a tier's
  * interval tiles exactly is answered from that tier alone.
  *
  * Read-side planning: [[select]] picks the COARSEST maintained tier
  * that (a) can serve the aggregation losslessly and (b) exactly tiles
  * the query window; the query then touches `window/interval` rows per
  * series instead of raw samples (24 rows for a day over the hourly
  * tier, 4 over the 6-hourly). At 100 TB this is the difference
  * between a metadata-sized scan and decoding a day of samples.
  */
object RollupTiers {

  /** Aggregations the stats tiers serve losslessly (`avg` = sum/n). */
  val Serves: Set[String] = Set("count", "sum", "min", "max", "avg")

  /** The per-bucket stat columns over a raw value column. Decimal
    * accumulation keeps the stored sum exact (the determinism
    * playbook, [[graft.queries.Det]]): re-aggregating tier sums in a
    * different order than raw samples must not drift.
    */
  def statAggs(value: Column): Seq[Column] = Seq(
    count(lit(1)).as("n"),
    sum(value.cast("decimal(18,4)")).as("sum_dec"),
    min(value).as("min_v"),
    max(value).as("max_v"))

  /** Exact re-aggregation of stat rows into a coarser bucket. */
  def mergeAggs: Seq[Column] = Seq(
    sum(col("n")).as("n"),
    sum(col("sum_dec")).as("sum_dec"),
    min(col("min_v")).as("min_v"),
    max(col("max_v")).as("max_v"))

  /** Raw samples → stat rows, one per (keys, `intervalNs` bucket);
    * bucket timestamps are bucket starts (aligned grids re-aggregate
    * exactly; row-group stats stay tight).
    */
  def rollup(df: DataFrame, keys: Seq[String], tsCol: String,
      valueCol: String, intervalNs: Long): DataFrame = {
    require(intervalNs > 0, "rollup: interval must be positive")
    val bucket = (col(tsCol) - col(tsCol) % intervalNs).as(tsCol)
    val aggs = statAggs(col(valueCol))
    df.groupBy(keys.map(col) :+ bucket: _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Finer stat tier → coarser stat tier (same stat schema), the
    * chained maintenance step: the 6h tier is built from the 1h tier's
    * rows, never from raw samples.
    */
  def reRollup(tier: DataFrame, keys: Seq[String], tsCol: String,
      intervalNs: Long): DataFrame = {
    require(intervalNs > 0, "reRollup: interval must be positive")
    val bucket = (col(tsCol) - col(tsCol) % intervalNs).as(tsCol)
    val aggs = mergeAggs
    tier.groupBy(keys.map(col) :+ bucket: _*).agg(aggs.head, aggs.tail: _*)
  }

  /** The coarsest maintained tier that answers `agg` over a window of
    * `windowNs` losslessly: the tier must serve the aggregation and
    * its interval must exactly tile the window. None ⇒ read raw
    * samples (e.g. a 90-minute window over {1h, 6h} tiers, or a
    * quantile, which no mergeable-stat tier can serve).
    */
  def select(tiersNs: Seq[Long], windowNs: Long,
      agg: String): Option[Long] =
    if (!Serves.contains(agg)) None
    else tiersNs.filter(t => t > 0 && t <= windowNs && windowNs % t == 0)
      .maxOption

  /** The served `agg_over_time` value as an AGGREGATE over stat rows —
    * the single home of the count/sum/min/max/avg → stat-column
    * mapping for the PromQL tier readers (instant and range);
    * [[readAgg]] applies the same mapping to already-merged rows.
    * `avg` divides the exact decimal sums at the end; `sum` casts to
    * double once (the Det playbook, bit-equal vs a DuckDB replay).
    */
  def mergedValue(agg: String): Column = agg match {
    case "count" => sum(col("n")).cast("double")
    case "sum"   => sum(col("sum_dec")).cast("double")
    case "min"   => min(col("min_v"))
    case "max"   => max(col("max_v"))
    case "avg"   => sum(col("sum_dec")).cast("double") / sum(col("n"))
  }

  /** Reads an `agg_over_time` answer off a stat tier: one row per
    * (keys, window bucket). `avg` divides the exact sums at the end;
    * `sum` casts to double once (the playbook).
    */
  def readAgg(tier: DataFrame, keys: Seq[String], tsCol: String,
      windowNs: Long, agg: String): DataFrame = {
    require(Serves.contains(agg), s"tier cannot serve '$agg'")
    val merged = reRollup(tier, keys, tsCol, windowNs)
    val value = agg match {
      case "count" => col("n").cast("double")
      case "sum"   => col("sum_dec").cast("double")
      case "min"   => col("min_v")
      case "max"   => col("max_v")
      // double division AFTER the exact decimal sum — the same shape
      // as Det.davg, so a DuckDB oracle replays it bit-for-bit
      case "avg"   => col("sum_dec").cast("double") / col("n")
    }
    merged.select(keys.map(col) :+ col(tsCol) :+ value.as("value"): _*)
  }
}
