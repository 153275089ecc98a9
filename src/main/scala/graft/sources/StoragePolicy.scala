package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** Age-tiered storage policy — the reference's per-tenant merge-time
  * policy (cmd/oteldb/storage_policy.go:21-68 `StoragePolicyConfig`)
  * re-expressed at this layout's maintenance seam
  * ([[Layout.compactPartition]]): the reference's embedded engine
  * applies the policy when background merges rewrite parts; a parquet
  * layout applies it when compaction rewrites a date partition. Both
  * are the same contract — recent data stays raw and lossless, old
  * data trades resolution/precision/CPU for storage, and the query
  * path reads the result transparently (the rewritten rows keep the
  * table schema).
  *
  *   - [[DownsampleTier]] (storage_policy.go:52-61): samples in a
  *     partition older than `afterDays` are replaced by ONE
  *     representative per `intervalUs`-wide bucket per series, the
  *     bucket combined by `agg` ∈ last/first/min/max/sum/avg/count
  *     (the reference's signal.ParseAggregation set; "last" default).
  *     The representative's timestamp is the bucket start — aligned
  *     grids re-aggregate exactly and row-group min/max stats stay
  *     tight. `last`/`first` pick by (ts, value) order so ties are
  *     deterministic under replay.
  *   - [[PrecisionTier]] (storage_policy.go:43-49): the value column
  *     is re-encoded keeping `bits` significant mantissa bits
  *     (round-to-nearest, relative error ≤ 2^-(bits+1)); zeroed low
  *     bits compress far better. 0 or ≥52 ⇒ lossless.
  *   - [[Recompress]] (storage_policy.go:63-69): partitions older than
  *     `afterDays` rewrite with high-level Zstandard instead of the
  *     hot-path default codec — decode-transparent, trades merge CPU
  *     for storage.
  *
  * Tier selection: the tier with the LARGEST `afterDays ≤ age` wins
  * (age = whole days between the partition date and "now" at
  * compaction, matching the reference's parts-older-than-After at
  * day granularity). Retention (`storage_policy.go:71-79`) is already
  * [[Layout.enforceTtl]]; admission limits are [[Admission]].
  */
object StoragePolicy {

  val Aggs: Set[String] =
    Set("last", "first", "min", "max", "sum", "avg", "count")

  /** One age band of the lossy float-precision policy. `bits` outside
    * 1..51 ⇒ lossless (ignored), reference semantics.
    */
  final case class PrecisionTier(afterDays: Int, bits: Int)

  /** One age band of the downsampling policy. `intervalUs == 0`
    * disables the tier (reference semantics).
    */
  final case class DownsampleTier(afterDays: Int, intervalUs: Long,
      agg: String = "last") {
    // a typo'd aggregation is a STARTUP error, not a silently-ignored
    // tier (reference validates via signal.ParseAggregation,
    // storage_policy.go:146-152)
    require(Aggs.contains(agg), s"downsample tier: unknown agg '$agg'")
  }

  final case class Recompress(afterDays: Int, level: Int = 19) {
    require(afterDays > 0, "recompress: use a positive age")
    require(level >= 1 && level <= 22, s"recompress: bad zstd level $level")
  }

  final case class Policy(
      precision: Seq[PrecisionTier] = Nil,
      downsample: Seq[DownsampleTier] = Nil,
      recompress: Option[Recompress] = None)

  /** The tier with the largest threshold not exceeding the age. */
  def pick[T](tiers: Seq[T], ageDays: Int)(after: T => Int): Option[T] =
    tiers.filter(t => after(t) <= ageDays).sortBy(after).lastOption

  /** Today in UTC as `yyyyMMdd` — THE default clock for every
    * maintenance trigger (maintainStorage, the admin action, the Serve
    * scheduler). One definition: the triggers must agree on "now", or
    * a deployment overriding one of them computes a different TTL
    * horizon per trigger (the split-clock retention bug).
    */
  def utcToday(): String = java.time.LocalDate
    .now(java.time.ZoneOffset.UTC)
    .format(java.time.format.DateTimeFormatter.ofPattern("yyyyMMdd"))

  /** Whole days between a `yyyyMMdd` partition date and "now". */
  def ageDays(date: String, nowDate: String): Int = {
    val fmt = java.time.format.DateTimeFormatter.ofPattern("yyyyMMdd")
    java.time.temporal.ChronoUnit.DAYS.between(
      java.time.LocalDate.parse(date, fmt),
      java.time.LocalDate.parse(nowDate, fmt)).toInt
  }

  /** Merge-time rollup of a points-shaped frame: one representative per
    * (series, `intervalUs` bucket). Series identity = every column
    * except the timestamp and the value, so the transform is schema-
    * preserving and the rewritten partition reads like raw data. One
    * partial-aggregated groupBy per rewrite; at 100 TB each date
    * partition compacts independently, so the shuffle is bounded by a
    * day of one table, never the dataset.
    */
  def downsample(df: DataFrame, intervalUs: Long, agg: String,
      tsCol: String = "ts_us", valueCol: String = "value"): DataFrame = {
    require(Aggs.contains(agg), s"downsample: unknown agg '$agg'")
    if (intervalUs <= 0) return df // zero interval = tier disabled
    val idCols = df.columns.filter(c => c != tsCol && c != valueCol).toSeq
    // MapType (the labels column) is not groupable in Spark: group by
    // a canonical sorted rendering instead and carry the map itself
    // through first() — all rows in a group share identical content
    val (mapCols, plainCols) = idCols.partition(c =>
      df.schema(c).dataType.isInstanceOf[org.apache.spark.sql.types.MapType])
    // collision-free rendering (VectorMatching.streamKey idiom): a
    // separator-joined k/v string is ambiguous when values contain the
    // separator, silently merging distinct series at downsample time
    def mapKey(c: String) =
      to_json(array_sort(map_entries(col(c)))).as(s"__k_$c")
    val bucket = (col(tsCol) - col(tsCol) % intervalUs).as(tsCol)
    val value = (agg match {
      case "last"  => max(struct(col(tsCol), col(valueCol)))
        .getField(valueCol)
      case "first" => min(struct(col(tsCol), col(valueCol)))
        .getField(valueCol)
      case "min"   => min(col(valueCol))
      case "max"   => max(col(valueCol))
      case "sum"   => sum(col(valueCol))
      case "avg"   => avg(col(valueCol))
      case "count" => count(lit(1)).cast("double")
    }).as(valueCol)
    val aggs = value +: mapCols.map(c => first(col(c)).as(c))
    df.groupBy((plainCols.map(col) ++ mapCols.map(mapKey) :+ bucket): _*)
      .agg(aggs.head, aggs.tail: _*)
      .select(df.columns.map(col): _*) // original column order
  }

  /** Lossy precision: `bits` significant mantissa bits retained on the
    * value column (codegen expression, no UDF).
    */
  def truncatePrecision(df: DataFrame, bits: Int,
      valueCol: String = "value"): DataFrame =
    if (bits <= 0 || bits >= 52) df
    else df.withColumn(valueCol,
      GraftFunctions.truncate_mantissa(col(valueCol), lit(bits)))

  /** The partition rewrite for a points partition of age `ageDays`:
    * downsample tier first (fewer rows), then precision truncation on
    * the survivors. Identity when no tier applies — compaction still
    * merges files and restores sort order.
    */
  def pointsTransform(policy: Policy, age: Int)(df: DataFrame): DataFrame = {
    val down = pick(policy.downsample, age)(_.afterDays)
      .filter(_.intervalUs > 0)
      .map(t => downsample(df, t.intervalUs, t.agg))
      .getOrElse(df)
    pick(policy.precision, age)(_.afterDays)
      .map(t => truncatePrecision(down, t.bits))
      .getOrElse(down)
  }

  /** Parquet writer options for the partition's age: cold partitions
    * rewrite with high-level Zstandard (decode-transparent — parquet
    * readers pick the codec up from the page headers), warm ones keep
    * the hot-path default.
    */
  def writeOptions(policy: Policy, age: Int): Map[String, String] =
    policy.recompress.filter(_.afterDays <= age).map { r =>
      Map(
        "compression" -> "zstd",
        "parquet.compression.codec.zstd.level" -> r.level.toString)
    }.getOrElse(Map.empty)
}
