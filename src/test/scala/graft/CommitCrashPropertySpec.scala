package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.propBoolean

import graft.streaming.Streams
import graft.util.GraftSession

/** Crash-replay PROPERTY over the production commit protocol: the
  * pipeline is killed at a RANDOM point between the raw commit, the
  * sidecar commit, and compaction — including the windows nobody
  * thought to name — and after recovery (the at-least-once replay,
  * optionally with a POISONED rebuilt-admission row set, plus the
  * maintenance recovery sweep) two reader-level invariants must hold
  * for EVERY generated batch and crash point:
  *
  *   1. the raw layout holds the committed batch exactly once;
  *   2. the rollup sidecar, merged, equals the stat partials of
  *      exactly the rows the raw layout holds (the tier soundness
  *      invariant [[graft.promql.PromQL.tiersFromLayout]] relies on).
  *
  * Drives [[Streams.commitPointsBatch]] — the same code
  * [[Streams.pointsSink]] runs per micro-batch — never a test copy.
  */
object CommitCrashPropertySpec extends Properties("CommitCrash") {

  private lazy val spark = GraftSession.local(cores = 4, appName = "graft-test")

  private val H10 = 1704103200000000L // 2024-01-01T10:00Z µs

  /** (ts_us, name, value): a few series over three hours, occasional
    * Prometheus stale-NaN markers.
    */
  private val genRows: Gen[List[(Long, String, Double)]] = for {
    n <- Gen.choose(1, 5)
    rows <- Gen.listOfN(n, for {
      hour <- Gen.choose(0, 2)
      minute <- Gen.choose(1, 59)
      name <- Gen.oneOf("cpu", "mem")
      v <- Gen.frequency(
        9 -> Gen.choose(-100.0, 100.0),
        1 -> Gen.const(Double.NaN))
    } yield (H10 + hour * 3600000000L + minute * 60000000L, name, v))
  } yield rows

  private def toDf(rows: List[(Long, String, Double)]): DataFrame = {
    val ss = spark
    import ss.implicits._
    rows.map { case (ts, nm, v) => (ts, nm, Map("host" -> "a"), v) }
      .toDF("ts_us", "name", "labels", "value")
  }

  /** Multiset of the stored raw rows, NaN-safe. */
  private def rawContents(path: String): Map[(Long, String, Long), Int] =
    spark.read.parquet(path).select("ts_us", "name", "value").collect()
      .map(r => (r.getLong(0), r.getString(1),
        java.lang.Double.doubleToLongBits(r.getDouble(2))))
      .groupBy(identity).view.mapValues(_.length).toMap

  private def expectedContents(rows: List[(Long, String, Double)])
      : Map[(Long, String, Long), Int] =
    rows.map { case (ts, nm, v) =>
      (ts, nm, java.lang.Double.doubleToLongBits(v))
    }.groupBy(identity).view.mapValues(_.length).toMap

  /** Reader-merged sidecar stats (what every tier read computes). */
  private def mergeStats(df: DataFrame): Set[(String, String, Long, Long, Double, Long, Long)] =
    df.groupBy(col("name"), col("series_key"), col("hour_start"))
      .agg(sum(col("n")).as("n"), sum(col("sum_dec")).as("s"),
        min(col("min_v")).as("mn"), max(col("max_v")).as("mx"))
      .collect()
      .map(r => (r.getString(0), r.getString(1),
        r.getTimestamp(2).getTime,
        r.getLong(3), r.getDecimal(4).doubleValue(),
        java.lang.Double.doubleToLongBits(r.getDouble(5)),
        java.lang.Double.doubleToLongBits(r.getDouble(6))))
      .toSet

  private def storedSidecar(roll: String) =
    if (graft.sources.Layout.hasDatePartitions(roll)) mergeStats(spark.read.parquet(roll))
    else Set.empty[(String, String, Long, Long, Double, Long, Long)]

  private def expectedSidecar(rows: List[(Long, String, Double)]) =
    if (rows.forall(_._3.isNaN))
      Set.empty[(String, String, Long, Long, Double, Long, Long)]
    else mergeStats(Streams.hourlyStatPartials(toDf(rows)))

  property("every crash window between raw commit, sidecar commit, and compaction replays to reader-equal state (poisoned replays included)") =
    Prop.forAll(genRows, Gen.choose(0, 6), Gen.oneOf(true, false)) {
      (rows, crash, poison) =>
        val dir = java.nio.file.Files
          .createTempDirectory("graft-crashprop").toString
        val raw = s"$dir/points"
        val roll = s"$dir/rollup"
        val batch = toDf(rows)
        // the poisoned replay: rebuilt driver state admits a DIFFERENT
        // row set on the at-least-once retry
        val replayRows =
          if (poison && rows.length > 1) rows.tail else rows
        val replay = toDf(replayRows)
        def commit(b: DataFrame): Unit =
          Streams.commitPointsBatch(b, 0L, raw, rollupPath = roll)

        // expectedRaw: once the raw MARKER lands, the stored batch is
        // the truth and replays must not change it; before the marker,
        // the retry's own row set legitimately wins
        val expectedRaw = crash match {
          case 1 | 2 => replayRows
          case _     => rows
        }

        crash match {
          case 0 => // no crash: the clean single pass
            commit(batch)
          case 1 => // died mid raw staging write: junk staging left
            new java.io.File(raw, ".staging_0/date=19700101").mkdirs()
            commit(replay)
          case 2 => // died between the raw file moves and the raw marker
            Streams.commitPointsBatch(batch, 0L, raw) // raw only
            assert(new java.io.File(raw, "_committed_0").delete())
            commit(replay)
          case 3 => // died between the raw commit and the sidecar commit
            Streams.commitPointsBatch(batch, 0L, raw)
            commit(replay)
          case 4 => // same window, plus a half-written sidecar staging
            Streams.commitPointsBatch(batch, 0L, raw)
            new java.io.File(roll, ".staging_0/date=19700101").mkdirs()
            commit(replay)
          case 5 => // died between the sidecar file moves and its marker
            commit(batch)
            assert(new java.io.File(roll, "_committed_0").delete())
            commit(replay)
          case 6 => // died mid compaction swap: partition moved aside,
            // tmp half-written — the maintenance recovery sweep must
            // restore it before the (re-run) compaction completes
            commit(batch)
            Option(new java.io.File(roll).listFiles())
              .getOrElse(Array.empty)
              .filter(d => d.isDirectory && d.getName.startsWith("date="))
              .sortBy(_.getName).headOption.foreach { d =>
                val date = d.getName.stripPrefix("date=")
                assert(d.renameTo(
                  new java.io.File(roll, s".old.${d.getName}")))
                new java.io.File(roll, s".compact.date=$date").mkdirs()
                graft.sources.Layout.recoverCompactionLeftovers(roll)
                graft.sources.Layout.compactRollupPartition(spark, roll, date)
              }
        }

        val rawOk = rawContents(raw) == expectedContents(expectedRaw)
        val sideOk = storedSidecar(roll) == expectedSidecar(expectedRaw)
        val ok = rawOk && sideOk
        if (ok) graft.sources.Layout.deleteRecursively(new java.io.File(dir)) // keep /tmp bounded; failures stay for inspection
        (ok: Prop) :| s"crash=$crash poison=$poison rows=$rows " +
          s"rawOk=$rawOk sideOk=$sideOk dir=$dir"
    }
}
