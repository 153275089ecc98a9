package graft


import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.util.GraftSession

/** Remote-write ingest throughput probe — the BASELINE.md anchor is
  * ≈144k points/s sustained for the reference (vmagent →
  * /api/v1/write → ClickHouse, dev/local/ch-bench). This measures the
  * Spark side of the same path: prompb WriteRequest frames → (snappy
  * undone at the edge) → distributed decode ([[graft.sources.Prompb]]
  * via mapPartitions) → the (date, name, ts)-sorted point layout.
  *
  * Frames are GENERATED on executors (the producer cost is the load
  * generator's, not the pipeline's) and the decode+write is timed as
  * one job — the deployment shape, where ingest partitions across
  * executors and the HTTP edge only enqueues.
  *
  *   sbt "runMain graft.IngestBench [frames] [series/frame] [samples/series]"
  */
object IngestBench {

  // the shared hand-rolled protobuf writer (public prompb field
  // numbers; r17 dedup with ServeProbe and the self-telemetry exporter)
  private type PW = graft.util.ProtoW

  /** One WriteRequest: `nSeries` series × `nSamples` samples each,
    * plus one trace-linked exemplar per series (prompb TimeSeries
    * field 3; the write path stores them through the exemplar layout
    * alongside the points, like the reference's remote-write decode).
    */
  def frame(frameId: Long, nSeries: Int, nSamples: Int): Array[Byte] = {
    val t0Ms = 1704103200000L + frameId * nSamples * 15000L
    val w = new PW()
    var s = 0
    while (s < nSeries) {
      val ts = new PW()
        .msg(1, new PW().str(1, "__name__").str(2, "bench_points_total"))
        .msg(1, new PW().str(1, "instance").str(2, s"host-${frameId % 64}"))
        .msg(1, new PW().str(1, "series").str(2, s"s$s"))
      var i = 0
      while (i < nSamples) {
        ts.msg(2, new PW().double(1, (frameId + s + i).toDouble)
          .vint(2, t0Ms + i * 15000L))
        i += 1
      }
      // Exemplar: 1 labels (trace link), 2 value, 3 timestamp
      ts.msg(3, new PW()
        .msg(1, new PW().str(1, "trace_id").str(2, f"${frameId * 1000 + s}%032x"))
        .double(2, (frameId + s).toDouble)
        .vint(3, t0Ms))
      w.msg(1, ts)
      s += 1
    }
    w.toByteArray
  }

  def main(args: Array[String]): Unit = {
    val nFrames = args.headOption.map(_.toInt).getOrElse(2000)
    val nSeries = args.lift(1).map(_.toInt).getOrElse(50)
    val nSamples = args.lift(2).map(_.toInt).getOrElse(20)
    val totalPoints = nFrames.toLong * nSeries * nSamples
    val spark = GraftSession
      .configure(SparkSession.builder().master("local[32]"), 32)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // producer side (untimed): frames built on executors, snappy-framed
    // like the wire, materialized so the timed runs measure ingest only
    val wire = spark.range(0, nFrames.toLong, 1, 32)
      .map(i => graft.sources.Snappy.encodeLiteral(frame(i, nSeries, nSamples)))
      .persist()
    val frameBytes = wire.map(_.length.toLong).reduce(_ + _)
    println(s"PROBE ingest frames=$nFrames points=$totalPoints " +
      f"wire=${frameBytes / 1e6}%.1f MB")

    def time(tag: String)(run: => Long): Double = {
      val t0 = System.nanoTime()
      val n = run
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"PROBE ingest $tag ${dt}%.2f s ($n rows, ${n / dt}%.0f/s)")
      dt
    }

    // edge + decode only (snappy undo, protobuf decode, no storage)
    time("decode") {
      wire.map(b => graft.sources.Prompb
        .decodeWriteRequest(graft.sources.Snappy.decode(b)).size.toLong)
        .reduce(_ + _)
    }
    // the full path: decode -> point rows -> sorted daily layout
    val out = java.nio.file.Files.createTempDirectory("ingestbench").toString
    var best = Double.MaxValue
    (1 to 3).foreach { _ =>
      val dt = time("decode+layout") {
        val decompressed = wire.map(graft.sources.Snappy.decode)
        val points = graft.streaming.Streams.pointsFromPrompb(
          decompressed.toDF("payload"))
        graft.sources.Layout.writePoints(points, out)
        totalPoints
      }
      best = math.min(best, dt)
    }
    println(f"""{"metric":"ingest_points_per_sec","value":${totalPoints / best}%.0f,"points":$totalPoints,"baseline":144300}""")

    // exemplar storage on the same wire: decode the TimeSeries field-3
    // exemplars and append the daily exemplar layout (one exemplar per
    // series per frame in the generated load)
    val totalExemplars = nFrames.toLong * nSeries
    val exOut = java.nio.file.Files.createTempDirectory("ingestbenchex").toString
    var bestEx = Double.MaxValue
    (1 to 3).foreach { _ =>
      val dt = time("exemplars decode+layout") {
        val decompressed = wire.map(graft.sources.Snappy.decode)
        val ex = graft.streaming.Streams.exemplarsFromPrompb(
          decompressed.toDF("payload"))
        graft.sources.Layout.writeExemplars(ex, exOut)
        totalExemplars
      }
      bestEx = math.min(bestEx, dt)
    }
    println(f"""{"metric":"ingest_exemplars_per_sec","value":${totalExemplars / bestEx}%.0f,"exemplars":$totalExemplars}""")

    // Loki push (promtail-default snappy logproto) — same shape: frames
    // generated on executors, decode + enrich + sorted layout timed
    val linesPerStream = 50
    val streamsPerFrame = 10
    val totalLines = nFrames.toLong * streamsPerFrame * linesPerStream
    def pushFrame(id: Long): Array[Byte] = {
      val w = new PW()
      var s = 0
      while (s < streamsPerFrame) {
        val st = new PW().str(1, s"""{app="bench", shard="${id % 64}", s="$s"}""")
        var i = 0
        while (i < linesPerStream) {
          st.msg(2, new PW()
            .msg(1, new PW().vint(1, 1704103200L + i).vint(2, id % 1000))
            .str(2, s"level=info msg=bench line=$i frame=$id"))
          i += 1
        }
        w.msg(1, st)
        s += 1
      }
      graft.sources.Snappy.encodeLiteral(w.toByteArray)
    }
    val pushWire = spark.range(0, nFrames.toLong, 1, 32)
      .map(i => pushFrame(i)).persist()
    pushWire.count()
    val logsOut = java.nio.file.Files.createTempDirectory("ingestbenchlogs").toString
    var bestLogs = Double.MaxValue
    (1 to 3).foreach { _ =>
      val dt = time("lokipush decode+layout") {
        val logs = graft.streaming.Streams.enrichLogs(
          graft.streaming.Streams.logsFromLokiPush(pushWire.toDF("payload")))
        graft.sources.Layout.writeLogs(logs, logsOut)
        totalLines
      }
      bestLogs = math.min(bestLogs, dt)
    }
    println(f"""{"metric":"ingest_lines_per_sec","value":${totalLines / bestLogs}%.0f,"lines":$totalLines}""")
    spark.stop()
  }
}
