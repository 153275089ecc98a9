package graft

import org.apache.spark.sql.functions._

import graft.util.GraftSession

/** Decomposes the local[32] per-query floor the bench distribution
  * sits on: how much of a ~0.2-0.4 s "query" is fixed job machinery
  * (scheduling, file listing, parquet footers) rather than operator
  * work. Each probe reports (first run, median of warm runs) so the
  * one-time costs a long-lived session amortizes — FileIndex, footer
  * cache, codegen — are separated from the steady-state floor.
  *
  *   sbt "runMain graft.FloorProbe /root/testdata/sf0.1"
  */
object FloorProbe {

  private def time(f: => Unit): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  private def fmt(v: Double): String = f"$v%.3f"

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt, "floorprobe")

    def probe(name: String, n: Int = 6)(f: => Unit): Unit = {
      val ts = (1 to n).map(_ => time(f))
      val warm = ts.tail.sorted.apply((n - 1) / 2)
      println(s"[floor] $name first=${fmt(ts.head)} warm=${fmt(warm)}")
    }

    // JIT/codegen warmup so the first probe isn't charged for it
    (1 to 3).foreach(_ => spark.range(16).count())

    // pure driver+scheduler floor: one job, one task, no IO
    probe("1-task no-IO job")(spark.range(1).count())
    // 32-task scan stage, no shuffle: task-launch cost at full width
    probe("32-task no-IO job")(spark.range(0, 1L << 22, 1, 32).count())
    // one full-width exchange on top: the minimal shuffle round-trip
    probe("32-task + 1 shuffle") {
      spark.range(0, 1L << 22, 1, 32).toDF("i")
        .groupBy((col("i") % 7).as("k")).count().count()
    }
    // parquet: listing + footer on first touch, then the cached scan
    val ev = spark.read.parquet(s"$dir/events.parquet")
    probe("parquet count")(ev.count())
    probe("parquet 1-col agg")(
      ev.agg(sum(length(col("props")))).collect())
    // a representative small engine query end-to-end (parse + plan +
    // one grouped scan), the shape of the bench median
    probe("logql count_over_time") {
      graft.logql.Planner.query(
        """count_over_time({event_type=~".+"} [1d])""",
        graft.sources.Testdata(spark, dir).events
          .select(col("ts").as("ts_ns"), col("props").as("body"),
            map(lit("event_type"), col("event_type")).as("labels")))
        .count()
    }
    spark.stop()
  }
}
