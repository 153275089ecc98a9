package graft

import org.apache.spark.sql.SparkSession

import graft.util.GraftSession

/** Per-query decomposition of steady-state bench wall time into
  * OPERATOR COMPUTE vs SCHEDULING/COORDINATION floor, measured from
  * task metrics (not modeled): for a representative sample of the
  * bench set (every Nth query by name), runs each query to steady
  * state, then times a further run while a SparkListener accumulates
  * every task's executorRunTime + deserialize + result-serialize. The
  * ideal parallel compute time is Σ task time / cores; everything
  * above it — `wall − compute` — is what the local harness pays for
  * job/stage scheduling, task launch, and inter-job driver turnaround,
  * i.e. the per-query floor a resident multi-executor cluster (and the
  * reference's resident native server) does not pay per query. Job and
  * stage counts from the status tracker put a mechanism next to the
  * number.
  *
  *   sbt "runMain graft.FloorDecomp /root/testdata/sf0.1 [sampleStride]"
  *   sbt "runMain graft.FloorDecomp <dir> 1 name1,name2"  # substrings
  */
object FloorDecomp {

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val stride = args.lift(1).map(_.toInt).getOrElse(10)
    val cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.local(cores, "floordecomp")
    val sc = spark.sparkContext
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // task-metric accumulator: executor-side busy time per task
    val taskMs = new java.util.concurrent.atomic.AtomicLong()
    val taskCpuNs = new java.util.concurrent.atomic.AtomicLong()
    val taskGcMs = new java.util.concurrent.atomic.AtomicLong()
    val taskN = new java.util.concurrent.atomic.AtomicLong()
    sc.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          taskMs.addAndGet(m.executorRunTime + m.executorDeserializeTime +
            m.resultSerializationTime)
          // cpu vs run separates waiting-for-a-core from doing work —
          // the r16 driver-run adjudication lens
          taskCpuNs.addAndGet(m.executorCpuTime)
          taskGcMs.addAndGet(m.jvmGCTime)
          taskN.incrementAndGet()
        }
        ()
      }
    })
    // the listener bus is async: wait until the task count stops moving
    def drain(): Unit = {
      var prev = -1L
      var cur = taskN.get()
      while (prev != cur) {
        prev = cur; Thread.sleep(150); cur = taskN.get()
      }
    }
    (1 to 3).foreach(_ => spark.range(16).count())

    // warm the shared fixtures exactly like Bench
    SparkEntry.entry(spark).count()
    Seq("traceql_span_filter", "traceql_by_select", "traceql_e2e_filter",
        "traceql_e2e_status_literal", "pipe_ngram_jaccard").foreach { n =>
      SparkEntry.queries.get(n).foreach { f =>
        try f(spark, dir).count() catch { case _: Throwable => () }
      }
    }
    val nameFilter = args.lift(2).map(_.split(',').toSeq)
    val sample = graft.queries.Registry.all.filter(_.bench)
      .sortBy(_.name).zipWithIndex
      .filter { case (q, i) =>
        nameFilter match {
          case Some(subs) => subs.exists(q.name.contains)
          case None       => i % stride == 0
        }
      }.map(_._1)
    var wallSum = 0.0
    var computeSum = 0.0
    sample.foreach { q =>
      try {
        q.run(spark, dir).count() // steady state: pay codegen/plan once
        drain()
        val ms0 = taskMs.get()
        val cpu0 = taskCpuNs.get()
        val gc0 = taskGcMs.get()
        sc.setJobGroup(q.name, q.name)
        val wall = time(q.run(spark, dir).count())
        sc.clearJobGroup()
        drain()
        val compute = (taskMs.get() - ms0) / 1000.0 / cores
        val cpuS = (taskCpuNs.get() - cpu0) / 1e9 / cores
        val gcS = (taskGcMs.get() - gc0) / 1000.0 / cores
        val jobs = sc.statusTracker.getJobIdsForGroup(q.name)
        val stages = jobs.flatMap(id =>
          sc.statusTracker.getJobInfo(id).map(_.stageIds().length)).sum
        wallSum += wall
        computeSum += compute
        println(f"[decomp] ${q.name}%-36s wall=$wall%.3f " +
          f"compute=$compute%.3f cpu=$cpuS%.3f gc=$gcS%.3f " +
          f"floor=${wall - compute}%.3f " +
          f"(${100 * (wall - compute) / wall}%.0f%%) jobs=${jobs.length}%2d stages=$stages%2d")
      } catch { case e: Throwable =>
        println(s"[decomp] ${q.name} failed: ${e.getMessage}")
      }
    }
    println(f"[decomp] TOTAL sample=${sample.size} wall=$wallSum%.1f s " +
      f"ideal-parallel-compute=$computeSum%.1f s " +
      f"scheduling/coordination floor=${wallSum - computeSum}%.1f s " +
      f"(${100 * (wallSum - computeSum) / wallSum}%.0f%% of wall)")
    spark.stop()
  }
}
