package graft

import graft.util.GraftSession

/** Splits a query's steady-state wall into DRIVER PLANNING (build the
  * DataFrame + analyze + optimize + physical planning, forced via
  * `queryExecution.executedPlan` without running a job) and EXECUTION
  * (the count() that follows, jobs included). Floor-dominated queries
  * whose planning share is large need smaller plans (fewer union
  * branches / simpler expressions), not fewer jobs.
  *
  *   sbt "runMain graft.PlanCost name1,name2,..."
  */
object PlanCost {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt, "plancost")
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.entry(spark).count()
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    (1 to 3).foreach(_ => spark.range(16).count())
    args.head.split(',').toSeq.foreach { n =>
      val fn = SparkEntry.queries(n)
      fn(spark, sfDir).count() // steady state: fixtures, codegen, JIT
      val runs = (1 to 3).map { _ =>
        var df: org.apache.spark.sql.DataFrame = null
        val tBuild = time { df = fn(spark, sfDir) }
        val tPlan = time { df.queryExecution.executedPlan }
        val tExec = time { df.count() }
        (tBuild, tPlan, tExec)
      }
      val m = runs.sortBy(r => r._1 + r._2 + r._3).apply(1)
      println(f"[plancost] $n%-36s build=${m._1}%.3f plan=${m._2}%.3f " +
        f"exec=${m._3}%.3f total=${m._1 + m._2 + m._3}%.3f")
    }
    spark.stop()
  }
}
