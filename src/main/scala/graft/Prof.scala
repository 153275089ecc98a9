package graft

import org.apache.spark.sql.SparkSession

import graft.util.GraftSession

/** Per-query profiler: runs the named registry queries three times
  * each (run 1 pays fixture/JIT warm-up; runs 2-3 are steady state)
  * and prints timings; set PROF_EXPLAIN=1 to dump the formatted plan.
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *     sbt "runMain graft.Prof traceql_metrics_compare"
  */
object Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession
      .configure(SparkSession.builder().master("local[32]"), 32)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.entry(spark).count()
    val td = graft.sources.Testdata(spark, sfDir)
    Seq(td.events, td.lineitem, td.orders, td.documents, td.embeddings)
      .foreach(df => { df.count(); () })
    args.toSeq.foreach { n =>
      val fn = SparkEntry.queries(n)
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        println(f"PROF $n run$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
      if (sys.env.contains("PROF_EXPLAIN"))
        fn(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
