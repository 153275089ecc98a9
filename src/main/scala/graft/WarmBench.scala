package graft

import org.apache.spark.sql.SparkSession

import graft.util.GraftSession

/** Two-pass bench: runs the full query set twice in one session and
  * reports both passes. Pass 1 is what `Bench` measures (each query
  * pays its own codegen + plan compilation); pass 2 is the steady
  * state a long-lived server session reaches — the regime the
  * reference baseline numbers were recorded in. The delta quantifies
  * how much of the per-query cost is one-time JVM/codegen work rather
  * than operator execution.
  *
  *   sbt "runMain graft.WarmBench"   (env as Bench)
  */
object WarmBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession
      .configure(SparkSession.builder().master(s"local[$cpus]"), cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.entry(spark).count()

    def pass(): Seq[(String, Double)] =
      SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
        name -> (System.nanoTime() - t0) / 1e9
      }

    def stats(r: Seq[(String, Double)]): String = {
      val v = r.map(_._2).sorted
      val mean = v.sum / v.size
      f"""{"total":${v.sum}%.1f,"mean":$mean%.3f,"median":${v(v.size / 2)}%.3f,"p90":${v((v.size * 9) / 10)}%.3f}"""
    }

    val cold = pass()
    val warm = pass()
    println(s"""{"metric":"warm_bench","n":${cold.size},"pass1":${stats(cold)},"pass2":${stats(warm)},"sf":"$sfDir"}""")
    spark.stop()
  }
}
