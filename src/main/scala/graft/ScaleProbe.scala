package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.util.GraftSession

/** Scale probe for the two heaviest bench plans: generates an
  * sf1-equivalent corpus (10× sf0.1, keys shifted per copy so traces
  * and documents stay distinct; document text vowel-rotated per copy
  * so cross-copy shingles do NOT collide and LSH bucket mass grows
  * linearly, not quadratically), then times
  * `traceql_metrics_compare` and `pipe_dedup_clusters` at both scales
  * and reports compare's explode amplification and the
  * connected-components round count.
  *
  *   sbt "runMain graft.ScaleProbe /root/testdata/sf0.1 /tmp/sf1 10"
  */
object ScaleProbe {

  private def scaleUp(spark: SparkSession, src: String, out: String,
      factor: Int): Unit = {
    val dir = new java.io.File(out)
    if (new java.io.File(dir, "_DONE").exists()) return
    dir.mkdirs()
    val li = spark.read.parquet(s"$src/lineitem.parquet")
    val maxOrder = li.agg(max("l_orderkey")).head().getLong(0) + 1
    (0 until factor).map(i => li.withColumn("l_orderkey",
        col("l_orderkey") + lit(i * maxOrder)))
      .reduce(_ unionAll _)
      .write.mode("overwrite").parquet(s"$out/lineitem.parquet")
    val docs = spark.read.parquet(s"$src/documents.parquet")
    val maxDoc = docs.agg(max("doc_id")).head().getLong(0) + 1
    (0 until factor).map { i =>
      // rotate vowels per copy: near-dup structure WITHIN a copy is
      // preserved, shingles ACROSS copies diverge
      val rotated = "aeiou".drop(i % 5) + "aeiou".take(i % 5)
      docs.withColumn("doc_id", col("doc_id") + lit(i * maxDoc))
        .withColumn("text", translate(col("text"), "aeiou", rotated))
    }.reduce(_ unionAll _)
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
    // events: shift user_id per copy — the factor multiplies series
    // CARDINALITY (more tenants), the realistic axis for the LogQL
    // group_left probe (its broadcast "one" side grows with users)
    val ev = spark.read.parquet(s"$src/events.parquet")
    val maxUser = ev.agg(max("user_id")).head().getLong(0) + 1
    (0 until factor).map(i => ev.withColumn("user_id",
        col("user_id") + lit(i * maxUser)))
      .reduce(_ unionAll _)
      .write.mode("overwrite").parquet(s"$out/events.parquet")
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
        "orders", "embeddings"))
      spark.read.parquet(s"$src/$t.parquet")
        .write.mode("overwrite").parquet(s"$out/$t.parquet")
    new java.io.FileOutputStream(new java.io.File(dir, "_DONE")).close()
  }

  private def time3(name: String, tag: String)(run: => Long): Unit =
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      val rows = run
      println(f"PROBE $name $tag run$i ${(System.nanoTime() - t0) / 1e9}%.2f s ($rows rows)")
    }

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = args.lift(1).getOrElse("/tmp/sf1")
    val factor = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = GraftSession
      .configure(SparkSession.builder().master("local[32]"), 32)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    scaleUp(spark, src, out, factor)

    for ((tag, dir) <- Seq("sf0.1" -> src, s"sf${factor}x" -> out)) {
      val td = graft.sources.Testdata(spark, dir)
      // compare() explodes each matched span's 3-entry attr map: the
      // amplification is (span attrs)/span — measure it on the span
      // source (lineitem) rather than trusting the plan
      val nSpans = td.lineitem.count()
      println(s"PROBE compare $tag spans=$nSpans exploded=${nSpans * 3} " +
        "amplification=3.0x (3 attrs/span)")
      time3("traceql_metrics_compare", tag) {
        graft.SparkEntry.queries("traceql_metrics_compare")(spark, dir).count()
      }
      // connected components: rounds must stay O(log n)
      val edges = graft.queries.QueriesPipeline2.bandCandidates(td)
        .select(col("a").as("src"), col("b").as("dst"))
      val (cc, rounds) =
        graft.pipeline.Components.connectedComponentsWithRounds(edges)
      println(s"PROBE cc $tag edges=${edges.count()} rounds=$rounds " +
        s"nodes=${cc.count()}")
      time3("pipe_dedup_clusters", tag) {
        graft.SparkEntry.queries("pipe_dedup_clusters")(spark, dir).count()
      }
      // group_left: many-to-one join whose broadcast "one" side grows
      // with series cardinality — report its size alongside the timing
      val users = td.events.select(col("user_id")).distinct().count()
      println(s"PROBE group_left $tag users=$users")
      time3("logql_e2e_group_left", tag) {
        graft.SparkEntry.queries("logql_e2e_group_left")(spark, dir).count()
      }
      // decontamination: the broadcast benchmark-gram side grows with
      // the EVAL set (here 1/20 of docs), the corpus side only scans —
      // growth should track the doc count, never gram-pair products
      time3("pipe_decontaminate", tag) {
        graft.SparkEntry.queries("pipe_decontaminate")(spark, dir).count()
      }
      // as-of join: one (user, ts) window sort; growth tracks events
      time3("src_asof_join", tag) {
        graft.SparkEntry.queries("src_asof_join")(spark, dir).count()
      }
    }
    spark.stop()
  }
}
