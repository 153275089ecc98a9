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
        "orders"))
      spark.read.parquet(s"$src/$t.parquet")
        .write.mode("overwrite").parquet(s"$out/$t.parquet")
    new java.io.FileOutputStream(new java.io.File(dir, "_DONE")).close()
  }

  /** Embeddings scale separately (added for the SemDeDup probe; keyed
    * by its own marker so existing corpora upgrade in place): vec_id
    * shifts per copy and the vector ROTATES by the copy index —
    * norms are preserved, cross-copy vectors decorrelate (random
    * dims), near-dup structure within a copy survives.
    */
  private def scaleUpEmbeddings(spark: SparkSession, src: String,
      out: String, factor: Int): Unit = {
    val dir = new java.io.File(out)
    if (new java.io.File(dir, "_EMB_SCALED").exists()) return
    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    val maxVec = emb.agg(max("vec_id")).head().getLong(0) + 1
    (0 until factor).map { i =>
      val r = i % 64
      emb.withColumn("vec_id", col("vec_id") + lit(i * maxVec))
        .withColumn("embedding", expr(
          s"concat(slice(embedding, ${r + 1}, ${64 - r}), slice(embedding, 1, $r))"))
    }.reduce(_ unionAll _)
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
    new java.io.FileOutputStream(new java.io.File(dir, "_EMB_SCALED")).close()
  }

  /** SemDeDup with k ∝ corpus (8 centroids per base-size stripe, so
    * per-cluster size stays CONSTANT as data grows — the paper's
    * deployment shape, vs the query's pinned k = 8 whose clusters
    * grow with the corpus).
    */
  private def semDedupScaledK(spark: SparkSession, dir: String,
      baseMax: Long): DataFrame = {
    def dot(a: String, b: String) =
      expr(s"aggregate(zip_with($a, $b, (x, y) -> x * y), 0D, (acc, x) -> acc + x)")
    val e = graft.sources.Testdata(spark, dir).embeddings
      .select(col("vec_id"), expr("transform(embedding, x -> cast(x as double))").as("v"))
    val c = e.filter(col("vec_id") % baseMax < 8)
      .select(col("vec_id").as("cid"), col("v").as("cv"))
    val best = e.crossJoin(broadcast(c))
      .withColumn("cos", dot("v", "cv") / (sqrt(dot("v", "v")) * sqrt(dot("cv", "cv"))))
      .groupBy(col("vec_id"))
      .agg(max_by(col("cid"), struct(col("cos"), -col("cid"))).as("cid"))
    val ev = best.join(e, "vec_id")
    val a = ev.select(col("cid"), col("vec_id").as("ida"), col("v").as("va"))
    val b = ev.select(col("cid"), col("vec_id").as("idb"), col("v").as("vb"))
    a.join(b, Seq("cid")).filter(col("ida") < col("idb"))
      .select(col("cid"),
        round(graft.functions.GraftFunctions.cosine_sim(col("va"), col("vb")), 6).as("sim"))
      .filter(col("sim") >= 0.42)
  }

  /** SemDeDup with k ∝ corpus through the FIRST-CLASS two-level
    * quantizer ([[graft.pipeline.Ann.semDedupHier]] — the exact code
    * path `pipe_semdedup_hier` ships), not a harness copy: the probe
    * times the operator a 100 TB run would execute.
    */
  private def semDedupHierK(spark: SparkSession, dir: String,
      baseMax: Long): DataFrame = {
    val e = graft.sources.Testdata(spark, dir).embeddings
      .select(col("vec_id"), expr("transform(embedding, x -> cast(x as double))").as("v"))
    val cents = e.filter(col("vec_id") % baseMax < 8)
      .select(col("vec_id").as("cid"), col("v").as("cv"))
    graft.pipeline.Ann.semDedupHier(e, cents, 0.42)
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
    // optional 4th arg: comma-separated probe-name substrings — at
    // 100x the deliberately-quadratic SemDeDup fixed-k anti-pattern
    // demo would dominate the run, so big-factor probes select the
    // plans under study
    val only = args.lift(3).map(_.split(",").toSeq.filter(_.nonEmpty))
      .getOrElse(Nil)
    def want(n: String): Boolean = only.isEmpty || only.exists(n.contains)
    val spark = GraftSession
      .configure(SparkSession.builder().master("local[32]"), 32)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    scaleUp(spark, src, out, factor)
    scaleUpEmbeddings(spark, src, out, factor)
    val baseMaxVec = spark.read.parquet(s"$src/embeddings.parquet")
      .agg(max("vec_id")).head().getLong(0) + 1

    for ((tag, dir) <- Seq("sf0.1" -> src, s"sf${factor}x" -> out)) {
      val td = graft.sources.Testdata(spark, dir)
      // compare() explodes each matched span's 3-entry attr map: the
      // amplification is (span attrs)/span — measure it on the span
      // source (lineitem) rather than trusting the plan
      if (want("traceql_metrics_compare")) {
        val nSpans = td.lineitem.count()
        println(s"PROBE compare $tag spans=$nSpans exploded=${nSpans * 3} " +
          "amplification=3.0x (3 attrs/span)")
        time3("traceql_metrics_compare", tag) {
          graft.SparkEntry.queries("traceql_metrics_compare")(spark, dir).count()
        }
      }
      // connected components: rounds must stay O(log n)
      if (want("pipe_dedup_clusters")) {
        // the operator's actual CC input: star-reduced band edges
        val edges = graft.queries.QueriesPipeline2.bandStarEdges(td)
        val (cc, rounds) =
          graft.pipeline.Components.connectedComponentsWithRounds(edges)
        println(s"PROBE cc $tag edges=${edges.count()} rounds=$rounds " +
          s"nodes=${cc.count()}")
        time3("pipe_dedup_clusters", tag) {
          graft.SparkEntry.queries("pipe_dedup_clusters")(spark, dir).count()
        }
      }
      // group_left: many-to-one join whose broadcast "one" side grows
      // with series cardinality — report its size alongside the timing
      if (want("logql_e2e_group_left")) {
        val users = td.events.select(col("user_id")).distinct().count()
        println(s"PROBE group_left $tag users=$users")
        time3("logql_e2e_group_left", tag) {
          graft.SparkEntry.queries("logql_e2e_group_left")(spark, dir).count()
        }
      }
      // excess-log safety: event replication multiplies the per-second
      // flood rate (same seconds, factor× records each), so the shed
      // fraction grows while keep counts stay fixed — the rank windows
      // partition by (key, second) and must scale with partition mass
      for (q <- Seq("src_safety_compact", "src_safety_sample") if want(q))
        time3(q, tag) {
          graft.SparkEntry.queries(q)(spark, dir).count()
        }
      // ch span-log collapse: two (trace, name)-keyed aggregations —
      // output grows with trace cardinality (users), never raw events
      if (want("src_chspanlog_collapse"))
        time3("src_chspanlog_collapse", tag) {
          graft.SparkEntry.queries("src_chspanlog_collapse")(spark, dir).count()
        }
      // decontamination: the broadcast benchmark-gram side grows with
      // the EVAL set (here 1/20 of docs), the corpus side only scans —
      // growth should track the doc count, never gram-pair products
      if (want("pipe_decontaminate"))
        time3("pipe_decontaminate", tag) {
          graft.SparkEntry.queries("pipe_decontaminate")(spark, dir).count()
        }
      // as-of join: one (user, ts) window sort; growth tracks events
      if (want("src_asof_join"))
        time3("src_asof_join", tag) {
          graft.SparkEntry.queries("src_asof_join")(spark, dir).count()
        }
      // new text-pipeline ops: gram/block shuffles and the chunk
      // explode are linear shapes — growth must track documents
      for (q <- Seq("pipe_substring_dup", "pipe_block_dedup",
          "pipe_chunk_overlap", "pipe_cdc_dedup") if want(q))
        time3(q, tag) {
          graft.SparkEntry.queries(q)(spark, dir).count()
        }
      // corpus-level source audits: the overlap matrix's pair explode
      // is bounded by the source catalog (C(|sources|,2) output rows),
      // vocab stats are two stacked aggs — both must grow with the
      // distinct gram/token mass, never with doc pairs
      for (q <- Seq("pipe_source_overlap", "pipe_source_overlap_sketch",
          "pipe_vocab_stats", "pipe_embed_stats") if want(q))
        time3(q, tag) {
          graft.SparkEntry.queries(q)(spark, dir).count()
        }
      // SemDeDup both ways: the query's pinned k = 8 lets clusters
      // grow with the corpus (pair space ~quadratic per cluster — the
      // anti-pattern), vs k ∝ corpus where per-cluster size stays
      // constant and growth stays near-linear
      if (want("pipe_semdedup_fixed_k"))
        time3("pipe_semdedup_fixed_k", tag) {
          graft.SparkEntry.queries("pipe_semdedup")(spark, dir).count()
        }
      if (want("pipe_semdedup_scaled_k"))
        time3("pipe_semdedup_scaled_k", tag) {
          semDedupScaledK(spark, dir, baseMaxVec).count()
        }
      if (want("pipe_semdedup_hier_k"))
        time3("pipe_semdedup_hier_k", tag) {
          semDedupHierK(spark, dir, baseMaxVec).count()
        }
      // round-8 late ops: the masking projection + template-keyed
      // rollup (pattern mining), vocabulary-first pair counting (BPE),
      // and broadcast-bounded band top-k (hard negatives) are all
      // linear shapes — growth must track the corpus
      for (q <- Seq("logql_pattern_mining", "pipe_bpe_pairs",
          "pipe_hard_negatives") if want(q))
        time3(q, tag) {
          graft.SparkEntry.queries(q)(spark, dir).count()
        }
      // round-9 late ops: the bounded histogram-percentile rollup, the
      // shuffle-free tokenizer application, and the per-partition PNG
      // codec seam are all linear shapes — growth must track documents
      for (q <- Seq("pipe_quality_percentile", "pipe_bpe_encode",
          "pipe_media_png") if want(q))
        time3(q, tag) {
          graft.SparkEntry.queries(q)(spark, dir).count()
        }
      // round-17 ops: DSIR's model is a 128-bucket broadcast histogram
      // (PlanSpec-pinned) and entropy is two doc-keyed aggregations —
      // both linear shapes; growth must track documents
      for (q <- Seq("pipe_dsir_weights", "pipe_unigram_entropy")
          if want(q))
        time3(q, tag) {
          graft.SparkEntry.queries(q)(spark, dir).count()
        }
      // round-12 ops: the tier-served range grid reads
      // (buckets × series) stat rows — vocabulary×time shaped, so
      // factor× raw events must leave the per-query scan FLAT once the
      // tiers are built (run1 includes the one-time fixture build,
      // which is the linear ingest-side maintenance job)
      if (want("pushdown_tier_range"))
        time3("pushdown_tier_range", tag) {
          graft.SparkEntry.queries("pushdown_tier_range")(spark, dir).count()
        }
      // round-13 op: the log-volume offload reads integral stat rows
      // off the maintained sidecar — vocabulary×time shaped like the
      // stat tiers, so factor× raw events must leave the per-query
      // scan FLAT once the sidecar is built (run1 includes the
      // one-time fixture build = the ingest-side maintenance job)
      if (want("pushdown_logvol_range"))
        time3("pushdown_logvol_range", tag) {
          graft.SparkEntry.queries("pushdown_logvol_range")(spark, dir).count()
        }
      // packed-set Jaccard verify (r12 reshape): per-doc shingle SETS
      // move as document-sized records through candidate-bounded
      // joins — growth must track docs (build) + candidates (verify)
      if (want("pipe_lsh_jaccard_verify"))
        time3("pipe_lsh_jaccard_verify", tag) {
          graft.SparkEntry.queries("pipe_lsh_jaccard_verify")(spark, dir).count()
        }
      // docker envelope unwrap: one scan-fused projection, linear —
      // hash the outputs so the projection actually evaluates (a bare
      // count() of a filter-free projection answers from parquet
      // metadata and would time nothing)
      if (want("src_docker_log_unwrap"))
        time3("src_docker_log_unwrap", tag) {
          val df = graft.SparkEntry.queries("src_docker_log_unwrap")(spark, dir)
          df.agg(sum(hash(df.columns.toIndexedSeq.map(col): _*)))
            .collect()
          df.count()
        }
      // the maintenance pass ITSELF: a day that accumulated factor×
      // per-batch sidecar partials (the "claim: reads stop growing
      // with batch count" needs a measured maintenance cost next to
      // it). Build `batches` exactly-once commits of vocabulary-sized
      // rollup+cube partials into one cold partition, time the reader
      // merge before, the compaction, and the reader after — compaction
      // cost should grow ~linearly in batch-file count while the
      // post-merge read returns to vocabulary scale.
      if (want("maintenance_compaction")) {
        val batches = if (dir == src) 10 else math.min(10 * factor, 300)
        val tmp = java.nio.file.Files
          .createTempDirectory(s"graft-maintprobe").toString
        val roll = s"$tmp/rollup"; val cube = s"$tmp/cube"
        val h10 = 1704103200000000L // 2024-01-01T10:00Z µs (cold)
        val day1ns = 1704103200000000000L
        // vocabulary per batch: 200 metric series, 150 cube combos
        val points = spark.range(600).select(
          (lit(h10) + (col("id") % 3600) * 1000000L).as("ts_us"),
          concat(lit("m"), col("id") % 200).as("name"),
          map(lit("host"), concat(lit("h"), col("id") % 200)).as("labels"),
          (col("id") % 97).cast("double").as("value"))
        val cubeRows = spark.range(150).select(
          lit(day1ns - day1ns % 86400000000000L).as("bucket_ns"),
          concat(lit("op"), col("id") % 50).as("name"),
          (col("id") % 5 + 1).cast("int").as("kind"),
          (col("id") % 3).cast("int").as("status_code"),
          lit("env").as("attr"), concat(lit("v"), col("id") % 2).as("attr_value"),
          (col("id") % 7 + 1).as("n"))
        val tIngest0 = System.nanoTime()
        for (b <- 0 until batches) {
          graft.sources.Layout.commitBatch(roll, b) { staging =>
            graft.streaming.Streams.hourlyStatPartials(points)
              .withColumn("date", date_format(col("hour_start"), "yyyyMMdd"))
              .write.mode("overwrite").partitionBy("date").parquet(staging)
          }
          graft.sources.Layout.commitBatch(cube, b)(
            graft.sources.Layout.writeAttrCube(cubeRows, _, mode = "overwrite"))
        }
        val ingestS = (System.nanoTime() - tIngest0) / 1e9
        def files(root: String) =
          Option(new java.io.File(root, "date=20240101").listFiles())
            .map(_.count(_.getName.endsWith(".parquet"))).getOrElse(0)
        def readMerge(root: String): (Double, Long) = {
          val t0 = System.nanoTime()
          val n = spark.read.parquet(root)
            .groupBy("name").agg(count(lit(1))).count()
          ((System.nanoTime() - t0) / 1e9, n)
        }
        val (preR, _) = readMerge(roll)
        val fPre = files(roll)
        val t0 = System.nanoTime()
        graft.sources.Layout.compactRollupPartition(spark, roll, "20240101")
        val rollS = (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime()
        graft.sources.Layout.compactCubePartition(spark, cube, "20240101")
        val cubeS = (System.nanoTime() - t1) / 1e9
        val (postR, _) = readMerge(roll)
        println(f"PROBE maintenance $tag batches=$batches " +
          f"ingest=$ingestS%.1f s files_pre=$fPre files_post=${files(roll)} " +
          f"compact_rollup=$rollS%.2f s compact_cube=$cubeS%.2f s " +
          f"read_pre=$preR%.2f s read_post=$postR%.2f s")
        graft.sources.Layout.deleteRecursively(new java.io.File(tmp))
      }
    }
    spark.stop()
  }
}
