package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

import graft.sources.{Layout, StoragePolicy, Testdata}
import graft.streaming.Streams

/** Storage-layout and ingest-parsing specs: partition pruning reaches
  * the scan, sort keys hold within files, format detection tags and
  * extracts correctly.
  */
class LayoutSpec extends SparkTestBase {
  import spark.implicits._

  test("date-partitioned logs layout prunes partitions and keeps sort order") {
    val dir = Files.createTempDirectory("graftlogs").toString
    val td = Testdata(spark, "/root/testdata/sf0.001")
    val logs = td.events.select(
      col("ts").as("ts_ns"),
      (col("user_id") % 5 * 4 + 1).cast("int").as("severity_number"),
      concat(lit("svc-"), col("user_id") % 4).as("service_name"),
      col("props").as("body"))
    Layout.writeLogs(logs, dir)

    // partition dirs exist per day
    val days = new java.io.File(dir).listFiles().count(_.getName.startsWith("date="))
    assert(days >= 28, s"expected ~30 daily partitions, got $days")

    // partition filter reaches the scan
    val q = spark.read.parquet(dir).filter(col("date") === "20240115")
    val plan = q.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(plan.contains("PartitionFilters") && plan.contains("20240115"),
      s"partition pruning missing:\n$plan")
    assert(q.count() > 0)

    // rows within each file follow the ORDER BY keys
    val oneDay = spark.read.parquet(s"$dir/date=20240115")
      .select("severity_number", "service_name", "ts_ns").collect()
    val sorted = oneDay.map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    assert(sorted == sorted.sorted, "rows not sorted within partition")
  }

  test("cube compaction pre-merges additive partials; reads are identical") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graftcubecompact").toString
    val day1 = 1704067200000000000L
    val day2 = day1 + 86400000000000L
    def partials(n: Long, bucket: Long) = Seq(
      (bucket, "op", "env", "prod", n), (bucket, "op", "env", "dev", 1L))
      .toDF("bucket_ns", "name", "attr", "attr_value", "n")
    // three micro-batch partial row-sets land in day 1, one in day 2
    Layout.writeAttrCube(partials(1L, day1), dir)
    Layout.writeAttrCube(partials(2L, day1), dir, mode = "append")
    Layout.writeAttrCube(partials(3L, day1), dir, mode = "append")
    Layout.writeAttrCube(partials(7L, day2), dir, mode = "append")
    def merged = spark.read.parquet(dir)
      .groupBy("bucket_ns", "name", "attr", "attr_value")
      .agg(sum(col("n")).as("n")).collect()
      .map(r => ((r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3)), r.getLong(4))).toMap
    val before = merged
    assert(before((day1, "op", "env", "prod")) == 6L)
    val day2Files = new java.io.File(dir, "date=20240102").listFiles()
      .map(_.getName).toSet
    Layout.compactCubePartition(spark, dir, "20240101")
    // reader results identical, partial rows collapsed to vocabulary
    assert(merged == before)
    assert(spark.read.parquet(s"$dir/date=20240101").count() == 2L)
    // the untouched (warm) partition keeps its exact file set
    assert(new java.io.File(dir, "date=20240102").listFiles()
      .map(_.getName).toSet == day2Files)
  }

  test("rollup compaction pre-merges stat partials; tier reads are identical") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graftrollupcompact").toString
    val h10 = 1704103200000000L // 2024-01-01T10:00Z µs
    def write(ts: Long, vs: Seq[Double], mode: String): Unit =
      Streams.hourlyStatPartials(
        vs.map(v => (ts, "cpu", Map("host" -> "a"), v))
          .toDF("ts_us", "name", "labels", "value"))
        .withColumn("date", date_format(col("hour_start"), "yyyyMMdd"))
        .write.mode(mode).partitionBy("date").parquet(dir)
    write(h10 + 60000000L, Seq(1.0, 5.0), "overwrite")
    write(h10 + 120000000L, Seq(3.0), "append")
    def answer = {
      val tiers = graft.promql.PromQL.tiersFromLayout(spark, dir)
      graft.promql.PromQL.instantTierPlan(
        "avg_over_time(cpu[1h])", h10 + 3600000000L, tiers).get
        .collect().map(r => (r.getLong(0),
          r.getAs[Map[String, String]](1), r.getDouble(2))).toSeq
    }
    val before = answer
    assert(before == Seq((h10 + 3600000000L, Map("host" -> "a"), 3.0)))
    assert(spark.read.parquet(dir).count() == 2L) // two partial rows
    Layout.compactRollupPartition(spark, dir, "20240101")
    assert(answer == before, "tier read must be bit-equal post-compaction")
    assert(spark.read.parquet(dir).count() == 1L) // vocabulary scale
  }

  test("NaN-partials repair rebuilds exactly the poisoned buckets from raw; idempotent second run is a no-op") {
    import spark.implicits._
    val base = Files.createTempDirectory("graftnanrepair").toString
    val rollup = s"$base/rollup"
    val points = s"$base/points"
    val HourUs = 3600000000L
    val h10 = 1704103200000000L // 2024-01-01T10:00Z µs
    val h11 = h10 + HourUs
    // raw layout: two series over two hours; series a's hour-10 bucket
    // contains a Prometheus stale-NaN marker among live samples
    val raw = Seq(
      (h10 + 60000000L, "cpu", Map("host" -> "a"), 1.0),
      (h10 + 120000000L, "cpu", Map("host" -> "a"), Double.NaN),
      (h10 + 180000000L, "cpu", Map("host" -> "a"), 5.0),
      (h10 + 60000000L, "cpu", Map("host" -> "b"), 4.0),
      (h11 + 60000000L, "cpu", Map("host" -> "a"), 7.0)
    ).toDF("ts_us", "name", "labels", "value")
    raw.withColumn("date", lit("20240101"))
      .write.partitionBy("date").parquet(points)
    // the sidecar as a PRE-FIX writer left it: series a's hour-10
    // partial carries the marker — n over-counted, NaN-poisoned
    // min/max/sum, NULL decimal sum (what a non-filtering accumulation
    // produced before the stale-NaN filter landed)
    val clean = Streams.hourlyStatPartials(
      raw.filter(!isnan(col("value"))))
    val isBad = col("hour_start") === timestamp_micros(lit(h10)) &&
      col("name") === "cpu" && col("labels")("host") === "a"
    val poisoned = clean
      .withColumn("n", when(isBad, lit(3L)).otherwise(col("n")))
      .withColumn("sum_dec", when(isBad,
        lit(null).cast(clean.schema("sum_dec").dataType))
        .otherwise(col("sum_dec")))
      .withColumn("sum_v", when(isBad, lit(Double.NaN)).otherwise(col("sum_v")))
      .withColumn("min_v", when(isBad, lit(Double.NaN)).otherwise(col("min_v")))
      .withColumn("max_v", when(isBad, lit(Double.NaN)).otherwise(col("max_v")))
    poisoned.withColumn("date", date_format(col("hour_start"), "yyyyMMdd"))
      .write.partitionBy("date").parquet(rollup)
    def served = {
      val tiers = graft.promql.PromQL.tiersFromLayout(spark, rollup)
      graft.promql.PromQL.instantTierPlan(
        "avg_over_time(cpu[1h])", h10 + HourUs, tiers).get
        .collect().map(r => (r.getAs[Map[String, String]](1)("host"),
          // poison surfaces as NaN or NULL (null decimal sum / n)
          if (r.isNullAt(2)) Double.NaN else r.getDouble(2))).toMap
    }
    // poisoned sidecar serves a poisoned value for series a (the bug
    // being repaired); series b is clean
    assert(served("a").isNaN && served("b") == 4.0, served.toString)
    val n1 = Layout.repairRollupNaNPartition(spark, rollup, points, "20240101")
    assert(n1 > 0, "repair must rewrite the poisoned partition")
    // tier-served answers now hash-match the raw-path computation:
    // avg over the live samples only, other buckets untouched
    assert(served == Map("a" -> 3.0, "b" -> 4.0), served.toString)
    // the repaired partition is exactly the clean-from-birth partials
    val got = spark.read.parquet(rollup)
      .select("hour_start", "name", "series_key", "n", "sum_dec",
        "sum_v", "min_v", "max_v")
      .collect().map(_.toSeq).toSet
    val want = clean
      .select("hour_start", "name", "series_key", "n", "sum_dec",
        "sum_v", "min_v", "max_v")
      .collect().map(_.toSeq).toSet
    assert(got == want, s"got $got\nwant $want")
    // idempotent: a second run detects no poison and touches nothing
    val dir = new java.io.File(rollup, "date=20240101")
    val filesBefore = dir.listFiles().map(f => (f.getName, f.lastModified)).toSet
    assert(Layout.repairRollupNaNPartition(spark, rollup, points, "20240101") == 0)
    assert(dir.listFiles().map(f => (f.getName, f.lastModified)).toSet
      == filesBefore, "second run must be metadata-only")

    // poison ONLY in an include-excluded (unsettled) file: the probe
    // must read the same filtered set the rewrite merges — reporting
    // it repaired while the carry-over keeps it would both lie and
    // re-rewrite the partition on every later run
    val excluded = new java.io.File(dir, "b99-poison.parquet")
    val tmpOut = Files.createTempDirectory("graftnanexcl").toString
    poisoned.filter(isBad).coalesce(1).write.mode("overwrite").parquet(tmpOut)
    val part = new java.io.File(tmpOut).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.copy(part.toPath, excluded.toPath)
    val before2 = dir.listFiles().map(f => (f.getName, f.lastModified)).toSet
    assert(Layout.repairRollupNaNPartition(spark, rollup, points, "20240101",
      include = name => !name.startsWith("b99-")) == 0,
      "unsettled-only poison must not claim a repair")
    assert(dir.listFiles().map(f => (f.getName, f.lastModified)).toSet
      == before2, "unsettled-only poison must touch nothing")
  }

  test("compaction include predicate keeps unsettled batch files out of the merge, untouched") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graftinclude").toString
    val h10 = 1704103200000000L
    def commitBatch(id: Long, v: Double): Unit =
      Layout.commitBatch(dir, id) { staging =>
        Streams.hourlyStatPartials(
          Seq((h10 + 60000000L, "cpu", Map("host" -> "a"), v))
            .toDF("ts_us", "name", "labels", "value"))
          .withColumn("date", date_format(col("hour_start"), "yyyyMMdd"))
          .write.mode("overwrite").partitionBy("date").parquet(staging)
      }
    commitBatch(0, 2.0)
    commitBatch(1, 7.0) // "unsettled": its dependent commit is pending
    Layout.compactRollupPartition(spark, dir, "20240101",
      include = name => !name.startsWith("b1-"))
    val files = new java.io.File(dir, "date=20240101").listFiles()
      .map(_.getName).filter(_.endsWith(".parquet"))
    // b0 merged into an untagged file; b1 excluded and carried over AS IS
    assert(files.count(_.startsWith("b1-")) == 1, files.toSeq.toString)
    assert(files.count(!_.startsWith("b")) == 1, files.toSeq.toString)
    // reader equality: both batches' stats still present exactly once
    val merged = spark.read.parquet(dir)
      .groupBy("name").agg(sum("n").as("n"), sum("sum_v").as("s")).head()
    assert(merged.getAs[Long]("n") == 2L &&
      merged.getAs[Double]("s") == 9.0)
  }

  test("stale NaN markers never enter the stat sidecar (statTierChain invariant)") {
    import spark.implicits._
    val h10 = 1704103200000000L // 2024-01-01T10:00Z µs
    val out = Streams.hourlyStatPartials(
      Seq((h10 + 60000000L, "cpu", Map("host" -> "a"), 2.0),
        (h10 + 120000000L, "cpu", Map("host" -> "a"), Double.NaN),
        (h10 + 180000000L, "cpu", Map("host" -> "a"), 4.0))
        .toDF("ts_us", "name", "labels", "value")).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("n") == 2L) // NaN row excluded, not counted
    assert(r.getAs[Double]("max_v") == 4.0) // max not poisoned to NaN
    assert(r.getAs[Double]("sum_v") == 6.0)
  }

  test("recovery after a crash between swap and carry-over keeps late-committed batches (manifest-aware settle)") {
    import spark.implicits._
    // hand-built post-swap pre-settle state: the live partition holds
    // the compacted output plus the merged-input manifest; the
    // superseded aside dir still holds BOTH the merged input (b0) and
    // a late-committed batch (b1) the carry-over never reached. A
    // blind sweep would destroy b1's rows while its exactly-once
    // marker survives — silent loss.
    val root = Files.createTempDirectory("graftsettle").toString
    val h10 = 1704103200000000L
    def partials(v: Double) = Streams.hourlyStatPartials(
      Seq((h10 + 60000000L, "cpu", Map("host" -> "a"), v))
        .toDF("ts_us", "name", "labels", "value"))
    def onePartialFile(df: org.apache.spark.sql.DataFrame, dst: java.io.File): Unit = {
      val tmp = Files.createTempDirectory("graftsettletmp").toString
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val f = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      dst.getParentFile.mkdirs()
      assert(f.renameTo(dst))
    }
    onePartialFile(partials(2.0), new java.io.File(root, "date=20240101/part-merged.parquet"))
    java.nio.file.Files.write(
      new java.io.File(root, "date=20240101/_merged_inputs").toPath,
      "b0-in.parquet".getBytes("UTF-8"))
    onePartialFile(partials(2.0), new java.io.File(root, ".old.date=20240101/b0-in.parquet"))
    onePartialFile(partials(7.0), new java.io.File(root, ".old.date=20240101/b1-late.parquet"))
    val msgs = Layout.recoverCompactionLeftovers(root)
    assert(msgs.exists(_.contains("settled")), msgs.toString)
    val names = new java.io.File(root, "date=20240101").listFiles()
      .map(_.getName).toSet
    assert(names == Set("part-merged.parquet", "b1-late.parquet"),
      s"late batch must survive, merged input must not duplicate: $names")
    assert(!new java.io.File(root, ".old.date=20240101").exists())
    // reader equality: merged(2.0) + late(7.0), the b0 rows NOT doubled
    val vals = spark.read.parquet(root).select("sum_v").collect()
      .map(_.getDouble(0)).sorted.toSeq
    assert(vals == Seq(2.0, 7.0))
    // idempotent: a second sweep finds nothing to settle
    assert(Layout.recoverCompactionLeftovers(root)
      .forall(!_.contains("settled")))
  }

  test("compaction merges micro-batch files and restores the sort") {
    val dir = Files.createTempDirectory("graftcompact").toString
    val td = Testdata(spark, "/root/testdata/sf0.001")
    val logs = td.events.select(
      col("ts").as("ts_ns"),
      (col("user_id") % 5 * 4 + 1).cast("int").as("severity_number"),
      concat(lit("svc-"), col("user_id") % 4).as("service_name"),
      col("props").as("body"))
    // two micro-batches append two file sets per day partition
    Layout.writeLogs(logs.filter(col("severity_number") <= 9), dir)
    Layout.writeLogs(logs.filter(col("severity_number") > 9), dir, mode = "append")
    val part = new java.io.File(dir, "date=20240115")
    def files() = part.listFiles().count(_.getName.endsWith(".parquet"))
    assert(files() >= 2, "append should have produced multiple files")
    val before = spark.read.parquet(part.getPath)
      .select("severity_number", "service_name", "ts_ns")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).sorted.toSeq

    val n = Layout.compactPartition(spark, dir, "20240115",
      Seq("severity_number", "service_name", "ts_ns"))
    assert(n == 1 && files() == 1, s"expected one compacted file, got ${files()}")

    val after = spark.read.parquet(part.getPath)
      .select("severity_number", "service_name", "ts_ns")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    assert(after.sorted == before, "compaction must not change the data")
    assert(after == after.sorted, "compacted file must follow the ORDER BY")
    // the whole table still reads with partition discovery intact
    assert(spark.read.parquet(dir).filter(col("date") === "20240115").count()
      == before.size)
  }

  test("age-tiered downsample at compaction: old partitions roll up, recent stay raw, PromQL reads tiers transparently") {
    import graft.sources.StoragePolicy
    val root = Files.createTempDirectory("graftpolicy").toString
    val HourUs = 3600000000L
    // three days of two series (cpu{host=h1|h2}), 4 samples/hour
    def dayUs(date: String) = java.time.LocalDate.parse(date,
      java.time.format.DateTimeFormatter.ofPattern("yyyyMMdd"))
      .toEpochDay * 86400000000L
    val pts = (for {
      date <- Seq("20240101", "20240113", "20240115")
      host <- Seq("h1", "h2")
      hour <- 0 until 24; i <- 0 until 4
    } yield (dayUs(date) + hour * HourUs + i * 900000000L,
      "cpu", Map("host" -> host), (hour * 4 + i).toDouble))
      .toDF("ts_us", "name", "labels", "value")
    Layout.writePoints(pts, root)
    val policy = StoragePolicy.Policy(downsample = Seq(
      StoragePolicy.DownsampleTier(1, HourUs, "last"),
      StoragePolicy.DownsampleTier(7, 6 * HourUs, "avg")))
    Seq("20240101", "20240113", "20240115").foreach { d =>
      Layout.compactPointsPartition(spark, root, d, "20240115", policy): Unit
    }
    def day(date: String) = spark.read.parquet(s"$root/date=$date")
    // age 0: raw (96 samples per host)
    assert(day("20240115").count() == 192)
    // age 2 → 1h/last tier: 24 buckets per host, bucket-start ts,
    // value = last sample of the hour (hour*4 + 3)
    val mid = day("20240113")
      .select(element_at(col("labels"), "host"), col("ts_us"), col("value"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(mid.length == 48)
    assert(mid.forall { case (_, ts, _) => ts % HourUs == 0 })
    assert(mid.forall { case (_, ts, v) =>
      v == ((ts % 86400000000L) / HourUs * 4 + 3).toDouble })
    // age 14 → 6h/avg tier: 4 buckets per host
    val old = day("20240101")
      .select(col("ts_us"), col("value"))
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(old.length == 8)
    // avg over hours [h0,h0+6) of values hour*4+i: mean = (h0+2.5)*4 + 1.5
    assert(old.forall { case (ts, v) =>
      val h0 = (ts % 86400000000L) / HourUs
      ts % (6 * HourUs) == 0 && v == ((h0 + 2.5) * 4 + 1.5) })
    // the query path reads the tiered layout with NO changes: a PromQL
    // range over the downsampled day returns the representatives
    val stored = spark.read.parquet(root).select("ts_us", "name", "labels", "value")
    // window (17h, 23h] of the old day holds exactly the 18h-bucket
    // representative regardless of boundary inclusivity: (18+2.5)*4+1.5
    val evalTs = dayUs("20240101") + 23 * HourUs
    val got = graft.promql.PromQL.instant("max_over_time(cpu[6h])", stored, evalTs)
      .select("value").collect().map(_.getDouble(0)).toSeq
    assert(got == Seq(83.5, 83.5), s"expected the 6h-avg representatives, got $got")
  }

  test("precision tier truncates mantissa past the age threshold; cold partitions recompress") {
    import graft.functions.JKernels
    import graft.sources.StoragePolicy
    // kernel edges: NaN/Inf/zero pass through, powers of 2 exact,
    // round-to-nearest relative error <= 2^-(bits+1)
    assert(JKernels.truncateMantissa(Double.NaN, 8).isNaN)
    assert(JKernels.truncateMantissa(Double.PositiveInfinity, 8).isPosInfinity)
    assert(JKernels.truncateMantissa(0.0, 8) == 0.0)
    assert(JKernels.truncateMantissa(-4.0, 3) == -4.0)
    assert(JKernels.truncateMantissa(Double.MaxValue, 2) <= Double.MaxValue)
    for (bits <- Seq(4, 10, 20); v <- Seq(3.14159265358979, -123456.789, 1e-300, 7.0 / 3.0)) {
      val t = JKernels.truncateMantissa(v, bits)
      assert(math.abs(t - v) <= math.abs(v) * math.pow(2, -(bits + 1)) * 1.0000001,
        s"bits=$bits v=$v t=$t")
    }
    val root = Files.createTempDirectory("graftprec").toString
    // high-entropy values: hash-derived, deterministic
    val pts = (0 until 20000).map { i =>
      val h = scala.util.hashing.MurmurHash3.stringHash(s"v$i")
      (1704067200000000L + i * 1000000L, "gauge",
        Map("host" -> s"h${i % 4}"), 100.0 + (h & 0xffffff).toDouble / 1e4)
    }.toDF("ts_us", "name", "labels", "value")
    Layout.writePoints(pts, root)
    Layout.writePoints(pts.withColumn("ts_us", col("ts_us") + 14L * 86400000000L),
      root, mode = "append")
    val before = pts.select("value").collect().map(_.getDouble(0))
    def partFiles(d: String) = new java.io.File(root, s"date=$d").listFiles()
      .filter(_.getName.endsWith(".parquet"))
    val sizeBefore = partFiles("20240101").map(_.length()).sum
    val policy = StoragePolicy.Policy(
      precision = Seq(StoragePolicy.PrecisionTier(7, 10)),
      recompress = Some(StoragePolicy.Recompress(7, 19)))
    Seq("20240101", "20240115").foreach { d =>
      Layout.compactPointsPartition(spark, root, d, "20240115", policy): Unit
    }
    // old partition: bounded error, smaller files, zstd codec
    val after = spark.read.parquet(s"$root/date=20240101")
      .orderBy("ts_us").select("value").collect().map(_.getDouble(0))
    assert(after.length == before.length)
    before.sorted.zip(after.sorted).foreach { case (b, a) =>
      assert(math.abs(a - b) <= math.abs(b) * math.pow(2, -11) * 1.0000001)
    }
    assert(after.sorted.toSeq != before.sorted.toSeq,
      "10-bit mantissa must actually change high-entropy values")
    val sizeAfter = partFiles("20240101").map(_.length()).sum
    assert(sizeAfter < sizeBefore * 3 / 4,
      s"precision+zstd should shrink storage: $sizeBefore -> $sizeAfter")
    assert(partFiles("20240101").forall(_.getName.contains("zstd")),
      "cold partition must recompress with zstd")
    // recent partition: untouched values, hot-path codec
    val recent = spark.read.parquet(s"$root/date=20240115")
      .select("value").collect().map(_.getDouble(0))
    assert(recent.sorted.toSeq == before.sorted.toSeq,
      "recent partitions stay lossless")
    assert(partFiles("20240115").forall(!_.getName.contains("zstd")),
      "warm partitions keep the default codec")
  }

  test("cold log and span partitions recompress with zstd, lossless, blooms kept") {
    val dir = Files.createTempDirectory("graftcoldlogs").toString
    val td = Testdata(spark, "/root/testdata/sf0.001")
    val logs = td.events.select(
      col("ts").as("ts_ns"),
      (col("user_id") % 5 * 4 + 1).cast("int").as("severity_number"),
      concat(lit("svc-"), col("user_id") % 4).as("service_name"),
      col("props").as("body"),
      col("event_id").as("trace_id"))
    Layout.writeLogs(logs, dir)
    val policy = StoragePolicy.Policy(
      recompress = Some(StoragePolicy.Recompress(afterDays = 7, level = 19)))
    def part(d: String) = new java.io.File(dir, s"date=$d")
    def size(d: String) = part(d).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.length()).sum
    val before = spark.read.parquet(part("20240101").getPath)
      .select("ts_ns", "body").collect().map(r => (r.getLong(0), r.getString(1)))
      .sorted.toSeq
    val sizeBefore = size("20240101")
    // cold (14 days old): zstd rewrite, content identical
    Layout.compactLogsPartition(spark, dir, "20240101", "20240115", policy)
    val after = spark.read.parquet(part("20240101").getPath)
      .select("ts_ns", "body").collect().map(r => (r.getLong(0), r.getString(1)))
      .sorted.toSeq
    assert(after == before, "recompression must be lossless")
    assert(size("20240101") < sizeBefore,
      s"zstd-19 should shrink the cold partition: $sizeBefore -> ${size("20240101")}")
    assert(part("20240101").listFiles().filter(_.getName.endsWith(".parquet"))
      .forall(_.getName.contains("zstd")), "cold logs must carry the zstd codec")
    // warm (2 days old): compaction runs but keeps the hot-path codec
    Layout.compactLogsPartition(spark, dir, "20240114", "20240116", policy)
    assert(part("20240114").listFiles().filter(_.getName.endsWith(".parquet"))
      .forall(!_.getName.contains("zstd")), "warm logs keep the default codec")

    // spans: same recompress seam, parent_path survives the rewrite
    val sdir = Files.createTempDirectory("graftcoldspans").toString
    val spans = td.lineitem
      .filter(col("l_shipdate") >= "1995-01-02" && col("l_shipdate") < "1995-01-09")
      .select(
        col("l_orderkey").as("trace_id"),
        col("l_linenumber").as("span_id"),
        when(col("l_linenumber") > 1, floor(col("l_linenumber") / 2).cast("int"))
          .as("parent_span_id"),
        concat(lit("op-"), col("l_returnflag")).as("name"),
        (unix_timestamp(col("l_shipdate")) * 1000000000L).as("start_ns"))
    Layout.writeSpans(spans, sdir)
    val sdate = new java.io.File(sdir).listFiles()
      .map(_.getName).find(_.startsWith("date=")).get.stripPrefix("date=")
    val pathsBefore = spark.read.parquet(s"$sdir/date=$sdate")
      .select("trace_id", "span_id", "parent_path").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Long](2))).sortBy(t => (t._1, t._2)).toSeq
    Layout.compactSpansPartition(spark, sdir, sdate, "20240115", policy)
    val sFiles = new java.io.File(sdir, s"date=$sdate").listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(sFiles.forall(_.getName.contains("zstd")), "cold spans must recompress")
    val pathsAfter = spark.read.parquet(s"$sdir/date=$sdate")
      .select("trace_id", "span_id", "parent_path").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Long](2))).sortBy(t => (t._1, t._2)).toSeq
    assert(pathsAfter == pathsBefore, "parent_path must survive the rewrite")
  }

  test("ttl drops whole partitions past the horizon") {
    val root = Files.createTempDirectory("graftttl").toString
    Seq("20240101", "20240107", "20240110").foreach { d =>
      val f = new java.io.File(root, s"date=$d")
      assert(f.mkdirs())
      Files.writeString(f.toPath.resolve("part-0.parquet"), "x")
    }
    // horizon = 20240112 - 5d = 20240107; strictly-older drops
    val dropped = Layout.enforceTtl(root, keepDays = 5, nowDate = "20240112")
    assert(dropped == Seq("date=20240101"))
    val left = new java.io.File(root).listFiles().map(_.getName).sorted.toSeq
    assert(left == Seq("date=20240107", "date=20240110"))
  }

  test("bucketed span tables self-join with NO exchange") {
    val dir = Files.createTempDirectory("graftbuckets").toString
    val td = Testdata(spark, "/root/testdata/sf0.001")
    val spans = td.lineitem.select(
      col("l_orderkey").as("trace_id"),
      col("l_linenumber").as("span_id"),
      when(col("l_linenumber") > 1, floor(col("l_linenumber") / 2).cast("int"))
        .as("parent_span_id"),
      col("l_quantity").as("quantity"))
    Layout.writeSpansBucketed(spans, "spans_bucketed_spec", s"$dir/spans", buckets = 8)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force the sort-merge path: at 100 TB neither side broadcasts,
      // and bucketing is what removes the shuffle; subset-of-join-keys
      // co-partitioning needs requireAllClusterKeysForCoPartition=false
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.requireAllClusterKeysForCoPartition", "false")
      val t = spark.table("spans_bucketed_spec")
      val joined = t.alias("p").join(t.alias("c"),
        expr("p.trace_id = c.trace_id AND c.parent_span_id = p.span_id"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed structural join must be shuffle-free, got:\n$plan")
      assert(joined.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.conf.unset("spark.sql.requireAllClusterKeysForCoPartition")
      spark.sql("DROP TABLE IF EXISTS spans_bucketed_spec")
    }
  }

  test("detectLogFormat classifies json / logfmt / klog / raw") {
    val df = Seq(
      """{"level": "error", "msg": "boom", "k": 1}""",
      """level=warn msg="disk low" free=5GB""",
      """I0102 15:04:05.000000 1234 server.go:42] started ok""",
      """plain panic text"""
    ).toDF("body")
    val out = Streams.detectLogFormat(df)
      .select("detected_format", "detected_level", "msg")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(out(0) == ("json", "ERROR", "boom"))
    assert(out(1) == ("logfmt", "WARN", "disk low"))
    assert(out(2) == ("klog", "INFO", "started ok"))
    assert(out(3)._1 == "raw")
    assert(out(3)._2 == "FATAL") // deduced from 'panic'
  }

  test("detectLogFormat classifies zap development consoles") {
    val df = Seq(
      // file directly after level
      "2023-12-12T15:49:36.355+0300\tDEBUG\tlogparser/x_test.go:123\tIntruder alert\t{\"pin\": 1111}",
      // named logger, then file
      "2023-12-12T15:49:36.355+0300\tINFO\tnamed\tlogparser/x_test.go:129\tIntruder alert",
      "2023-12-12T15:49:36.355+0300\tDPANIC\tlogparser/x_test.go:1\tboom"
    ).toDF("body")
    val out = Streams.detectLogFormat(df)
      .select("detected_format", "detected_level", "msg")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(out(0) == ("zap-development", "DEBUG", "Intruder alert"))
    assert(out(1) == ("zap-development", "INFO", "Intruder alert"))
    assert(out(2) == ("zap-development", "FATAL", "boom"))
  }
}
