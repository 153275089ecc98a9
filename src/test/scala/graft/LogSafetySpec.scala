package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.streaming.LogSafety

/** Excess-log safety (reference internal/odbsafety): per-mode batch
  * semantics — rate regimes, sampler rule, compact buckets + synthetic
  * collapsed records, truncation windows, passthrough/safety-record
  * bypass, redaction — against hand-computed expectations.
  */
class LogSafetySpec extends SparkTestBase {
  import spark.implicits._

  private val S = 1000000000L // 1s in ns

  /** n records in the same event-time second, 10 ms apart, svc label. */
  private def burst(sec: Long, n: Int, svc: String = "a",
      body: String = "msg"): Seq[(Long, String, Map[String, String])] =
    (0 until n).map(i =>
      (sec * S + i * 10000000L, s"$body-$i", Map("svc" -> svc)))

  private def df(rows: Seq[(Long, String, Map[String, String])]): DataFrame =
    rows.toDF("ts_ns", "body", "attrs")

  private def bodies(out: DataFrame): Seq[String] =
    out.select("body").collect().map(_.getString(0)).sorted.toSeq

  test("nothing configured: records pass through untouched") {
    val in = df(burst(0, 5))
    val out = LogSafety(in, LogSafety.Config())
    assert(out.collect().toSet == in.collect().toSet)
  }

  test("drop mode sheds everything past the soft limit") {
    val out = LogSafety(df(burst(0, 5)),
      LogSafety.Config(softMaxRatePerSecond = 3, onExcess = "drop"))
    assert(bodies(out) == Seq("msg-0", "msg-1", "msg-2"))
  }

  test("sample mode: first-N then 1-in-M on the excess ordinal") {
    // soft=2: excess ordinals 1..6 for msg-2..msg-7; first=1 keeps o=1,
    // thereafter=2 keeps o=2,4,6 → msg-2,3,5,7 survive the excess
    val out = LogSafety(df(burst(0, 8)),
      LogSafety.Config(softMaxRatePerSecond = 2, onExcess = "sample",
        sampleFirst = 1, sampleThereafter = 2))
    assert(bodies(out) == Seq("msg-0", "msg-1", "msg-2", "msg-3", "msg-5", "msg-7"))
  }

  test("hard limit escalates past the soft mode") {
    // soft=2 sample(first=1, M=0): o=1 kept, o=2 dropped; hard=4 drop:
    // pos 5..7 dropped
    val out = LogSafety(df(burst(0, 7)),
      LogSafety.Config(softMaxRatePerSecond = 2, hardMaxRatePerSecond = 4,
        onExcess = "sample", hardOnExcess = "drop",
        sampleFirst = 1, sampleThereafter = 0))
    assert(bodies(out) == Seq("msg-0", "msg-1", "msg-2"))
    val d = LogSafety.decisions(df(burst(0, 7)),
      LogSafety.Config(softMaxRatePerSecond = 2, hardMaxRatePerSecond = 4,
        onExcess = "sample", hardOnExcess = "drop",
        sampleFirst = 1, sampleThereafter = 0))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(d == Map("sampled" -> 1L, "dropped_sample" -> 1L,
      "dropped_rate_limit" -> 3L))
  }

  test("rate windows are per key when keyFields is set, per second always") {
    val rows = burst(0, 3, svc = "a") ++ burst(0, 3, svc = "b") ++
      burst(1, 3, svc = "a")
    val cfg = LogSafety.Config(softMaxRatePerSecond = 2, onExcess = "drop",
      keyFields = Seq("svc"))
    // each (key, second) admits 2: 6 of 9 survive
    assert(LogSafety(df(rows), cfg).count() == 6)
    // global window (no keyFields): second 0 has 6 records, admits 2
    val global = cfg.copy(keyFields = Nil)
    assert(LogSafety(df(rows), global).count() == 4)
  }

  test("passthrough records count toward the rate but are never shed") {
    val rows = Seq(
      (0L, "a", Map.empty[String, String]),
      (10000000L, "b", Map(LogSafety.PassthroughAttr -> "true")),
      (20000000L, "c", Map.empty[String, String]))
    val out = LogSafety(df(rows),
      LogSafety.Config(softMaxRatePerSecond = 1, onExcess = "drop"))
    // b is pos 2 (counted, excess, passthrough → kept); c is pos 3 → dropped
    assert(bodies(out) == Seq("a", "b"))
  }

  test("safety records bypass counting, handling, and redaction") {
    val rows = Seq(
      (0L, "syn", Map(LogSafety.CollapsedAttr -> "5", "secret" -> "x")),
      (10000000L, "a", Map("secret" -> "x")),
      (20000000L, "b", Map.empty[String, String]))
    val out = LogSafety(df(rows),
      LogSafety.Config(softMaxRatePerSecond = 1, onExcess = "drop",
        redactFields = Seq("secret")))
    // syn not counted: a is pos 1 (kept, redacted), b pos 2 dropped
    val got = out.collect().map(r =>
      (r.getString(1), r.getMap[String, String](2).toMap)).toSet
    assert(got == Set(
      ("syn", Map(LogSafety.CollapsedAttr -> "5", "secret" -> "x")),
      ("a", Map("secret" -> LogSafety.Redacted))))
  }

  test("KEYED fused path: safety bypass, redaction, and rate counting match the global rules") {
    // same shape as the global bypass test but keyed — exercises
    // decideFused's conditional ordinals and in-pipeline safety arm
    val rows = Seq(
      (0L, "syn", Map(LogSafety.CollapsedAttr -> "5", "secret" -> "x", "svc" -> "a")),
      (10000000L, "a", Map("secret" -> "x", "svc" -> "a")),
      (20000000L, "b", Map("svc" -> "a")),
      (30000000L, "other", Map("secret" -> "y", "svc" -> "b")))
    val out = LogSafety(df(rows),
      LogSafety.Config(softMaxRatePerSecond = 1, onExcess = "drop",
        keyFields = Seq("svc"), redactFields = Seq("secret")))
    val got = out.collect().map(r =>
      (r.getString(1), r.getMap[String, String](2).toMap)).toSet
    // syn bypasses the svc=a count AND redaction; a is pos 1 in svc=a
    // (kept, redacted); b pos 2 dropped; svc=b's own budget keeps other
    assert(got == Set(
      ("syn", Map(LogSafety.CollapsedAttr -> "5", "secret" -> "x", "svc" -> "a")),
      ("a", Map("secret" -> LogSafety.Redacted, "svc" -> "a")),
      ("other", Map("secret" -> LogSafety.Redacted, "svc" -> "b"))))
  }

  test("compact: threshold keeps the bucket head, drops collapse into one synthetic") {
    // soft=1: pos 2..6 route to compact, all same body-key? bodies
    // differ, so key by svc via keyFields
    val out = LogSafety(df(burst(0, 6)),
      LogSafety.Config(softMaxRatePerSecond = 1, onExcess = "compact",
        compactWindowNs = 10 * S, compactThreshold = 3,
        keyFields = Seq("svc")))
    // kept: msg-0 (consume), msg-1, msg-2 (bucket counts 1, 2 < 3);
    // msg-3..5 collapse; synthetic clones bucket head msg-1 with count 3
    val syn = out.filter(map_contains_key(col("attrs"), LogSafety.CollapsedAttr))
      .collect()
    assert(syn.length == 1)
    assert(syn.head.getString(1) == "msg-1")
    assert(syn.head.getMap[String, String](2)(LogSafety.CollapsedAttr) == "3")
    assert(bodies(out) == Seq("msg-0", "msg-1", "msg-1", "msg-2"))
  }

  test("compact escalates to the truncation window past truncateThreshold") {
    val out = LogSafety(df(burst(0, 8)),
      LogSafety.Config(softMaxRatePerSecond = 1, onExcess = "compact",
        compactWindowNs = 10 * S, compactThreshold = 2,
        truncateThreshold = 4, keyFields = Seq("svc")))
    // pos 2..8 compact, co=1 kept; co=2..4 collapse (3); co=5..7 (> 4)
    // truncate: synthetic "<output is truncated>" with count 3
    val syn = out.filter(map_contains_key(col("attrs"), LogSafety.TruncatedAttr))
      .collect()
    assert(syn.length == 1)
    assert(syn.head.getString(1) == LogSafety.TruncatedBody)
    val attrs = syn.head.getMap[String, String](2)
    assert(attrs(LogSafety.TruncatedAttr) == "3")
    assert(attrs(LogSafety.WindowStartAttr) == "0")
    assert(attrs(LogSafety.WindowEndAttr) == (10 * S).toString)
    val coll = out.filter(map_contains_key(col("attrs"), LogSafety.CollapsedAttr))
      .collect()
    assert(coll.length == 1 &&
      coll.head.getMap[String, String](2)(LogSafety.CollapsedAttr) == "3")
  }

  test("truncate mode drops the window and emits one synthetic per slot") {
    val rows = burst(0, 4) ++ burst(20, 3) // two 10s slots
    val out = LogSafety(df(rows),
      LogSafety.Config(softMaxRatePerSecond = 2, onExcess = "truncate",
        compactWindowNs = 10 * S))
    val syn = out.filter(map_contains_key(col("attrs"), LogSafety.TruncatedAttr))
      .collect().map(r => (r.getLong(0),
        r.getMap[String, String](2)(LogSafety.TruncatedAttr)))
      .sortBy(_._1).toSeq
    // slot 0: msg-2, msg-3 truncated (first = msg-2 at 20ms);
    // slot 20s: msg-2 truncated
    assert(syn == Seq((20000000L, "2"), (20 * S + 20000000L, "1")))
    assert(out.count() == 6) // 2+2 kept + 2 synthetics
  }

  test("bucket cap: later body-keyed buckets fall back to the sample rule") {
    // the cap binds in the reference's config space: GLOBAL rate key,
    // buckets keyed by body (keyFields empty). Three repeated bodies
    // interleave in one second; cap=2 admits the first two bodies'
    // buckets, the third body's excess takes the sampler
    val rows = (0 until 12).map(i =>
      (i * 10000000L, "b" + (i % 3), Map.empty[String, String]))
    val out = LogSafety(df(rows),
      LogSafety.Config(softMaxRatePerSecond = 1, onExcess = "compact",
        compactWindowNs = 10 * S, compactThreshold = 10,
        compactMaxBuckets = 2, sampleFirst = 1, sampleThereafter = 0))
    val perBody = out.filter(!map_contains_key(col("attrs"), LogSafety.CollapsedAttr))
      .groupBy("body").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // pos1 = b0@0 consumes; buckets first-seen b1@10ms, b2@20ms fill the
    // cap; b0's compact-routed records rank over-cap → sample rule with
    // first=1 keeps none (their excess ordinals are 3, 6, 9)
    assert(perBody == Map("b0" -> 1L, "b1" -> 4L, "b2" -> 4L))
    // with a per-key config the cap cannot bind (one bucket per scope,
    // matching the streaming gate's state key): everything under
    // threshold survives
    val keyed = LogSafety(df(burst(0, 4, svc = "a") ++
        burst(0, 4, svc = "b").map(t => t.copy(_1 = t._1 + 1000000L))),
      LogSafety.Config(softMaxRatePerSecond = 1, onExcess = "compact",
        compactWindowNs = 10 * S, compactThreshold = 10,
        compactMaxBuckets = 1, keyFields = Seq("svc")))
    assert(keyed.count() == 8)
  }

  test("keyed truncate scopes windows per key: one synthetic each") {
    val rows = burst(0, 3, svc = "a") ++
      burst(0, 3, svc = "b").map(t => t.copy(_1 = t._1 + 1000000L))
    val out = LogSafety(df(rows),
      LogSafety.Config(softMaxRatePerSecond = 1, onExcess = "truncate",
        compactWindowNs = 10 * S, keyFields = Seq("svc")))
    val syn = out.filter(map_contains_key(col("attrs"), LogSafety.TruncatedAttr))
      .collect().map(r => (r.getMap[String, String](2)("svc"),
        r.getMap[String, String](2)(LogSafety.TruncatedAttr))).sorted.toSeq
    // each key's window drops its OWN 2 excess records — counts are not
    // merged across keys (matches the streaming gate's per-key state)
    assert(syn == Seq(("a", "2"), ("b", "2")))
  }

  test("crafted attrs don't poison synthetics: window-attr collisions overwrite") {
    // records already carrying oteldb.window_start (but NO count key,
    // so not safety records) route to truncate; the synthetic's values
    // must win instead of map_concat throwing on the duplicate
    val rows = Seq(
      (0L, "a", Map(LogSafety.WindowStartAttr -> "bogus")),
      (10000000L, "b", Map(LogSafety.WindowStartAttr -> "bogus")),
      (20000000L, "c", Map(LogSafety.WindowStartAttr -> "bogus")))
    val out = LogSafety(df(rows),
      LogSafety.Config(softMaxRatePerSecond = 1, onExcess = "truncate",
        compactWindowNs = 10 * S))
    val syn = out.filter(map_contains_key(col("attrs"), LogSafety.TruncatedAttr))
      .collect()
    assert(syn.length == 1)
    assert(syn.head.getMap[String, String](2)(LogSafety.WindowStartAttr) == "0")
  }

  test("config validation mirrors the reference") {
    intercept[IllegalArgumentException](
      LogSafety.Config(softMaxRatePerSecond = -1).validate())
    intercept[IllegalArgumentException](
      LogSafety.Config(onExcess = "explode").validate())
    intercept[IllegalArgumentException](
      LogSafety.Config(onExcess = "compact", compactThreshold = 0,
        softMaxRatePerSecond = 1).validate())
    intercept[IllegalArgumentException](
      LogSafety.Config(onExcess = "truncate", compactWindowNs = 0,
        softMaxRatePerSecond = 1).validate())
    LogSafety.Config().validate()
  }
}
