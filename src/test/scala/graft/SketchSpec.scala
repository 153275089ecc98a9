package graft

import org.apache.spark.sql.functions._

/** Mergeable-sketch semantics behind `pipe_distinct_sketch`: the HLL
  * estimates stay within error bounds of the exact counts, and the
  * union of shard sketches answers exactly like one sketch over the
  * whole corpus — the property that lets 100 TB distinct counting move
  * only KB-sized sketches.
  */
class SketchSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val docs = (0 until 3000)
    .map(i => (s"src${i % 7}", s"doc body number ${i % 2311}"))
    .toDF("source", "text")

  test("per-shard estimates stay within 2% of exact") {
    val rows = docs.groupBy($"source")
      .agg(hll_sketch_agg($"text").as("sk"), countDistinct($"text").as("exact"))
      .select($"exact", hll_sketch_estimate($"sk").as("est"))
      .as[(Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (exact, est) =>
      assert(math.abs(est - exact) / exact.toDouble <= 0.02,
        s"estimate $est vs exact $exact")
    }
  }

  test("union of shard sketches == one sketch over the whole corpus") {
    val merged = docs.groupBy($"source")
      .agg(hll_sketch_agg($"text").as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg($"sk")).as("est"))
      .as[Double].head()
    val direct = docs
      .agg(hll_sketch_estimate(hll_sketch_agg($"text")).as("est"))
      .as[Double].head()
    assert(merged == direct, s"merged $merged vs direct $direct")
    val exact = docs.agg(countDistinct($"text")).as[Long].head()
    assert(math.abs(merged - exact) / exact.toDouble <= 0.02)
  }
}
