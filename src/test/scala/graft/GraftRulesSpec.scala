package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions._

/** Optimizer-rule and Aggregator specs: severity predicate lowering
  * (injected Rule[LogicalPlan]) must rewrite derived-column predicates
  * into pushdown-able integer ranges; the exact-quantile Aggregator
  * must agree with the built-in exact percentile.
  */
class GraftRulesSpec extends SparkTestBase {
  import spark.implicits._

  test("severity_text predicate lowers to a pushed integer range") {
    val dir = Files.createTempDirectory("sevparquet").toString
    Seq((1, 17), (2, 18), (3, 9), (4, 21), (5, 0))
      .toDF("id", "severity_number")
      .write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir)
      .filter(severity_text(col("severity_number")) === "ERROR")
    val plan = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(plan.contains("GreaterThanOrEqual(severity_number,17)"),
      s"range not pushed to scan:\n$plan")
    assert(plan.contains("LessThanOrEqual(severity_number,20)"),
      s"range not pushed to scan:\n$plan")
    // the derived-text function must be gone from the filter entirely
    assert(!plan.contains("graft_severity_text"), "predicate was not lowered")
    assert(df.select("id").as[Int].collect().sorted.toSeq == Seq(1, 2))
  }

  test("UNKNOWN lowers to the complement range and stays correct") {
    val df = Seq(0, 1, 12, 24, 25, 99).toDF("severity_number")
      .filter(severity_text(col("severity_number")) === "UNKNOWN")
    assert(df.as[Int].collect().sorted.toSeq == Seq(0, 25, 99))
  }

  test("PromQuantileAgg matches exact percentile semantics") {
    import graft.functions.PromQuantileAgg
    val pq = udaf(new PromQuantileAgg(0.9))
    val df = Seq.tabulate(101)(i => ("g", i.toDouble)).toDF("g", "v")
    val got = df.groupBy("g").agg(pq(col("v")).as("q")).select("q").as[Double].head()
    val want = df.groupBy("g").agg(expr("percentile(v, 0.9D)").as("q"))
      .select("q").as[Double].head()
    assert(math.abs(got - want) < 1e-9, s"$got != $want")
    assert(got == 90.0)
  }
}
