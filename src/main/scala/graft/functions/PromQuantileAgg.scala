package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

import scala.collection.mutable.ArrayBuffer

/** Exact Prometheus quantile as a typed Aggregator[IN, BUF, OUT]
  * (SURVEY.md §2.6: exact quantile must NOT be percentile_approx) —
  * linear interpolation between order statistics, the formula of
  * reference internal/logql/logqlmetric/prom_math.go:120-147.
  *
  * Buffer holds the window's samples (exact quantiles are not
  * mergeable-in-constant-space); bounded by the range-window sample
  * count, which the reference also materializes per window. For
  * unbounded windows use percentile_approx instead.
  *
  * Usage: `udaf(new PromQuantileAgg(0.9)).apply(col)` or register via
  * `spark.udf.register("prom_quantile_90", udaf(new PromQuantileAgg(0.9)))`.
  */
class PromQuantileAgg(q: Double)
    extends Aggregator[Double, ArrayBuffer[Double], Double] {

  override def zero: ArrayBuffer[Double] = ArrayBuffer.empty

  override def reduce(b: ArrayBuffer[Double], a: Double): ArrayBuffer[Double] = {
    b += a; b
  }

  override def merge(b1: ArrayBuffer[Double], b2: ArrayBuffer[Double]): ArrayBuffer[Double] = {
    b1 ++= b2; b1
  }

  override def finish(b: ArrayBuffer[Double]): Double =
    Kernels.promQuantile(q, b.toArray)

  override def bufferEncoder: Encoder[ArrayBuffer[Double]] =
    Encoders.kryo[ArrayBuffer[Double]]

  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
