package graft.logql

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Kernels

/** label_replace / label_join shared by the LogQL and PromQL planners
  * (both languages expose them; reference logqlengine + vendored
  * engine). Pure label-map rewrites — no shuffle, stays in the
  * projection pipeline.
  */
object LabelFns {

  /** label_replace(v, dst, replacement, src, regex): dst set only when
    * regex matches the ENTIRE src value (Prometheus rule; RE2 shimmed).
    */
  def labelReplace(in: DataFrame, strs: Seq[String]): DataFrame = {
    val Seq(dst, repl, src, re) = strs
    val srcVal = coalesce(try_element_at(col("labels"), lit(src)), lit(""))
    val anchored = s"^(?:${Kernels.re2ToJava(re)})$$"
    val newVal = regexp_replace(srcVal, anchored, repl)
    // an empty expansion DROPS dst (Prometheus labels-builder rule)
    val without = map_filter(col("labels"), (k, _) => k =!= dst)
    in.withColumn("labels",
      when(srcVal.rlike(anchored),
        when(newVal === "", without)
          .otherwise(map_concat(without, map(lit(dst), newVal))))
        .otherwise(col("labels")))
  }

  /** label_join(v, dst, sep, src...): dst = src values joined by sep. */
  def labelJoin(in: DataFrame, strs: Seq[String]): DataFrame = {
    val dst = strs.head
    val sep = strs(1)
    val srcVals: Seq[Column] = strs.drop(2).map(s =>
      coalesce(try_element_at(col("labels"), lit(s)), lit("")))
    val joined = concat_ws(sep, srcVals: _*)
    // an empty joined value DROPS dst (same labels-builder rule as
    // label_replace)
    val without = map_filter(col("labels"), (k, _) => k =!= dst)
    in.withColumn("labels",
      when(joined === "", without)
        .otherwise(map_concat(without, map(lit(dst), joined))))
  }

  def apply(fn: String, in: DataFrame, strs: Seq[String]): DataFrame = fn match {
    case "label_replace" => labelReplace(in, strs)
    case "label_join"    => labelJoin(in, strs)
    case other => throw new IllegalArgumentException(s"label fn $other")
  }
}
