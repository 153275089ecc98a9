package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.Registry
import graft.sources.Testdata

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * All real work lives in graft.queries.* packs; this object is only the
  * registry surface the driver calls.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Revenue per region: 5-table star join (broadcast dims) + aggregation.
    */
  def entry(spark: SparkSession): DataFrame = {
    val td = Testdata(spark, "/root/testdata/sf0.001")
    val dec = "decimal(18,4)"
    td.region
      .join(td.nation, col("r_regionkey") === col("n_regionkey"))
      .join(td.customer, col("n_nationkey") === col("c_nationkey"))
      .join(td.orders, col("c_custkey") === col("o_custkey"))
      .join(td.lineitem, col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("r_name"))
      .agg(
        sum(col("l_extendedprice").cast(dec) * (lit(1) - col("l_discount").cast(dec)))
          .cast("double").as("revenue"),
        count(lit(1)).as("n_items")
      )
      .orderBy(col("revenue").desc, col("r_name"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Registry.all.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted entries get a rows-only check.
    */
  def oracleSql: Map[String, String] =
    Registry.all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
