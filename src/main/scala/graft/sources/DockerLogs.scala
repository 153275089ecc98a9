package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Docker container logs as a LogQL source — the query surface of the
  * reference's `docker-logql` dev CLI (cmd/docker-logql/query.go +
  * internal/dockerlog): run LogQL over the logs docker / docker-compose
  * already wrote, no ingest pipeline required.
  *
  * The CLI reads live containers through the daemon API; the
  * Spark-native equivalent reads the daemon's on-disk json-file layout
  * (`<root>/<container-id>/<container-id>-json.log[.N]`, one
  * {"log","stream","time"} envelope per line — the same triple the
  * daemon-stream parser labels entries with, dockerlog/daemonlog.go:
  * 112-129). Each line unwraps via
  * [[graft.streaming.Streams.unwrapDockerLogs]]; `container` (the
  * directory's container id) and `stream` become stream labels, so the
  * frame drops straight into [[graft.logql.Planner.query]] — label
  * matchers, pipelines, metric queries, everything.
  *
  * Scale shape: spark.read.text splits per file; the unwrap is a
  * scan-fused projection (no shuffle), so a host's worth of container
  * logs reads at full parallelism and LogQL's own plan decides the
  * rest. Rotated `.log.N` files are included — LogQL's time bounds
  * prune them by content, matching the CLI's since/until params.
  */
object DockerLogs {

  /** One LogQL-ready frame (ts_ns, body, labels) from a docker
    * json-file log root. `containers` filters by container-id prefix
    * (the CLI's name filter resolves names via the daemon; ids are
    * what the static layout has).
    */
  def read(spark: SparkSession, root: String,
      containers: Seq[String] = Nil): DataFrame = {
    val raw = spark.read.textFile(s"$root/*/*-json.log*").toDF("body")
      .withColumn("container",
        regexp_extract(input_file_name(), "([^/]+)-json\\.log", 1))
      .withColumn("ts_ns", lit(0L))
    val scoped =
      if (containers.isEmpty) raw
      else raw.filter(containers.map(c => col("container").startsWith(c))
        .reduce(_ || _))
    graft.streaming.Streams.unwrapDockerLogs(scoped)
      .filter(col("docker_stream").isNotNull) // skip non-envelope junk
      .select(col("ts_ns"), col("body"),
        map(lit("container"), col("container"),
          lit("stream"), col("docker_stream")).as("labels"))
  }

  /** LogQL over a docker log root — the CLI's `docker-logql query`
    * in one call.
    */
  def query(spark: SparkSession, root: String, logql: String): DataFrame =
    graft.logql.Planner.query(logql, read(spark, root))
}
