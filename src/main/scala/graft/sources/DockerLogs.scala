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
  * resolved container NAME, falling back to the directory's id),
  * `container_id`, and `stream` become stream labels, so the frame
  * drops straight into [[graft.logql.Planner.query]] — label
  * matchers, pipelines, metric queries, everything.
  *
  * Scale shape: spark.read.text splits per file; the unwrap is a
  * scan-fused projection (no shuffle), so a host's worth of container
  * logs reads at full parallelism and LogQL's own plan decides the
  * rest. Rotated `.log.N` files are included — LogQL's time bounds
  * prune them by content, matching the CLI's since/until params.
  */
object DockerLogs {

  /** Container metadata the daemon stores BESIDE each log file
    * (`<root>/<id>/config.v2.json`): the container NAME and image —
    * the static-layout stand-in for the CLI's daemon ContainerList
    * lookup (cmd/docker-logql resolves names through
    * internal/dockerlog getLabels: container = Names[0] minus the
    * leading "/"). One tiny JSON per container, parsed driver-side —
    * O(containers) work, never a Spark job.
    */
  private def containerMeta(root: String)
      : Map[String, (Option[String], Option[String])] = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    Option(new java.io.File(root).listFiles()).getOrElse(Array.empty)
      .filter(_.isDirectory)
      .flatMap { d =>
        val f = new java.io.File(d, "config.v2.json")
        if (!f.isFile) None
        else scala.util.Try {
          val node = mapper.readTree(f)
          def str(n: com.fasterxml.jackson.databind.JsonNode): Option[String] =
            Option(n).filter(_.isTextual).map(_.asText).filter(_.nonEmpty)
          val name = str(node.get("Name")).map(_.stripPrefix("/"))
          val image = str(Option(node.get("Config"))
            .map(_.get("Image")).orNull)
          d.getName -> (name, image)
        }.toOption // an unreadable config never fails the read
      }.toMap
  }

  /** One LogQL-ready frame (ts_ns, body, labels) from a docker
    * json-file log root. `containers` scopes by container NAME (exact,
    * resolved from `config.v2.json` when the daemon layout carries it —
    * the CLI's name filter) or by container-id prefix. Labels follow
    * the CLI's container label set where the static layout knows them
    * (dockerlog.go getLabels): `container` is the NAME (id when
    * unresolvable), `container_id` always, `container_name`/
    * `container_image` when resolved.
    */
  def read(spark: SparkSession, root: String,
      containers: Seq[String] = Nil): DataFrame = {
    val meta = containerMeta(root)
    val names = meta.collect { case (id, (Some(n), _)) => id -> n }
    val images = meta.collect { case (id, (_, Some(i))) => id -> i }
    val raw = spark.read.textFile(s"$root/*/*-json.log*").toDF("body")
      .withColumn("container",
        regexp_extract(input_file_name(), "([^/]+)-json\\.log", 1))
      .withColumn("ts_ns", lit(0L))
    val scoped =
      if (containers.isEmpty) raw
      else {
        val idsByName = names.collect {
          case (id, n) if containers.contains(n) => id
        }.toSeq
        val byId = containers.map(c => col("container").startsWith(c))
          .reduce(_ || _)
        raw.filter(
          if (idsByName.isEmpty) byId
          else byId || col("container").isin(idsByName: _*))
      }
    // vocabulary-sized literal maps (one entry per container on the
    // host) — resolution stays in the row projection, no join
    val nameOf = element_at(typedLit(names), col("container"))
    val imageOf = element_at(typedLit(images), col("container"))
    val labels = map_filter(map(
      lit("container"), coalesce(nameOf, col("container")),
      lit("container_id"), col("container"),
      lit("container_name"), nameOf,
      lit("container_image"), imageOf,
      lit("stream"), col("docker_stream")), (_, v) => v.isNotNull)
    graft.streaming.Streams.unwrapDockerLogs(scoped)
      .filter(col("docker_stream").isNotNull) // skip non-envelope junk
      .select(col("ts_ns"), col("body"), labels.as("labels"))
  }

  /** LogQL over a docker log root — the CLI's `docker-logql query`
    * in one call.
    */
  def query(spark: SparkSession, root: String, logql: String): DataFrame =
    graft.logql.Planner.query(logql, read(spark, root))
}
