package graft

import org.apache.spark.sql.functions._

import graft.sources.DockerLogs

/** docker-logql surface: LogQL straight over a docker json-file log
  * root (reference cmd/docker-logql + internal/dockerlog).
  */
class DockerLogsSpec extends SparkTestBase {

  private def writeLayout(): String = {
    val root = java.nio.file.Files.createTempDirectory("graft-docker").toString
    def writeLog(id: String, lines: Seq[String], suffix: String = ""): Unit = {
      val dir = new java.io.File(root, id)
      dir.mkdirs()
      java.nio.file.Files.write(
        new java.io.File(dir, s"$id-json.log$suffix").toPath,
        lines.mkString("", "\n", "\n").getBytes("UTF-8"))
    }
    def env(line: String, stream: String, sec: Int): String =
      s"""{"log":"$line\\n","stream":"$stream","time":"2024-01-01T10:00:0$sec.000000Z"}"""
    writeLog("aaa111", Seq(
      env("GET /health 200", "stdout", 1),
      env("error: db timeout", "stderr", 2)))
    // rotated file: older lines of the same container are included
    writeLog("aaa111", Seq(env("boot ok", "stdout", 0)), suffix = ".1")
    writeLog("bbb222", Seq(env("error: other svc", "stderr", 3)))
    root
  }

  test("read: envelopes unwrap to labeled LogQL-ready records, rotation included") {
    val root = writeLayout()
    val rows = DockerLogs.read(spark, root)
      .orderBy("ts_ns")
      .collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getMap[String, String](2)(("container")), r.getMap[String, String](2)(("stream"))))
    assert(rows.length == 4)
    assert(rows.head == (1704103200000000000L, "boot ok", "aaa111", "stdout"))
    assert(rows.map(_._2).toSet ==
      Set("boot ok", "GET /health 200", "error: db timeout", "error: other svc"))
    // container-id prefix filter (the CLI's container scoping)
    assert(DockerLogs.read(spark, root, Seq("bbb")).count() == 1)
  }

  test("query: selectors, pipelines, and metric queries run over the layout") {
    val root = writeLayout()
    // stream selector + line filter, exactly the CLI's core flow
    val errs = DockerLogs.query(spark, root,
      """{container="aaa111"} |= "error"""")
      .select("body").collect().map(_.getString(0))
    assert(errs.toSeq == Seq("error: db timeout"))
    // labels are real stream labels: metric query grouped by stream
    val counts = DockerLogs.query(spark, root,
      """sum by (stream) (count_over_time({container=~"(aaa|bbb).*"} [1h]))""")
      .select(element_at(col("labels"), "stream").as("s"), col("value"))
      .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
    assert(counts == Map("stdout" -> 2.0, "stderr" -> 2.0))
  }

  test("config.v2.json resolves container names: name scoping, name labels, id fallback") {
    val root = writeLayout()
    // the daemon writes config.v2.json beside the log file; aaa111
    // gets one (name "web", image "nginx:1.25"), bbb222 stays bare
    java.nio.file.Files.write(
      new java.io.File(new java.io.File(root, "aaa111"), "config.v2.json").toPath,
      ("""{"ID":"aaa111","Name":"/web",""" +
        """"Config":{"Image":"nginx:1.25","Env":[]},"State":{}}""").getBytes("UTF-8"))
    val rows = DockerLogs.read(spark, root).collect()
      .map(r => r.getMap[String, String](2))
    val web = rows.filter(_.get("container_id").contains("aaa111"))
    assert(web.nonEmpty)
    // the CLI's label set (dockerlog.go getLabels): container = NAME
    assert(web.forall(_.get("container").contains("web")))
    assert(web.forall(_.get("container_name").contains("web")))
    assert(web.forall(_.get("container_image").contains("nginx:1.25")))
    // unresolvable container: id fallback, no name/image labels
    val bare = rows.filter(_.get("container_id").contains("bbb222"))
    assert(bare.forall(_.get("container").contains("bbb222")))
    assert(bare.forall(m => m.get("container_name").isEmpty &&
      m.get("container_image").isEmpty))
    // containers= matches the NAME like the CLI (id prefixes still work)
    assert(DockerLogs.read(spark, root, Seq("web")).count() == 3)
    assert(DockerLogs.read(spark, root, Seq("bbb")).count() == 1)
    // and LogQL selects by the name label end-to-end
    val errs = DockerLogs.query(spark, root,
      """{container="web"} |= "error"""")
      .select("body").collect().map(_.getString(0))
    assert(errs.toSeq == Seq("error: db timeout"))
  }
}
