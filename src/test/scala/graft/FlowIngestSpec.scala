package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.{FlowIngest, Layout}

/** Hubble/Tetragon flow ingest (reference otelcolmod receivers): wire
  * JSON → typed log records → stored log layout → LogQL query.
  */
class FlowIngestSpec extends SparkTestBase {
  import spark.implicits._

  private val tcpFlow =
    """{"flow":{"time":"2024-01-05T10:00:00.5Z","verdict":"FORWARDED",
      |"type":"L3_L4","nodeName":"node-a","trafficDirection":"EGRESS",
      |"traceObservationPoint":"TO_ENDPOINT",
      |"source":{"namespace":"prod","podName":"web-1",
      |  "workloads":[{"name":"web","kind":"Deployment"}]},
      |"destination":{"namespace":"prod","podName":"db-0",
      |  "labels":["app=db"],"workloads":[{"name":"db","kind":"StatefulSet"}]},
      |"IP":{"source":"10.0.0.1","destination":"10.0.0.2","ipVersion":"IPv4"},
      |"l4":{"TCP":{"sourcePort":43210,"destinationPort":5432}},
      |"traceContext":{"parent":{"traceId":"4bf92f3577b34da6a3ce929d0e0e4736"}},
      |"interface":{"name":"eth0","index":3}}}""".stripMargin.replace("\n", "")

  private val droppedFlow =
    """{"flow":{"time":"2024-01-05T10:00:01Z","verdict":"DROPPED",
      |"type":"L3_L4","nodeName":"node-a","trafficDirection":"INGRESS",
      |"dropReasonDesc":"POLICY_DENIED","isReply":false,
      |"source":{"namespace":"prod","podName":"web-1"},
      |"destination":{"namespace":"prod","podName":"db-0"},
      |"IP":{"source":"10.0.0.9","destination":"10.0.0.2","ipVersion":"IPv4"},
      |"l4":{"UDP":{"sourcePort":9999,"destinationPort":53}}}}""".stripMargin
      .replace("\n", "")

  private val httpFlow =
    """{"flow":{"time":"2024-01-05T10:00:02Z","verdict":"FORWARDED",
      |"type":"L7","nodeName":"node-b",
      |"source":{"namespace":"prod","podName":"web-1"},
      |"destination":{"namespace":"prod","podName":"api-2"},
      |"l7":{"latencyNs":"250000",
      |  "http":{"method":"GET","url":"http://api/v1/x","code":503,
      |    "protocol":"HTTP/1.1"}}}}""".stripMargin.replace("\n", "")

  test("hubble flows translate to typed log records") {
    val out = FlowIngest.hubbleLogs(
      Seq(tcpFlow, droppedFlow, httpFlow).toDF("payload"))
      .orderBy("ts_ns").collect()
    assert(out.length == 3)
    val tcp = out(0)
    def attrs(r: org.apache.spark.sql.Row) =
      r.getMap[String, String](r.fieldIndex("attrs")).toMap
    def res(r: org.apache.spark.sql.Row) =
      r.getMap[String, String](r.fieldIndex("resource_attrs")).toMap
    assert(tcp.getLong(0) == 1704448800500000000L) // 10:00:00.5Z in ns
    assert(tcp.getString(tcp.fieldIndex("body")) == "Hubble L3_L4 flow FORWARDED")
    assert(tcp.getInt(tcp.fieldIndex("severity_number")) == 9)
    val ta = attrs(tcp)
    assert(ta("network.transport") == "tcp")
    assert(ta("network.source.port") == "43210")
    assert(ta("network.destination.port") == "5432")
    assert(ta("network.type") == "ipv4")
    assert(ta("hubble.dst.pod") == "db-0")
    assert(ta("hubble.dst.labels") == """["app=db"]""")
    assert(ta("hubble.src.workload.names") == """["web"]""")
    assert(ta("hubble.interface.index") == "3")
    assert(!ta.contains("hubble.drop_reason"))
    assert(tcp.getString(tcp.fieldIndex("trace_id_hex")) ==
      "4bf92f3577b34da6a3ce929d0e0e4736")
    assert(res(tcp) == Map("k8s.namespace.name" -> "prod",
      "k8s.pod.name" -> "web-1"))
    val drop = out(1)
    assert(drop.getInt(drop.fieldIndex("severity_number")) == 13)
    assert(drop.getString(drop.fieldIndex("severity_text")) == "WARN")
    assert(attrs(drop)("hubble.drop_reason") == "POLICY_DENIED")
    assert(attrs(drop)("hubble.is_reply") == "false")
    assert(attrs(drop)("network.transport") == "udp")
    val http = out(2)
    val ha = attrs(http)
    assert(ha("http.request.method") == "GET")
    assert(ha("http.response.status_code") == "503")
    assert(ha("network.protocol.name") == "http")
    assert(ha("hubble.l7.latency_ns") == "250000")
    assert(!ha.contains("network.transport"))
  }

  test("tetragon process events translate with parent-prefixed attrs") {
    val exec =
      """{"processExec":{"process":{"pid":4712,"binary":"/bin/sh",
        |"arguments":"-c ls","uid":1000,"execId":"a:1","cwd":"/app",
        |"pod":{"namespace":"prod","name":"web-1",
        |  "container":{"name":"main","image":{"id":"sha256:abc"}}}},
        |"parent":{"pid":4000,"binary":"/usr/bin/containerd"},
        |"ancestors":[{"pid":1,"binary":"/sbin/init"}]},
        |"nodeName":"node-a","time":"2024-01-05T10:00:00Z",
        |"clusterName":"c1"}""".stripMargin.replace("\n", "")
    val kprobe =
      """{"processKprobe":{"process":{"pid":4712,"binary":"/bin/sh"},
        |"functionName":"security_file_open"},
        |"nodeName":"node-a","time":"2024-01-05T10:00:01Z"}""".stripMargin
        .replace("\n", "")
    val out = FlowIngest.tetragonLogs(Seq(exec, kprobe).toDF("payload"))
      .orderBy("ts_ns").collect()
    assert(out.length == 2)
    def attrs(r: org.apache.spark.sql.Row) =
      r.getMap[String, String](r.fieldIndex("attrs")).toMap
    val e = out(0)
    assert(e.getString(e.fieldIndex("body")) == "Tetragon process exec event")
    assert(e.getInt(e.fieldIndex("severity_number")) == 9)
    val ea = attrs(e)
    assert(ea("event.name") == "process_exec")
    assert(ea("process.pid") == "4712")
    assert(ea("process.executable.path") == "/bin/sh")
    assert(ea("process.owner.id") == "1000")
    assert(ea("tetragon.parent.process.pid") == "4000")
    assert(ea("tetragon.parent.process.executable.path") == "/usr/bin/containerd")
    assert(ea("k8s.container.name") == "main")
    assert(ea("container.image.id") == "sha256:abc")
    assert(ea("tetragon.ancestors_json").contains("/sbin/init"))
    val rm = e.getMap[String, String](e.fieldIndex("resource_attrs")).toMap
    assert(rm("k8s.cluster.name") == "c1")
    val k = out(1)
    assert(k.getInt(k.fieldIndex("severity_number")) == 5) // DEBUG
    assert(attrs(k)("event.name") == "process_kprobe")
    assert(attrs(k)("tetragon.kprobe.function_name") == "security_file_open")
    assert(!attrs(k).contains("tetragon.parent.process.pid"))
  }

  test("flows land in the log layout and answer LogQL") {
    val dir = Files.createTempDirectory("graftflows").toString
    val logs = FlowIngest.hubbleLogs(
      Seq(tcpFlow, droppedFlow, httpFlow).toDF("payload"))
      .withColumn("service_name",
        coalesce(element_at(col("resource_attrs"), "k8s.pod.name"),
          lit("unknown_service")))
    Layout.writeLogs(logs, dir)
    val stored = spark.read.parquet(dir)
    assert(stored.count() == 3)
    // LogQL over the stored flow records: verdict as a stream label
    val lv = stored.select(col("ts_ns"), col("body"), map(
      lit("verdict"), element_at(col("attrs"), "hubble.verdict"),
      lit("pod"), element_at(col("resource_attrs"), "k8s.pod.name"))
      .as("labels"))
    val dropped = graft.logql.Planner.query(
      """{pod="web-1"} |= "flow" | verdict = "DROPPED"""", lv)
    assert(dropped.count() == 1)
    assert(dropped.select("body").head().getString(0) ==
      "Hubble L3_L4 flow DROPPED")
  }
}
