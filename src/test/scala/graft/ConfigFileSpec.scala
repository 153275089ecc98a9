package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.api.Auth
import graft.util.MiniYaml

/** `--config serve.yml` (reference cmd/oteldb/config.go: one YAML file
  * carrying the whole knob surface): the YAML-subset parser, strict
  * unknown-key validation, flag-over-file precedence, and auth
  * sections from the file.
  */
class ConfigFileSpec extends AnyFunSuite {

  private def write(content: String): String = {
    val f = Files.createTempFile("graft-cfg", ".yml")
    Files.write(f, content.getBytes("UTF-8"))
    f.toFile.deleteOnExit()
    f.toString
  }

  test("MiniYaml parses maps, lists, nesting, quoting, comments") {
    val v = MiniYaml.parse(
      """# top comment
        |retention_days: 30
        |downsample: "7:60:last,30:3600:avg"   # trailing comment
        |auth:
        |  - type: bearertoken
        |    tokens:
        |      - token: abc
        |      - token_file: /run/secret
        |  - type: basicauth
        |    users:
        |      - user: alice
        |        password: 'it''s #secret'
        |query:
        |  auth:
        |    - type: bearertoken
        |      tokens:
        |        - token: "q #1"
        |""".stripMargin).asInstanceOf[Map[String, Any]]
    assert(v("retention_days") == "30")
    assert(v("downsample") == "7:60:last,30:3600:avg")
    val auth = v("auth").asInstanceOf[List[Map[String, Any]]]
    assert(auth.map(_("type")) == List("bearertoken", "basicauth"))
    assert(auth.head("tokens").asInstanceOf[List[Map[String, Any]]] ==
      List(Map("token" -> "abc"), Map("token_file" -> "/run/secret")))
    assert(auth(1)("users").asInstanceOf[List[Map[String, Any]]] ==
      List(Map("user" -> "alice", "password" -> "it's #secret")))
    val q = v("query").asInstanceOf[Map[String, Any]]
    val qa = q("auth").asInstanceOf[List[Map[String, Any]]]
    assert(qa.head("tokens").asInstanceOf[List[Map[String, Any]]] ==
      List(Map("token" -> "q #1")))
  }

  test("MiniYaml rejects tabs, bad indents, duplicate keys, ambiguous scalars") {
    intercept[MiniYaml.ParseError](MiniYaml.parse("a:\n\tb: 1"))
    intercept[MiniYaml.ParseError](MiniYaml.parse("a: 1\n   stray"))
    intercept[MiniYaml.ParseError](MiniYaml.parse("a: 1\na: 2"))
    // an unquoted value containing ': ' is ambiguous — quote it
    intercept[MiniYaml.ParseError](MiniYaml.parse("a: b: c"))
    assert(MiniYaml.parse("") == Map.empty[String, Any])
  }

  test("config file reaches every knob; flags win over the file") {
    val path = write(
      """retention_days: 30
        |maintain_every_min: 60
        |ingest_bytes_per_second: 1048576
        |max_series: 1000
        |downsample: "7:60:last"
        |safety: "100:1000:sample:drop"
        |max_result_rows: 5000
        |max_execution_ms: 2000
        |max_concurrent_queries: 4
        |queue_depth: 8
        |auth:
        |  - type: bearertoken
        |    tokens:
        |      - token: filetok
        |admin:
        |  auth:
        |    - type: bearertoken
        |      tokens:
        |        - token: opstok
        |""".stripMargin)
    val cfg = Serve.parseConfig("/data", Seq("/data", "--config", path))
    assert(cfg.retentionDays == 30 && cfg.maintainEveryMs == 3600000L)
    assert(cfg.limits.ingestBytesPerSecond == 1048576L)
    assert(cfg.limits.maxSeries == 1000L)
    assert(cfg.storagePolicy.get.downsample ==
      Seq(graft.sources.StoragePolicy.DownsampleTier(7, 60000000L, "last")))
    assert(cfg.logSafety.get.softMaxRatePerSecond == 100)
    assert(cfg.resultLimits.maxSampleRows == 5000L)
    assert(cfg.resultLimits.maxExecutionMs == 2000L)
    assert(cfg.resultLimits.maxConcurrentQueries == 4)
    assert(cfg.resultLimits.queueDepth == 8)
    assert(cfg.auth ==
      Seq(Auth.AuthConfig("bearertoken", Seq(Auth.Token("filetok")))))
    assert(cfg.adminAuth ==
      Some(Seq(Auth.AuthConfig("bearertoken", Seq(Auth.Token("opstok"))))))
    assert(cfg.queryAuth.isEmpty && cfg.ingestAuth.isEmpty)

    // flags override the file per knob; flag auth replaces file auth
    val cfg2 = Serve.parseConfig("/data", Seq("/data", "--config", path,
      "--retention-days", "7", "--auth-token", "flagtok",
      "--max-execution-ms", "9000"))
    assert(cfg2.retentionDays == 7)
    assert(cfg2.maintainEveryMs == 3600000L) // file value still applies
    assert(cfg2.resultLimits.maxExecutionMs == 9000L)
    assert(cfg2.auth ==
      Seq(Auth.AuthConfig("bearertoken", Seq(Auth.Token("flagtok")))))
    assert(cfg2.adminAuth.nonEmpty) // file section survives

    // defaults without a file: reference values
    val bare = Serve.parseConfig("/data", Seq("/data"))
    assert(bare.resultLimits.maxExecutionMs == 30000L) // querier.go:119-120
    assert(bare.resultLimits.maxSampleRows == 1000000L)
  }

  test("unknown config keys are startup errors, like unknown flags") {
    intercept[IllegalArgumentException] {
      Serve.parseConfig("/data", Seq("/data", "--config",
        write("retention_day: 30\n")))
    }
    intercept[IllegalArgumentException] {
      Serve.parseConfig("/data", Seq("/data", "--config",
        write("auth:\n  - type: bearertoken\n    token: abc\n")))
    }
    intercept[IllegalArgumentException] {
      Serve.parseConfig("/data", Seq("/data", "--config",
        write("admin:\n  port: 1\n")))
    }
    // an invalid auth type in the FILE is a startup error once the
    // middleware builds (same as flags)
    val cfg = Serve.parseConfig("/data", Seq("/data", "--config",
      write("auth:\n  - type: bogus\n")))
    intercept[IllegalArgumentException](Auth.fromConfig(cfg.auth))
  }
}
