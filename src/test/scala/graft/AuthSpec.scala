package graft

import java.net.{HttpURLConnection, URI}
import java.nio.file.Files

import graft.api.{AdminApi, Auth, HttpApi, Limits}

/** Authentication middleware (reference
  * internal/httpmiddleware/auth.go:13-182 + auth_test.go): basic-auth
  * and bearer-token authenticators, OR-composition, the default 401
  * error body, secret-file credentials, and the per-server wiring
  * (query / admin / ingest), incl. the per-section override beating
  * the global config (cmd/oteldb/app.go:206-208).
  */
class AuthSpec extends SparkTestBase {
  import spark.implicits._

  private def basicHeader(user: String, pass: String): String =
    "Basic " + java.util.Base64.getEncoder.encodeToString(
      s"$user:$pass".getBytes("UTF-8"))

  private def request(url: String, headers: Map[String, String] = Map.empty,
      method: String = "GET", body: Array[Byte] = null): (Int, String) = {
    val conn = URI.create(url).toURL.openConnection()
      .asInstanceOf[HttpURLConnection]
    conn.setRequestMethod(method)
    headers.foreach { case (k, v) => conn.setRequestProperty(k, v) }
    if (body != null) {
      conn.setDoOutput(true)
      conn.getOutputStream.write(body)
      conn.getOutputStream.close()
    } else if (method == "POST") {
      conn.setDoOutput(true)
      conn.getOutputStream.close()
    }
    val code = conn.getResponseCode
    val is = if (code >= 400) conn.getErrorStream else conn.getInputStream
    val resp = new String(is.readAllBytes(), "UTF-8")
    is.close()
    (code, resp)
  }

  // ---- authenticator semantics (auth_test.go TestBasicAuth) ----

  test("basic auth verdicts: missing header, ok, wrong pass, unknown user, file password") {
    val dir = Files.createTempDirectory("graft-auth").toFile
    dir.deleteOnExit()
    val secretFile = new java.io.File(dir, "password")
    Files.write(secretFile.toPath, "qwerty\n".getBytes("UTF-8"))

    val auth = Auth.basicAuth(Seq(
      Auth.UserCredentials("alice", password = "secret"),
      Auth.UserCredentials("bob", passwordFile = secretFile.getPath)))

    assert(auth.authenticate(None) ==
      Auth.unauthenticated("missing or invalid Authorization header"))
    assert(auth.authenticate(Some(basicHeader("alice", "secret"))) ==
      Auth.Authenticated)
    assert(auth.authenticate(Some(basicHeader("alice", "hello"))) ==
      Auth.unauthenticated("unauthorized"))
    assert(auth.authenticate(Some(basicHeader("alice", ""))) ==
      Auth.unauthenticated("unauthorized"))
    // the file-sourced password is trimmed (reference TrimSpace)
    assert(auth.authenticate(Some(basicHeader("bob", "qwerty"))) ==
      Auth.Authenticated)
    assert(auth.authenticate(Some(basicHeader("admin", "admin"))) ==
      Auth.unauthenticated("unauthorized"))
    // a non-Basic scheme is a missing/invalid header, not unauthorized
    assert(auth.authenticate(Some("Bearer abc")) ==
      Auth.unauthenticated("missing or invalid Authorization header"))
  }

  test("bearer token verdicts: missing header, ok, bad token, file token") {
    val dir = Files.createTempDirectory("graft-auth").toFile
    dir.deleteOnExit()
    val tokenFile = new java.io.File(dir, "token")
    Files.write(tokenFile.toPath, "def\n".getBytes("UTF-8"))

    val auth = Auth.bearerToken(Seq(
      Auth.Token(token = "abc"),
      Auth.Token(tokenFile = tokenFile.getPath)))

    assert(auth.authenticate(None) ==
      Auth.unauthenticated("missing or invalid Authorization header"))
    assert(auth.authenticate(Some("Bearer abc")) == Auth.Authenticated)
    assert(auth.authenticate(Some("Bearer 123")) ==
      Auth.unauthenticated("unauthorized"))
    assert(auth.authenticate(Some("Bearer def")) == Auth.Authenticated)
    // trimmed token value (reference TrimSpace after the prefix cut)
    assert(auth.authenticate(Some("Bearer  abc ")) == Auth.Authenticated)
    // the Bearer prefix cut is case-sensitive like Go's CutPrefix
    assert(auth.authenticate(Some("bearer abc")) ==
      Auth.unauthenticated("missing or invalid Authorization header"))
  }

  test("credential config errors are construction-time") {
    intercept[IllegalArgumentException] {
      Auth.basicAuth(Seq(Auth.UserCredentials("a", password = "x",
        passwordFile = "/tmp/y")))
    }
    intercept[IllegalArgumentException] {
      Auth.basicAuth(Seq(Auth.UserCredentials("a")))
    }
    intercept[IllegalArgumentException] {
      Auth.bearerToken(Seq(Auth.Token()))
    }
    intercept[IllegalArgumentException] {
      Auth.fromConfig(Seq(Auth.AuthConfig("nosuch")))
    }
    // an EMPTY config mounts no middleware (app.go:265-267)…
    assert(Auth.fromConfig(Nil).isEmpty)
    // …but a non-empty all-none config is FAIL-CLOSED like the
    // reference (an Auth middleware over zero authenticators rejects
    // every request) — a reference config carried over verbatim must
    // not silently leave endpoints unauthenticated
    val noneOnly = Auth.fromConfig(Seq(Auth.AuthConfig("none")))
    assert(noneOnly.nonEmpty)
    assert(noneOnly.get.check(Some("Bearer whatever")) ==
      Some("missing or invalid Authorization header"))
  }

  // ---- OR-composition + default error body (auth_test.go TestAuth) ----

  test("middleware ORs authenticators and reports the last verdict") {
    val mw = Auth.fromConfig(Seq(
      Auth.AuthConfig("bearertoken",
        tokens = Seq(Auth.Token("abc"), Auth.Token("def"))),
      Auth.AuthConfig("basicauth", users = Seq(
        Auth.UserCredentials("alice", password = "secret"),
        Auth.UserCredentials("bob", password = "qwerty"))))).get

    assert(mw.check(None) ==
      Some("missing or invalid Authorization header"))
    assert(mw.check(Some(basicHeader("alice", "secret"))).isEmpty)
    assert(mw.check(Some("Bearer abc")).isEmpty)
    // bearer rejects with "missing or invalid", basic (the LAST) with
    // "unauthorized" — the last verdict's message wins (auth.go:158)
    assert(mw.check(Some(basicHeader("alice", "wrong"))) ==
      Some("unauthorized"))
  }

  test("query server rejects with the reference 401 body; authed passes") {
    val logs = Seq((1000000000L, "hello", Map("app" -> "x"), 9, "INFO"))
      .toDF("ts_ns", "body", "labels", "severity_number", "severity_text")
    val api = new HttpApi(logs, spark.emptyDataFrame, spark.emptyDataFrame,
      auth = Auth.fromConfig(Seq(Auth.AuthConfig("bearertoken",
        tokens = Seq(Auth.Token("s3cr3t"))))))
    val port = api.start()
    try {
      val base = s"http://127.0.0.1:$port"
      val url = s"$base/loki/api/v1/labels?start=0&end=2000000000"
      val (c1, b1) = request(url)
      assert(c1 == 401)
      // the reference default handler body: {"error":"<msg>"} + "\n"
      assert(b1 == "{\"error\":\"missing or invalid Authorization header\"}\n")
      val (c2, b2) = request(url,
        Map("Authorization" -> "Bearer wrong"))
      assert(c2 == 401)
      assert(b2 == "{\"error\":\"unauthorized\"}\n")
      val (c3, b3) = request(url,
        Map("Authorization" -> "Bearer s3cr3t"))
      assert(c3 == 200)
      assert(b3.contains("\"app\""))
      // auth wraps EVERY route of the server, probes included
      // (app.go:215-236: the middleware fronts the whole ogen server)
      assert(request(s"$base/api/status/buildinfo")._1 == 401)
      // bearer-only config: no browser challenge header
      val conn = URI.create(url).toURL.openConnection()
        .asInstanceOf[HttpURLConnection]
      assert(conn.getResponseCode == 401)
      assert(conn.getHeaderField("WWW-Authenticate") == null)
    } finally api.stop()
  }

  test("basic-auth rejections carry the browser challenge header") {
    // with basic auth configured the 401 offers WWW-Authenticate so a
    // browser can prompt (the admin status page flow); the reference
    // 401 body is unchanged
    val api = new AdminApi(spark, auth = Auth.fromConfig(Seq(
      Auth.AuthConfig("basicauth",
        users = Seq(Auth.UserCredentials("ops", password = "pw"))))))
    val port = api.start()
    try {
      val conn = URI.create(s"http://127.0.0.1:$port/api/v1/info")
        .toURL.openConnection().asInstanceOf[HttpURLConnection]
      assert(conn.getResponseCode == 401)
      val challenge = conn.getHeaderField("WWW-Authenticate")
      assert(challenge != null && challenge.startsWith("Basic"), challenge)
      val body = new String(conn.getErrorStream.readAllBytes(), "UTF-8")
      assert(body == "{\"error\":\"missing or invalid Authorization header\"}\n")
      // authenticated flow still serves (what the browser sends after
      // the prompt)
      val (c2, b2) = request(s"http://127.0.0.1:$port/api/v1/info",
        Map("Authorization" -> basicHeader("ops", "pw")))
      assert(c2 == 200 && b2.contains("\"version\""), s"$c2 $b2")
    } finally api.stop()
  }

  test("unauthenticated destructive admin action is rejected") {
    val api = new AdminApi(spark,
      maintain = Some(() => "maintained"),
      auth = Auth.fromConfig(Seq(Auth.AuthConfig("basicauth",
        users = Seq(Auth.UserCredentials("ops", password = "pw"))))))
    val port = api.start()
    try {
      val url = s"http://127.0.0.1:$port/api/v1/actions/storage_maintain"
      val (c1, b1) = request(url, method = "POST")
      assert(c1 == 401)
      assert(b1 == "{\"error\":\"missing or invalid Authorization header\"}\n")
      val (c2, _) = request(url,
        Map("Authorization" -> basicHeader("ops", "wrong")), method = "POST")
      assert(c2 == 401)
      val (c3, b3) = request(url,
        Map("Authorization" -> basicHeader("ops", "pw")), method = "POST")
      assert(c3 == 200)
      assert(b3.contains("maintained"))
    } finally api.stop()
  }

  // ---- Serve flag parsing + per-section override ----

  test("parseConfig builds global and per-section auth configs") {
    val dir = Files.createTempDirectory("graft-auth").toFile
    dir.deleteOnExit()
    val tokenFile = new java.io.File(dir, "tok")
    Files.write(tokenFile.toPath, "filetok\n".getBytes("UTF-8"))

    val cfg = Serve.parseConfig("/tmp/x", Seq(
      "--auth-token", s"abc,@${tokenFile.getPath}",
      "--auth-basic", "alice:secret,bob:@" + tokenFile.getPath,
      "--admin-auth-token", "admintok"))
    assert(cfg.auth.map(_.tpe) == Seq("bearertoken", "basicauth"))
    assert(cfg.auth.head.tokens == Seq(Auth.Token("abc"),
      Auth.Token(tokenFile = tokenFile.getPath)))
    assert(cfg.auth(1).users == Seq(
      Auth.UserCredentials("alice", password = "secret"),
      Auth.UserCredentials("bob", passwordFile = tokenFile.getPath)))
    assert(cfg.queryAuth.isEmpty && cfg.ingestAuth.isEmpty)
    assert(cfg.adminAuth ==
      Some(Seq(Auth.AuthConfig("bearertoken", Seq(Auth.Token("admintok"))))))

    // the resolved middlewares: global applies where no override
    val global = Serve.sectionAuth(cfg.queryAuth, cfg.auth).get
    assert(global.check(Some("Bearer filetok")).isEmpty) // file token
    assert(global.check(Some(basicHeader("bob", "filetok"))).isEmpty)
    val admin = Serve.sectionAuth(cfg.adminAuth, cfg.auth).get
    // the section override REPLACES the global config (app.go:206-208)
    assert(admin.check(Some("Bearer admintok")).isEmpty)
    assert(admin.check(Some("Bearer abc")) == Some("unauthorized"))

    intercept[IllegalArgumentException] {
      Serve.parseConfig("/tmp/x", Seq("--auth-basic", "nopassword"))
    }
  }

  test("ingest push requires auth before the body is admitted") {
    val dataDir = Files.createTempDirectory("graft-auth-ingest").toFile
    dataDir.deleteOnExit()
    val receiver = new graft.sources.OtlpReceiver(spark, dataDir.getPath)
    val port = receiver.start(auth = Auth.fromConfig(Seq(
      Auth.AuthConfig("bearertoken", tokens = Seq(Auth.Token("ing"))))))
    try {
      val body = Array[Byte](10, 0) // empty-ish OTLP payload
      val (c1, b1) = request(s"http://127.0.0.1:$port/v1/logs",
        method = "POST", body = body)
      assert(c1 == 401)
      assert(b1 == "{\"error\":\"missing or invalid Authorization header\"}\n")
      val (c2, _) = request(s"http://127.0.0.1:$port/v1/logs",
        Map("Authorization" -> "Bearer ing"), method = "POST", body = body)
      assert(c2 == 200)
    } finally receiver.stop()
  }
}
