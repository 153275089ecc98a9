package graft.api

import com.sun.net.httpserver.{HttpExchange, HttpHandler}

/** HTTP authentication middleware — the reference wires bearer-token
  * and basic-auth verification into EVERY HTTP server it mounts, with
  * a per-API-section config override
  * (internal/httpmiddleware/auth.go:13-174 `UserCredentials`/`Token`/
  * `BasicAuth`/`BearerToken`/`Auth`; wiring cmd/oteldb/app.go:196-264
  * `addOgen` + `makeAuthMiddlewares`; config cmd/oteldb/config.go:
  * 117-118, 480-491).
  *
  * Semantics mirrored exactly:
  *   - multiple configured authenticators are OR'd: the first one that
  *     accepts the request lets it through; when ALL reject, the LAST
  *     verdict's message is reported (auth.go:152-166 `Auth`)
  *   - a missing/malformed `Authorization` header reports
  *     "missing or invalid Authorization header"; a well-formed header
  *     with bad credentials reports "unauthorized" (auth.go:55-64,
  *     118-130)
  *   - credential comparison is constant-time (auth.go crypto/subtle
  *     `ConstantTimeCompare` → `MessageDigest.isEqual`, which is
  *     constant-time for equal lengths and, like the Go original,
  *     rejects length mismatches immediately)
  *   - secrets may come from files (`password_file`/`token_file`,
  *     auth.go:21-40, 76-97): trimmed, must be non-empty, and setting
  *     both inline and file forms is a CONFIG error raised at
  *     construction, not at request time
  *   - the rejection body is the reference's default handler's:
  *     status 401, `{"error":"<msg>"}` + newline, text/plain — Go's
  *     `http.Error` over the marshalled struct (auth.go:169-182)
  *
  * Scale note: verification is a pure in-memory header check (no I/O,
  * no Spark) — it adds nothing measurable to the request path; secret
  * files are read ONCE at construction like the reference.
  */
object Auth {

  /** One basic-auth user (auth.go:13-40). Exactly one of `password` /
    * `passwordFile` must be set.
    */
  final case class UserCredentials(user: String, password: String = "",
      passwordFile: String = "") {
    /** Resolved password (auth.go GetPassword). */
    def getPassword: String = {
      require(!(password.nonEmpty && passwordFile.nonEmpty),
        "password and password_file are both set")
      if (passwordFile.nonEmpty) {
        val p = readSecret(passwordFile)
        require(p.nonEmpty, "password file is empty")
        p
      } else {
        require(password.nonEmpty, "password is empty")
        password
      }
    }
  }

  /** One bearer token (auth.go:69-97). Exactly one of `token` /
    * `tokenFile` must be set.
    */
  final case class Token(token: String = "", tokenFile: String = "") {
    /** Resolved token value (auth.go Token.Get). */
    def get: String = {
      require(!(token.nonEmpty && tokenFile.nonEmpty),
        "token_file and token are both set")
      if (tokenFile.nonEmpty) {
        val t = readSecret(tokenFile)
        require(t.nonEmpty, "token_file is empty")
        t
      } else {
        require(token.nonEmpty, "token is empty")
        token
      }
    }
  }

  private def readSecret(path: String): String =
    new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), "UTF-8").trim

  /** Authentication outcome (auth.go AuthVerdict). */
  final case class Verdict(ok: Boolean, message: String)
  val Authenticated: Verdict = Verdict(ok = true, "success")
  def unauthenticated(msg: String): Verdict = Verdict(ok = false, msg)

  /** One authentication mechanism: inspects the request's
    * `Authorization` header (both reference mechanisms read only it).
    */
  trait Authenticator {
    def authenticate(authorization: Option[String]): Verdict
  }

  private val MissingHeader = "missing or invalid Authorization header"
  private val Unauthorized = "unauthorized"

  /** Constant-time equality over UTF-8 bytes (crypto/subtle
    * ConstantTimeCompare shape: immediate false on length mismatch,
    * constant-time over the content otherwise).
    */
  private def constantTimeEquals(a: String, b: String): Boolean =
    java.security.MessageDigest.isEqual(
      a.getBytes("UTF-8"), b.getBytes("UTF-8"))

  /** HTTP Basic authenticator over a user→password table
    * (auth.go:43-67 BasicAuth). Secrets resolve at CONSTRUCTION —
    * a bad users list is a startup error.
    */
  def basicAuth(users: Seq[UserCredentials]): Authenticator = {
    val creds: Map[String, String] =
      users.map(u => u.user -> u.getPassword).toMap
    (authorization: Option[String]) =>
      parseBasic(authorization) match {
        case None => unauthenticated(MissingHeader)
        case Some((user, pass)) =>
          creds.get(user) match {
            // unknown user returns immediately like the reference
            // (auth.go:57-60); ConstantTimeCompare itself also
            // short-circuits on length mismatch, so a dummy compare
            // would add no timing cover
            case None => unauthenticated(Unauthorized)
            case Some(expected) =>
              if (constantTimeEquals(pass, expected)) Authenticated
              else unauthenticated(Unauthorized)
          }
      }
  }

  /** `Authorization: Basic base64(user:pass)` → (user, pass); the
    * scheme match is case-insensitive like Go's `r.BasicAuth()`.
    */
  private def parseBasic(authorization: Option[String])
      : Option[(String, String)] =
    authorization.flatMap { h =>
      val prefix = "Basic "
      if (h.length < prefix.length ||
          !h.substring(0, prefix.length).equalsIgnoreCase(prefix)) None
      else try {
        val dec = new String(java.util.Base64.getDecoder
          .decode(h.substring(prefix.length)), "UTF-8")
        val i = dec.indexOf(':')
        if (i < 0) None else Some((dec.take(i), dec.drop(i + 1)))
      } catch { case _: IllegalArgumentException => None }
    }

  /** Bearer-token authenticator over a token list (auth.go:100-140
    * BearerToken): the prefix cut is case-SENSITIVE (`Bearer `) and
    * the token is trimmed, both like the original; a valid token is
    * any configured one (each compared constant-time).
    */
  def bearerToken(tokens: Seq[Token]): Authenticator = {
    val values: Seq[String] = tokens.map(_.get)
    (authorization: Option[String]) =>
      authorization.filter(_.startsWith("Bearer ")) match {
        case None => unauthenticated(MissingHeader)
        case Some(h) =>
          val tok = h.substring("Bearer ".length).trim
          // no early exit: every configured token is compared
          var ok = false
          values.foreach(v => if (constantTimeEquals(tok, v)) ok = true)
          if (ok) Authenticated else unauthenticated(Unauthorized)
      }
  }

  // ---------- config shape (cmd/oteldb/config.go:461-491) ----------

  /** One auth section entry: `type` selects the mechanism
    * ("basicauth" | "bearertoken" | "none"/"" — none is valid and
    * contributes nothing, config.go:465-478).
    */
  final case class AuthConfig(tpe: String, tokens: Seq[Token] = Nil,
      users: Seq[UserCredentials] = Nil)

  /** `[]AuthConfig` → authenticators (cmd/oteldb/app.go:264-293
    * makeAuthMiddlewares): empty config → None (no middleware mounted);
    * an invalid type is a startup error. A NON-empty config whose
    * entries are all none-type yields a middleware with ZERO
    * authenticators, which rejects every request — FAIL-CLOSED, exactly
    * the reference (its makeAuthMiddlewares returns an Auth middleware
    * over the empty list for that config); mounting nothing instead
    * would leave endpoints an operator explicitly configured auth for
    * silently unauthenticated (ADVICE r15).
    */
  def fromConfig(cfgs: Seq[AuthConfig]): Option[Middleware] = {
    val auths = cfgs.flatMap { c =>
      c.tpe match {
        case "basicauth"   => Some(basicAuth(c.users))
        case "bearertoken" => Some(bearerToken(c.tokens))
        case "" | "none"   => None
        case other => throw new IllegalArgumentException(
          s"invalid auth type \"$other\"")
      }
    }
    if (cfgs.isEmpty) None
    else Some(new Middleware(auths,
      offerBasicChallenge = cfgs.exists(_.tpe == "basicauth")))
  }

  /** The middleware proper (auth.go:151-167 Auth): tries each
    * authenticator in sequence; first success passes the request on;
    * all-fail reports the LAST verdict via the default error body.
    *
    * `offerBasicChallenge`: when basic auth is among the configured
    * mechanisms, rejections carry `WWW-Authenticate: Basic` so a
    * BROWSER can run its credential prompt (the admin status page is
    * unreachable under basic auth otherwise — the browser never asks,
    * and once it has credentials its same-origin fetch() calls carry
    * them too). Header only; the reference 401 body is unchanged.
    */
  final class Middleware(auths: Seq[Authenticator],
      offerBasicChallenge: Boolean = false) {
    /** Header-level check, separated for tests and non-HttpHandler
      * callers: Some(msg) = rejected with that message.
      */
    def check(authorization: Option[String]): Option[String] = {
      var last: Verdict = unauthenticated(MissingHeader)
      auths.foreach { a =>
        if (!last.ok) last = a.authenticate(authorization)
      }
      if (last.ok) None else Some(last.message)
    }

    /** Wraps an [[HttpHandler]]; rejections render the reference
      * default error body (auth.go:169-182: 401, text/plain,
      * `{"error":"<msg>"}` + newline).
      */
    def wrap(next: HttpHandler): HttpHandler = (ex: HttpExchange) =>
      check(Option(ex.getRequestHeaders.getFirst("Authorization"))) match {
        case None => next.handle(ex)
        case Some(msg) =>
          val body =
            (s"""{"error":${jsonStr(msg)}}""" + "\n").getBytes("UTF-8")
          if (offerBasicChallenge)
            ex.getResponseHeaders.set("WWW-Authenticate",
              "Basic realm=\"graft\", charset=\"UTF-8\"")
          ex.getResponseHeaders.set(
            "Content-Type", "text/plain; charset=utf-8")
          ex.sendResponseHeaders(401, body.length.toLong)
          val os = ex.getResponseBody
          try os.write(body) finally os.close()
      }
  }

  /** Wraps `h` when a middleware is configured; identity otherwise. */
  def guard(mw: Option[Middleware], h: HttpHandler): HttpHandler =
    mw.fold(h)(_.wrap(h))

  // the package's one JSON string escaper
  private def jsonStr(s: String): String = ApiEncoders.jsonString(s)
}
