package graft.loader

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import scala.jdk.CollectionConverters._

/** FLASH SciCat metadata retriever — per-run dataset metadata fetched
  * over HTTP from a SciCat catalogue instance, keyed by beamtime + run
  * (`sed/loader/flash/metadata.py:19-124`, wired into the loader at
  * `sed/loader/flash/loader.py:839-846` and invoked on every
  * `read_dataframe(collect_metadata=True)`, `loader.py:929`).
  *
  * Behavior mirrors the reference exactly:
  *
  *  - configuration must provide BOTH the catalogue URL and a token,
  *    else construction refuses (`metadata.py:33-34`);
  *  - per run, `pid = "<beamtimeId>/<run>"`, URL-escaped `/` → `%2F`
  *    (`_reformat_pid`, `metadata.py:121-124` — SciCat prefixes pids
  *    with `/` at some sites; at DESY the prefix is empty);
  *  - the NEW dataset URL form `{base}/Datasets/{pid}` is tried first;
  *    an HTTP-successful but EMPTY body means an older SciCat
  *    deployment, so the OLD form `{base}/Datasets/%2F{pid}` is
  *    retried (`_get_metadata_per_run`, `metadata.py:95-107`);
  *  - auth is a `Authorization: Bearer <token>` header with
  *    JSON content/accept headers and a 10 s timeout;
  *  - a FAILED fetch (network error, non-2xx) warns and yields an
  *    empty map for that run — a catalogue outage must not fail the
  *    data load (`metadata.py:108-112`);
  *  - runs merge into one flat dict, later runs overwriting earlier
  *    keys — the reference's own (documented-as-imperfect) semantics
  *    (`get_metadata`, `metadata.py:66-75`).
  *
  * Driver-side only: metadata is a handful of HTTP round trips per
  * load, never per partition — nothing here touches executors.
  */
object ScicatMetadata {

  /** Catalogue endpoint + token. Mirrors the reference's constructor
    * contract: both must be present (`metadata.py:28-34`; the explicit
    * `token` argument overrides the config entry, like the reference's
    * `scicat_token` parameter).
    */
  final case class Config(url: String, token: String, timeoutMs: Int = 10000) {
    require(url != null && url.nonEmpty && token != null && token.nonEmpty,
      "scicat: no URL or token provided for fetching metadata")
    // This retriever speaks HTTP only: a non-http(s) catalogue URL
    // (file://, jar:) would ClassCastException at openConnection deep
    // inside a data load — name the misconfiguration at construction,
    // where it is a config error, not a load failure.
    require(url.startsWith("http://") || url.startsWith("https://"),
      s"scicat: catalogue URL must be http(s), got '$url'")
    // A token or URL carrying CR/LF could smuggle extra request headers
    // (HttpURLConnection's own validation varies by JDK) — refuse at
    // construction; these never legitimately contain control characters.
    require(!(url + token).exists(c => c == '\r' || c == '\n' || c < ' '),
      "scicat: URL/token must not contain control characters")
  }

  /** Build a [[Config]] from a parsed metadata config section
    * (`scicat_url` / `scicat_token` keys, `metadata.py:28-31`),
    * with an optional explicit token override.
    */
  def configFrom(metadataConfig: Map[String, String],
      scicatToken: Option[String] = None): Config = {
    val tok = scicatToken.orElse(metadataConfig.get("scicat_token"))
    val url = metadataConfig.get("scicat_url")
    require(tok.exists(_.nonEmpty) && url.exists(_.nonEmpty),
      "scicat: no URL or token provided for fetching metadata")
    Config(url.get, tok.get)
  }

  /** SciCat pid escaping: `/` → `%2F` (`metadata.py:121-124`). */
  def reformatPid(pid: String): String = pid.replace("/", "%2F")

  /** Current SciCat dataset URL form (`metadata.py:115-118`). */
  def newDatasetUrl(base: String, pid: String): String =
    s"$base/Datasets/${reformatPid(pid)}"

  /** Pre-v4 SciCat form with the leading escaped slash
    * (`metadata.py:110-113`).
    */
  def oldDatasetUrl(base: String, pid: String): String =
    s"$base/Datasets/%2F${reformatPid(pid)}"

  /** python-requests' `Session.should_strip_auth` rule, inverted: the
    * Authorization header follows a redirect only when the target keeps
    * the same host (case-insensitive — RFC 3986 §3.2.2 hosts compare
    * caseless; a catalogue redirecting to `LOCALHOST` is the same
    * machine), the same scheme, and the same EFFECTIVE port (an explicit
    * default port equals the implicit one, e.g. `http://h:80` ≡
    * `http://h`). The one allowed exception is the standard http→https
    * upgrade on default ports (80 → 443). In particular a same-host
    * https→http DOWNGRADE strips: the token must never travel plaintext
    * just because the catalogue redirected.
    */
  private[loader] def shouldForwardAuth(from: java.net.URL,
      to: java.net.URL): Boolean = {
    val fromHost = Option(from.getHost).getOrElse("")
    val toHost = Option(to.getHost).getOrElse("")
    def eff(u: java.net.URL): Int =
      if (u.getPort == -1) u.getDefaultPort else u.getPort
    fromHost.nonEmpty && fromHost.equalsIgnoreCase(toHost) && (
      (from.getProtocol == "http" && eff(from) == 80 &&
        to.getProtocol == "https" && eff(to) == 443) ||
      (from.getProtocol == to.getProtocol && eff(from) == eff(to)))
  }

  private val mapper = new ObjectMapper()

  /** JsonNode → plain Scala values (objects → Map, arrays → Seq,
    * integral → Long, other numbers → Double), so catalogue metadata
    * merges into the processor's `Map[String, Any]` metadata tree.
    */
  private[loader] def toScala(n: JsonNode): Any = {
    if (n == null || n.isNull) null
    else if (n.isObject)
      n.properties().asScala.map(e => e.getKey -> toScala(e.getValue)).toMap
    else if (n.isArray) n.asScala.map(toScala).toSeq
    else if (n.isTextual) n.asText()
    else if (n.isIntegralNumber) n.asLong()
    else if (n.isNumber) n.asDouble()
    else if (n.isBoolean) n.asBoolean()
    else n.asText()
  }

  /** One GET with the reference's headers; Some(body) on HTTP success
    * (2xx), None on any failure. The body may be empty — the caller
    * uses that to detect the old-URL deployments.
    *
    * Redirects: HttpURLConnection follows same-protocol redirects
    * itself but NOT http→https (common for catalogues that moved behind
    * TLS — the reference's `requests` follows these). Up to 3 cross-
    * protocol hops are followed manually; the Bearer token is forwarded
    * ONLY per [[shouldForwardAuth]] (the `requests` rule: credentials
    * never follow a host, scheme, or port change — except the standard
    * http→https default-port upgrade).
    */
  private def get(url: String, cfg: Config): Option[String] = {
    def fetch(u: String, sendAuth: Boolean, hopsLeft: Int): Option[String] =
      try {
        val target = new java.net.URL(u)
        if (target.getProtocol != "http" && target.getProtocol != "https")
          return None // a redirect may point anywhere; only http(s) speaks
        val conn = target.openConnection()
          .asInstanceOf[java.net.HttpURLConnection]
        // Java's auto-follow forwards ALL headers on same-protocol
        // redirects — including Authorization across a host change.
        // Handle every redirect manually so the same-host rule holds.
        conn.setInstanceFollowRedirects(false)
        conn.setConnectTimeout(cfg.timeoutMs)
        conn.setReadTimeout(cfg.timeoutMs)
        conn.setRequestProperty("Content-Type", "application/json")
        conn.setRequestProperty("Accept", "application/json")
        if (sendAuth)
          conn.setRequestProperty("Authorization", s"Bearer ${cfg.token}")
        val code = conn.getResponseCode
        if (code >= 300 && code < 400 && hopsLeft > 0) {
          val loc = Option(conn.getHeaderField("Location"))
          val es = conn.getErrorStream
          if (es != null) { es.readAllBytes(); es.close() }
          val in = try conn.getInputStream catch { case _: Exception => null }
          if (in != null) { in.readAllBytes(); in.close() }
          loc.flatMap { l =>
            val next = new java.net.URL(target, l) // relative Location ok
            fetch(next.toString,
              sendAuth && shouldForwardAuth(target, next), hopsLeft - 1)
          }
        } else if (code < 200 || code >= 300) {
          // drain + close the error stream so the connection can be reused
          val es = conn.getErrorStream
          if (es != null) { es.readAllBytes(); es.close() }
          None
        } else {
          val in = conn.getInputStream
          try Some(new String(in.readAllBytes(), "UTF-8")) finally in.close()
        }
      } catch {
        // "a catalogue outage must not fail the data load": ANY request
        // failure — network, TLS, or a connection class surprise — must
        // degrade to the warn+empty path, not propagate out of the load
        case scala.util.control.NonFatal(_) => None
      }
    fetch(url, sendAuth = true, hopsLeft = 3)
  }

  /** Metadata for one pid: new URL first; empty-body success retries
    * the old URL form; failure (either request) warns and returns the
    * empty map, exactly like the reference (`metadata.py:88-112`).
    */
  def metadataPerRun(cfg: Config, pid: String): Map[String, Any] = {
    val body = get(newDatasetUrl(cfg.url, pid), cfg) match {
      case Some(b) if b.nonEmpty => Some(b)
      case Some(_) => get(oldDatasetUrl(cfg.url, pid), cfg)
      case None => None
    }
    body.filter(_.nonEmpty).flatMap { b =>
      try Some(toScala(mapper.readTree(b)) match {
        case m: Map[_, _] => m.asInstanceOf[Map[String, Any]]
        case other => Map("value" -> other)
      })
      catch { case _: Exception => None }
    } match {
      case Some(m) => m
      case None =>
        System.err.println(s"[scicat] failed to retrieve metadata for PID $pid")
        Map.empty
    }
  }

  /** Metadata for a beamtime's runs, merged flat into `existing` —
    * later runs overwrite earlier keys (the reference's semantics,
    * `metadata.py:66-75`, including its TODO about multi-run merges).
    */
  def getMetadata(cfg: Config, beamtimeId: String, runs: Seq[String],
      existing: Map[String, Any] = Map.empty): Map[String, Any] =
    runs.foldLeft(existing) { (acc, run) =>
      acc ++ metadataPerRun(cfg, s"$beamtimeId/$run")
    }
}
