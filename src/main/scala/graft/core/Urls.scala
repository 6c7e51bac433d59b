package graft.core

/** URL policies for payload acquisition and postback — the reference's URL
  * surface as PURE decision functions, no network I/O (URL fetching stays
  * disabled at 10^12-turn scale; payloads are inline per the input_hint, so
  * `img_url` requests remain error rows in [[Extractor]]). These functions
  * let a url-bearing request mix be replayed/validated without fetching:
  * what the reference WOULD do, as data.
  */
object Urls {

  /** `url2bytes`' HTTP client budget — `/root/reference/ocr_util.go:59`
    * (`http.Client{Timeout: 10 * time.Second}`).
    */
  val FetchTimeoutSeconds = 10

  /** `checkURLForReplyTo` (`/root/reference/ocr_util.go:172-182`): a URL is
    * accepted iff its scheme is `http` or `https`; anything else yields
    * "provided <url> URI must be an absolute URL" (note: an empty or
    * unparseable input produces the same message with the raw input
    * interpolated, double space included — faithful to the Go
    * `"provided " + u.String() + " URI must be an absolute URL"`).
    */
  def checkUrlForReplyTo(uri: String): Either[String, String] = {
    val scheme = schemeOf(uri)
    if (scheme == "http" || scheme == "https") Right(uri)
    else Left(s"provided $uri URI must be an absolute URL")
  }

  /** RFC-3986 scheme of `uri` (lowercased), or "" when absent/invalid —
    * the part Go's `url.Parse` extracts before the first ':'.
    */
  private def schemeOf(uri: String): String = {
    val i = if (uri == null) -1 else uri.indexOf(':')
    if (i <= 0) ""
    else {
      val s = uri.substring(0, i)
      if (s.charAt(0).isLetter &&
        s.forall(c => c.isLetterOrDigit || c == '+' || c == '-' || c == '.'))
        s.toLowerCase
      else ""
    }
  }

  /** `StripPasswordFromUrl` (`/root/reference/ocr_util.go:196-203`): when
    * the authority carries `user:password@`, replace the FIRST
    * "<password>@" occurrence with "***@" (exactly Go's
    * `strings.Replace(url, pass+"@", "***@", 1)`); otherwise the URL is
    * returned unchanged.
    */
  def stripPassword(uri: String): String = {
    val ss = uri.indexOf("://")
    if (ss < 0) return uri
    val rest = uri.substring(ss + 3)
    val at = rest.indexOf('@')
    if (at < 0) return uri
    val userinfo = rest.substring(0, at)
    val colon = userinfo.indexOf(':')
    if (colon < 0) return uri
    val pass = userinfo.substring(colon + 1)
    if (pass.isEmpty) return uri
    val idx = uri.indexOf(pass + "@")
    if (idx < 0) uri
    else uri.substring(0, idx) + "***@" + uri.substring(idx + pass.length + 1)
  }

  /** Crawl-style URL canonicalization — the dedup-key normalization every
    * web corpus applies before URL-level dedup (RFC 3986 §6 syntax-based
    * normalization plus the crawl conventions): lowercase scheme and host,
    * strip the fragment, strip the default port (80/443), collapse
    * duplicate path slashes, strip trailing path slashes, normalize
    * percent-encoding (§6.2.2: uppercase hex digits, decode escapes of
    * UNRESERVED characters — ALPHA / DIGIT / `-._~`) in path and query,
    * drop tracking query params (key exactly `fbclid` or key prefix
    * `utm_` — matched on the KEY, so `fbclident=1` is a distinct,
    * preserved param), and SORT the surviving params (crawl dedup keys
    * are order-insensitive: `?a=1&b=2` and `?b=2&a=1` are the same page).
    * Non-http(s) or authority-less inputs are returned UNCHANGED
    * (canonicalization must be total on crawl garbage). Userinfo is
    * preserved verbatim — log-safety is [[stripPassword]]'s job; compose
    * the two for output. Pure and deterministic: the columnar form
    * ([[graft.spark.HashFunctions.urlCanonical]]) wraps exactly this
    * function, so the unit-tested edge cases ARE the cluster semantics.
    */
  def canonicalize(url: String): String = {
    val ss = if (url == null) -1 else url.indexOf("://")
    if (ss <= 0) return url
    val scheme = url.substring(0, ss).toLowerCase
    if (scheme != "http" && scheme != "https") return url
    var rest = url.substring(ss + 3)
    val h = rest.indexOf('#')
    if (h >= 0) rest = rest.substring(0, h)
    val authEnd = {
      val s = rest.indexOf('/'); val q = rest.indexOf('?')
      if (s < 0 && q < 0) rest.length else if (s < 0) q else if (q < 0) s else math.min(s, q)
    }
    val auth = rest.substring(0, authEnd)
    val tail = rest.substring(authEnd)
    val at = auth.lastIndexOf('@')
    val (userinfo, hostport) =
      if (at >= 0) (auth.substring(0, at + 1), auth.substring(at + 1)) else ("", auth)
    val colon = hostport.lastIndexOf(':')
    val (host, port) =
      if (colon >= 0 && colon < hostport.length - 1 &&
        hostport.substring(colon + 1).forall(_.isDigit))
        (hostport.substring(0, colon), hostport.substring(colon + 1))
      else (hostport, "")
    val defaultPort = if (scheme == "http") "80" else "443"
    val portPart = if (port.isEmpty || port == defaultPort) "" else ":" + port
    val qi = tail.indexOf('?')
    var path = if (qi >= 0) tail.substring(0, qi) else tail
    val query = if (qi >= 0) tail.substring(qi + 1) else null
    path = normPercent(path.replaceAll("/{2,}", "/"))
    while (path.endsWith("/")) path = path.substring(0, path.length - 1)
    val keptQuery =
      if (query == null) ""
      else {
        val kept = query.split("&", -1).iterator
          .filter(_.nonEmpty)
          .map(normPercent)
          .filter { p =>
            val eq = p.indexOf('=')
            val key = if (eq >= 0) p.substring(0, eq) else p
            key != "fbclid" && !key.startsWith("utm_")
          }
          .toArray.sorted
        if (kept.isEmpty) "" else "?" + kept.mkString("&")
      }
    scheme + "://" + userinfo + host.toLowerCase + portPart + path + keptQuery
  }

  /** RFC 3986 §6.2.2 percent-encoding normalization of one URI component:
    * hex digits of every escape are UPPERCASED, and escapes of UNRESERVED
    * characters (ALPHA / DIGIT / `-._~`) are decoded — two spellings of
    * the same page must not survive as two dedup keys. Malformed escapes
    * (truncated, non-hex) pass through verbatim (total on crawl garbage).
    */
  private def normPercent(s: String): String = {
    def hex(c: Char): Int =
      if (c >= '0' && c <= '9') c - '0'
      else if (c >= 'a' && c <= 'f') c - 'a' + 10
      else if (c >= 'A' && c <= 'F') c - 'A' + 10
      else -1
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length &&
        hex(s.charAt(i + 1)) >= 0 && hex(s.charAt(i + 2)) >= 0) {
        val v = (hex(s.charAt(i + 1)) << 4) | hex(s.charAt(i + 2))
        val ch = v.toChar
        val unreserved = (ch >= 'A' && ch <= 'Z') || (ch >= 'a' && ch <= 'z') ||
          (ch >= '0' && ch <= '9') || ch == '-' || ch == '.' || ch == '_' || ch == '~'
        if (unreserved) sb.append(ch)
        else {
          sb.append('%')
          sb.append(Character.toUpperCase(s.charAt(i + 1)))
          sb.append(Character.toUpperCase(s.charAt(i + 2)))
        }
        i += 3
      } else {
        sb.append(c)
        i += 1
      }
    }
    sb.toString
  }
}
