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
}
