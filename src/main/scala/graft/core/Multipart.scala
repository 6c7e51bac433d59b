package graft.core

/** `multipart/related` request parsing — the analog of `extractParts`
  * (`/root/reference/ocr_http_multipart_handler.go:25-89`), with the
  * reference's exact consumption quirks:
  *
  *   - the outer Content-Type must be `multipart/related` (lines 29-37,
  *     error "expected multipart related");
  *   - parts are consumed in order: an `application/json` part populates the
  *     request (lines 57-70); the FIRST `image…` part (prefix match, per the
  *     reference's `strings.HasPrefix(contentType, "image")`) populates the
  *     payload bytes and parsing RETURNS IMMEDIATELY (lines 72-78) —
  *     trailing parts (including a json part after the image) are never read;
  *   - a part of any OTHER content type is an error
  *     ("expected content-type: image" + "/ *", the handler's default branch);
  *   - reaching the end of the body without an image part is an error
  *     ("didn't expect to get this far").
  */
object Multipart {

  /** One parsed part. */
  final case class Part(contentType: String, body: String)

  /** Parse result: the json part's body (empty if none was seen before the
    * first image part), the first image part's bytes (null if none), and how
    * many parts were actually consumed before returning.
    */
  final case class Extracted(json: String, imgBytes: Array[Byte], partsRead: Int)

  /** Split a multipart body into parts. Body grammar (CRLF or LF):
    * `--<boundary>` \ headers \ blank line \ content, terminated by
    * `--<boundary>--`. Only the Content-Type header is interpreted.
    */
  def splitParts(boundary: String, body: String): List[Part] = {
    val normalized = body.replace("\r\n", "\n")
    val delim = s"--$boundary"
    val chunks = normalized.split(java.util.regex.Pattern.quote(delim)).toList
    chunks
      .drop(1) // preamble before the first boundary
      .takeWhile(c => !c.startsWith("--")) // closing delimiter "--boundary--"
      .flatMap { raw =>
        val c = raw.stripPrefix("\n")
        val sep = c.indexOf("\n\n")
        if (sep < 0) None
        else {
          val headers = c.substring(0, sep).split('\n')
          val ct = headers
            .collectFirst {
              case h if h.toLowerCase.startsWith("content-type:") =>
                h.substring("content-type:".length).trim
            }
            .getOrElse("")
          val content = c.substring(sep + 2).stripSuffix("\n")
          Some(Part(ct, content))
        }
      }
  }

  /** The reference's `extractParts` consumption semantics over pre-split
    * parts. `contentType` is the outer request Content-Type.
    */
  def extractParts(contentType: String, boundary: String, body: String): Either[String, Extracted] = {
    if (!contentType.toLowerCase.startsWith("multipart/related"))
      Left("expected multipart related") // ocr_http_multipart_handler.go:33-37
    else {
      var json = ""
      var read = 0
      val it = splitParts(boundary, body).iterator
      while (it.hasNext) {
        val p = it.next()
        read += 1
        // media type = content-type value up to any ";params", trimmed —
        // the analog of Go's mime.ParseMediaType before the switch
        val mt = p.contentType.toLowerCase.takeWhile(_ != ';').trim
        if (mt == "application/json") json = p.body
        else if (mt.startsWith("image"))
          // first image part wins; return IMMEDIATELY (lines 77-78)
          return Right(Extracted(json, Payload.bytes(p.body), read))
        else
          // neither json nor image: the handler's default branch errors
          return Left("expected content-type: image/*")
      }
      // EOF without an image part (ocr_http_multipart_handler.go:84)
      Left("didn't expect to get this far")
    }
  }
}
